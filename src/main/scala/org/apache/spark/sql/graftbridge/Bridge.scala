package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` doorway the engine's Catalyst whole-operator tier
  * needs: turning a hand-built resolved [[LogicalPlan]] back into a public
  * `DataFrame` (`Dataset.ofRows`). Spark exposes every other extension hook
  * publicly (`SparkSessionExtensions`, `experimental.extraStrategies`), but
  * plan CONSTRUCTION from the outside has no public spelling — the
  * conventional extension-library answer is a minimal shim inside the
  * `org.apache.spark.sql` package namespace (the same trick spark-packages
  * like graphframes use). Keep this file to exactly this one forwarding
  * method so the private-API surface area stays auditable.
  */
object Bridge {

  /** Analyzed-or-unresolved plan in, DataFrame out — the classic engine's
    * `Dataset.ofRows`, which runs the full analyzer/optimizer pipeline on
    * `plan` lazily like any other query.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
