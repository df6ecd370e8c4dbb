package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.{Bucketed, Incremental, Materialization, Model, Partitioned, Table, View}

/** Model materializer: dbt materializations → Spark write paths
  * (reference: masterfindata/dbt_project.yml:26-45, fct_balanceSheet.sql:1-6).
  *
  *  - view → temp view + lazy DataFrame (recomputed per use, like a SQL view).
  *  - table → parquet under `warehouseDir`, `cluster_by` mapped to
  *    `repartition(keys).sortWithinPartitions(keys)` (SURVEY.md §4) so files
  *    are clustered for downstream min/max pruning — the Spark analog of
  *    Snowflake clustering keys.
  *  - incremental → append rows with `watermark >= max(existing watermark)`
  *    (reference: json_transform/macros/incremental_filter.sql:1-5 — note the
  *    `>=` re-processes the boundary value; preserved as-is, SURVEY.md §7.4#7).
  */
final class Materializer(spark: SparkSession, warehouseDir: String,
                         clusterPartitions: Int = 32) {

  private def path(name: String) = s"$warehouseDir/$name"

  def apply(model: Model, df: DataFrame): DataFrame =
    materialize(model.name, df, model.materialization)

  def materialize(name: String, df: DataFrame, mat: Materialization): DataFrame =
    mat match {
      case View =>
        df.createOrReplaceTempView(name)
        df
      case Table(clusterBy, format) =>
        val out =
          if (clusterBy.isEmpty) df
          else df.repartition(clusterPartitions, clusterBy.map(col): _*)
            .sortWithinPartitions(clusterBy.map(col): _*)
        out.write.mode("overwrite").format(format).save(path(name))
        val back = spark.read.format(format).load(path(name))
        back.createOrReplaceTempView(name)
        back
      case Partitioned(partitionBy, format) =>
        // one directory per partition value; a filter on the partition
        // column prunes directories before any file is opened
        df.write.mode("overwrite").partitionBy(partitionBy: _*)
          .format(format).save(path(name))
        val back = spark.read.format(format).load(path(name))
        back.createOrReplaceTempView(name)
        back
      case Bucketed(bucketBy, numBuckets) =>
        // a previous JVM may have left the managed location behind while the
        // in-memory catalog forgot the table — clear both before writing
        spark.sql(s"DROP TABLE IF EXISTS `$name`")
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), name)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        df.write.mode("overwrite")
          .bucketBy(numBuckets, bucketBy.head, bucketBy.tail: _*)
          .sortBy(bucketBy.head, bucketBy.tail: _*)
          .format("parquet")
          .saveAsTable(name)
        spark.table(name)
      case Incremental(wmCol) =>
        val target = path(name)
        val exists = new java.io.File(target).exists() ||
          scala.util.Try(spark.read.parquet(target).schema).isSuccess
        if (!exists) {
          df.write.mode("overwrite").parquet(target)
        } else {
          val existing = spark.read.parquet(target)
          val maxWm = existing.agg(max(col(wmCol))).head.get(0)
          val fresh =
            if (maxWm == null) df
            else df.filter(col(wmCol) >= lit(maxWm))
          fresh.write.mode("append").parquet(target)
        }
        val back = spark.read.parquet(target)
        back.createOrReplaceTempView(name)
        back
    }
}
