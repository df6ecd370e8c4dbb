package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 exercised over
  * the driver-generated tables (TESTDATA.md); [[oracleSql]] carries the
  * equivalent DuckDB SQL for the hash-compare correctness gate. Column names
  * and aliases match between the two on purpose — the driver sorts columns by
  * name before hashing.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-join + grouped decimal aggregation — the same shape as the
    * reference's fact build (J3/J4/A1).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Module registry exposed as DATA so the PlanSpec contract test iterates
    * this same list: registering a module here IS listing it in the test —
    * the two can no longer drift (the r6 red-suite lesson).
    */
  def queryModules: Seq[Map[String, (SparkSession, String) => DataFrame]] = Seq(
    graft.operators.Relational.queries,
    graft.io.ColumnarIo.queries,
    graft.operators.TextAnalysis.queries,
    graft.operators.Dedup.queries,
    graft.operators.Similarity.queries,
    graft.operators.Multimodal.queries,
    graft.operators.Temporal.queries,
    graft.operators.Sampling.queries,
    graft.operators.Decontam.queries,
    graft.operators.Mixing.queries,
    graft.operators.SemDedup.queries,
    graft.operators.SpanDedup.queries,
    graft.operators.Versioning.queries,
    graft.operators.Clustering.queries,
    graft.operators.Packing.queries,
    graft.operators.Curation.queries,
    graft.operators.QualityClassifier.queries,
    graft.operators.Bpe.queries,
    graft.operators.Viz.queries,
    graft.operators.Scd.queries,
    graft.operators.Retrieval.queries,
    graft.operators.Layout.queries,
    graft.operators.Linkage.queries,
    graft.operators.Privacy.queries,
    graft.operators.Analytics.queries,
    graft.operators.Ivm.queries,
    graft.streaming.EventStreams.queries,
    graft.models.ComposedPipeline.queries)

  def oracleModules: Seq[Map[String, String]] = Seq(
    graft.operators.Relational.oracles,
    graft.io.ColumnarIo.oracles,
    graft.operators.TextAnalysis.oracles,
    graft.operators.Dedup.oracles,
    graft.operators.Similarity.oracles,
    graft.operators.Multimodal.oracles,
    graft.operators.Temporal.oracles,
    graft.operators.Sampling.oracles,
    graft.operators.Decontam.oracles,
    graft.operators.Mixing.oracles,
    graft.operators.SemDedup.oracles,
    graft.operators.SpanDedup.oracles,
    graft.operators.Versioning.oracles,
    graft.operators.Clustering.oracles,
    graft.operators.Packing.oracles,
    graft.operators.Curation.oracles,
    graft.operators.QualityClassifier.oracles,
    graft.operators.Bpe.oracles,
    graft.operators.Viz.oracles,
    graft.operators.Scd.oracles,
    graft.operators.Retrieval.oracles,
    graft.operators.Layout.oracles,
    graft.operators.Linkage.oracles,
    graft.operators.Privacy.oracles,
    graft.operators.Analytics.oracles,
    graft.operators.Ivm.oracles,
    graft.streaming.EventStreams.oracles,
    graft.models.ComposedPipeline.oracles)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map[String, (SparkSession, String) => DataFrame](
    // A1: partial+final hash aggregation with decimal-exact sums (TPC-H Q1 shape)
    "q1_agg" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // sum in decimal (exact, order-independent), emit double (same
          // binary value in Spark and DuckDB → stable hash compare)
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          count(lit(1)).as("n_rows"))
    })
  ) ++ queryModules.reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
  ) ++ oracleModules.reduce(_ ++ _)
}
