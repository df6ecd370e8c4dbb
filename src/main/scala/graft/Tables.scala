package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated benchmark tables (TESTDATA.md):
  * TPC-H-ish star schema + `events` + `documents` + `embeddings`, one parquet
  * per table under `/root/testdata/sf{0.001,0.01,0.1}/`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def all(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    names.map(n => n -> apply(spark, sfDir, n)).toMap
}
