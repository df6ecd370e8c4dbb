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

  /** Nanoseconds per day — `events.ts` is parquet TIMESTAMP(NANOS), which
    * Spark only reads as a nano-epoch LongType (legacy conf below).
    */
  val NanosPerDay: Long = 24L * 3600 * 1000 * 1000 * 1000

  /** Fixed dimensionality of the `embeddings.embedding` column (TESTDATA) —
    * lets vector ops use statically-unrolled codegen'd math.
    */
  val EmbeddingDim: Int = 64

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) — illegal for Spark's vectorized
    // reader unless read as raw nanos (queries treat ts as a nano-epoch long).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def all(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    names.map(n => n -> apply(spark, sfDir, n)).toMap
}
