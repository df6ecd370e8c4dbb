package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    // events.parquet vintage 1 carries TIMESTAMP(NANOS) — illegal for Spark's
    // vectorized reader unless read as raw nanos (queries treat ts as a
    // nano-epoch long).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (name == "events") {
      // literal time predicates on the normalized `ts` must still reach the
      // parquet scan as PushedFilters on timestamp vintages — install the
      // rewrite alongside the normalization it undoes (idempotent; sessions
      // wired via GraftExtensions already carry it)
      val rules = spark.experimental.extraOptimizations
      if (!rules.contains(graft.plans.EventTsPushdownRewrite))
        spark.experimental.extraOptimizations =
          rules :+ graft.plans.EventTsPushdownRewrite
    }
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Vintage portability for `events.ts`. The generator has produced two
    * parquet vintages: TIMESTAMP(NANOS) (loads as a nano-epoch LongType under
    * `nanosAsLong`) and timestamp[us] with isAdjustedToUTC=false (loads as
    * TIMESTAMP_NTZ). Every consumer does raw nano-epoch long arithmetic on
    * `ts`, so normalize any timestamp vintage back to nano-epoch long here —
    * in ONE place — rather than teaching each consumer both types.
    *
    * TIMESTAMP_NTZ is converted timezone-free (`timestampdiff` against the
    * NTZ epoch literal), matching how DuckDB's `epoch_us` reads the same
    * naive wall-clock value — no dependence on the session timezone.
    * Trade-off: predicates on the derived `ts` no longer reach the parquet
    * scan as PushedFilters for timestamp vintages (they did for the raw-long
    * vintage); the projection itself is codegen'd and effectively free.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) =>
        df.withColumn("ts",
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)") * 1000L)
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case Some(LongType) | None => df
      case Some(other) =>
        throw new IllegalStateException(s"events.ts has unsupported type $other")
    }

  def all(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    names.map(n => n -> apply(spark, sfDir, n)).toMap
}
