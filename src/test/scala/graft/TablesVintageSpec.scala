package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Events `ts` vintage portability: the testdata generator has shipped
  * `events.parquet` with `ts` as TIMESTAMP(NANOS) (which Spark loads as a
  * raw nano-epoch long under `nanosAsLong`) and later as timestamp[us]
  * isAdjustedToUTC=false (which loads as TIMESTAMP_NTZ). The round-7 drift
  * to the latter silently broke six battery entries. [[Tables.normalizeEventTs]]
  * must present every consumer the SAME nano-epoch LongType `ts` for any
  * vintage — this spec writes identical rows in all three loader-visible
  * shapes and pins identical results from the event pipelines that broke.
  * A future regeneration that flips the physical type again fails HERE,
  * not as silently-vanished correctness entries.
  */
class TablesVintageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic event rows at whole-microsecond instants (sub-µs can't
    * round-trip through a micros file, so the shared fixture stays on the
    * precision every vintage can represent).
    */
  private def baseMicros: DataFrame = {
    val rows = (0 until 400).map { i =>
      val us = 1700000000000000L + i.toLong * 137000L
      (i.toLong, us, (i % 7).toLong,
        Seq("click", "purchase", "view")(i % 3), i * 0.5, s"""{"k":$i}""")
    }
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
  }

  private def writeVintage(kind: String): String = {
    val dir = Files.createTempDirectory(s"events_vintage_$kind").toString
    val withTs = kind match {
      case "long_nanos" => baseMicros.withColumn("ts", col("us") * 1000L)
      case "ntz_micros" => baseMicros.withColumn("ts",
        expr("timestampadd(MICROSECOND, us, TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
      case "tz_micros" => baseMicros.withColumn("ts", timestamp_micros(col("us")))
    }
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val dirs: Map[String, String] =
    Seq("long_nanos", "ntz_micros", "tz_micros").map(k => k -> writeVintage(k)).toMap

  test("every vintage loads as identical nano-epoch longs") {
    val loaded = dirs.map { case (k, d) => k -> Tables(spark, d, "events") }
    loaded.foreach { case (k, df) =>
      assert(df.schema("ts").dataType === LongType, s"vintage $k not normalized to long")
    }
    val tsSets = loaded.map { case (k, df) =>
      k -> df.select("event_id", "ts").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    val ref = tsSets("long_nanos")
    tsSets.foreach { case (k, s) => assert(s === ref, s"vintage $k ts values differ") }
  }

  test("literal ts watermark predicates reach PushedFilters on every vintage") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // a watermark an incremental run would carry over: cuts the 400-row
    // fixture at row 100 (whole-µs instants, so the nano bound is exact)
    val wmNanos = (1700000000000000L + 100L * 137000L) * 1000L
    val results = dirs.map { case (k, d) =>
      val df = Tables(spark, d, "events").filter(col("ts") >= lit(wmNanos))
        .select(col("event_id"), col("ts"))
      val pushed = df.queryExecution.executedPlan
        .collect { case f: FileSourceScanExec => f.metadata("PushedFilters") }
        .mkString
      assert(pushed.contains("GreaterThanOrEqual(ts,"),
        s"vintage $k lost ts pushdown: $pushed\n${df.queryExecution.optimizedPlan}")
      k -> df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    val ref = results("long_nanos")
    assert(ref.size === 300, s"watermark cut wrong: ${ref.size}")
    results.foreach { case (k, s) => assert(s === ref, s"vintage $k rows differ") }
    // non-whole-µs bounds still prune correctly (exact integer-bound
    // rounding: ≥ takes the ceiling, so the row AT the bound survives ÷1000)
    val offBound = wmNanos + 1
    val offCounts = dirs.map { case (k, d) =>
      k -> Tables(spark, d, "events").filter(col("ts") >= lit(offBound)).count()
    }
    offCounts.foreach { case (k, n) => assert(n === 299L, s"vintage $k: $n") }
  }

  test("event pipelines produce identical results on every vintage") {
    val pipelines = Seq(
      "asof_last_purchase", "range_join_attrib",
      "p6_incremental_watermark", "stream_hourly_counts")
    for (name <- pipelines) {
      val perVintage = dirs.map { case (k, d) =>
        k -> SparkEntry.queries(name)(spark, d).collect().map(_.toString).sorted.toSeq
      }
      val ref = perVintage("long_nanos")
      assert(ref.nonEmpty, s"$name returned no rows on the fixture")
      perVintage.foreach { case (k, rows) =>
        assert(rows === ref, s"$name differs on vintage $k")
      }
    }
  }
}
