package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{Bucketed, Incremental, Partitioned, Table}
import graft.io.{CsvIo, Materializer}
import graft.operators.SkewJoin

/** Scale-technique specs: salted skew joins, bucketed (shuffle-free) joins,
  * incremental materialization, and the CSV weather path.
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join is row-identical to the plain join on skewed data") {
    // 90% of rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, s"row$i"))
      .toDF("k", "payload")
    val small = Seq((7L, "hot"), (10L, "ten"), (20L, "twenty")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", buckets = 8)
    assert(salted.count() === plain.count())
    val a = plain.orderBy("k", "payload").collect().map(_.toString)
    val b = salted.select("k", "payload", "name").orderBy("k", "payload").collect().map(_.toString)
    assert(a === b)
  }

  test("bucketed tables join without a shuffle") {
    val mat = new Materializer(spark,
      java.nio.file.Files.createTempDirectory("bucket-wh").toString)
    val left = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    val right = (1 to 1000).map(i => (i.toLong, s"n$i")).toDF("k", "name")
    val lb = mat.materialize("bucketed_l", left, Bucketed(Seq("k"), 8))
    val rb = mat.materialize("bucketed_r", right, Bucketed(Seq("k"), 8))
    val joined = lb.join(rb, "k")
    assert(joined.count() === 1000)
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty,
      s"bucketed join should be shuffle-free, found ${shuffles.size} exchanges")
  }

  test("incremental materialization appends only rows past the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("inc-wh").toString
    val mat = new Materializer(spark, dir)
    val day1 = Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("id", "d")
      .withColumn("d", col("d").cast("date"))
    mat.materialize("inc_t", day1, Incremental("d"))
    assert(spark.read.parquet(s"$dir/inc_t").count() === 2)
    // second batch: one stale row (before max watermark) + boundary + fresh.
    // the reference's `>= max` re-processes the boundary value (SURVEY §7.4#7)
    val day2 = Seq((1L, "2024-01-01"), (3L, "2024-01-02"), (4L, "2024-01-03"))
      .toDF("id", "d").withColumn("d", col("d").cast("date"))
    mat.materialize("inc_t", day2, Incremental("d"))
    val rows = spark.read.parquet(s"$dir/inc_t")
    assert(rows.count() === 4) // 2 + boundary(3) + fresh(4); stale 1 filtered
    assert(rows.filter(col("id") === 1L).count() === 1)
  }

  test("minhash LSH plan carries no broadcast hints (shingle corpus must scale)") {
    // the verification joins are doc_id equi-joins; a hard broadcast() hint
    // on the shingle side re-imports the memory bound LSH exists to escape.
    // AQE may still choose broadcast at runtime when sizes allow — that's
    // size-based and correct; a plan-time hint is not.
    val docs = (1 to 50).map(i => (i.toLong, s"document number $i with shared text"))
      .toDF("doc_id", "text")
    val hints = graft.operators.Dedup.minhashLshPairs(docs, threshold = 0.8)
      .queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
    assert(hints.isEmpty, s"expected no broadcast hints, found ${hints.size}")
  }

  test("CSV weather source/sink with Fahrenheit conversion (S9/F15)") {
    val dir = java.nio.file.Files.createTempDirectory("weather").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/w.csv"),
      "temperature,humidity,date\n212.0,10.5,2024-06-01\n32.0,80.0,2024-06-02\n")
    val df = CsvIo.readWeather(spark, s"$dir/w.csv")
    val rows = df.orderBy("date").collect()
    assert(rows(0).getAs[Double]("temperature_celsius") === 100.0)
    assert(rows(1).getAs[Double]("temperature_celsius") === 0.0)
    CsvIo.writeWeather(df, s"$dir/out")
    assert(CsvIo.readWeather(spark, s"$dir/out").count() === 2)
  }

  test("partitioned materialization prunes directories at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("part-wh").toString
    val m = new Materializer(spark, dir)
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val back = m.materialize("ev_by_type", ev, Partitioned(Seq("event_type")))
    val filtered = back.filter(col("event_type") === "click")
    // the scan must carry a PARTITION filter (directory pruning), leaving
    // no data filter to evaluate per row
    val scan = filtered.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty, "no partition filters")
    assert(filtered.count() ===
      ev.filter(col("event_type") === "click").count())
    // and only the matching directory's files are read
    assert(scan.metadata("Location").contains("ev_by_type"))
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files).forall(_.getPath.toString.contains("event_type=click")))
  }

  test("ORC table materialization round-trips with clustering") {
    val dir = java.nio.file.Files.createTempDirectory("orc-wh").toString
    val m = new Materializer(spark, dir)
    val n = graft.Tables(spark, "/root/testdata/sf0.001", "nation")
    val back = m.materialize("nation_orc", n,
      Table(clusterBy = Seq("n_regionkey"), format = "orc"))
    assert(back.count() === n.count())
    assert(back.schema === n.schema)
    // the files on disk are ORC, not parquet
    val files = new java.io.File(s"$dir/nation_orc").listFiles()
    assert(files.exists(_.getName.endsWith(".orc")), files.mkString(","))
  }

  test("blocked-pairs block count grows with the corpus under a fixed memory budget") {
    import graft.operators.Dedup
    val byCores = Dedup.blockCount(spark, corpusBytes = 0L)
    // 100 GB corpus at a 256 MB task budget needs ≥ 2·corpus/budget blocks
    val big = Dedup.blockCount(spark, corpusBytes = 100L << 30)
    assert(big >= 800, s"memory bound ignored: B=$big")
    assert(big > byCores, "B must scale past the parallelism floor with corpus size")
    // and a small corpus stays at the parallelism-balanced floor
    assert(Dedup.blockCount(spark, corpusBytes = 1L << 20) === byCores)
  }

  test("memory-aware fanout bounds per-partition bytes for array-heavy stages") {
    val byCores = graft.Tuning.fanout(spark)
    // unknown / small payloads keep the cores-only count exactly
    assert(graft.Tuning.fanout(spark, 0L) === byCores)
    assert(graft.Tuning.fanout(spark, 1L << 20) === byCores)
    // 1 TB of shingle payload at the 256 MB default budget: ≥ 4096
    // partitions, NOT 2×cores — each task materializes a bounded slice
    val big = graft.Tuning.fanout(spark, 1L << 40)
    assert(big >= 4096, s"memory bound ignored: $big")
    assert(big > byCores)
    // monotone in the payload, and the task-count backstop holds
    assert(graft.Tuning.fanout(spark, 2L << 40) >= big)
    assert(graft.Tuning.fanout(spark, Long.MaxValue) === (1 << 20))
  }
}
