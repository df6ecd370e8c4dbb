package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal
import graft.plans.AsOfJoinNative

/** Specs for the native as-of join — the whole-operator Catalyst extension
  * (custom LogicalPlan + Strategy + SparkPlan). Correctness is pinned three
  * ways: against a brute-force reference, against the declarative window
  * formulation (the two engines must be value-identical on every direction
  * × tolerance × null shape), and via plan-shape assertions (streaming
  * merge exec, one exchange + one sort per side, ZERO added exchanges on
  * pre-clustered inputs — the property the declarative form cannot offer).
  */
class AsOfNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def planOf(df: DataFrame): String = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString // final tree only (avoid double-counting the Initial Plan section)
      case p => p.toString
    }
  }

  test("native as-of: latest at-or-before match, ties, and no-match null") {
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 60L), (3L, 10L, 40L), (4L, 20L, 500L)
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 50L, "a"), (10L, 100L, "b"), (30L, 10L, "z")
    ).toDF("user_id", "ts", "tag")
    val joined = AsOfJoinNative.asOfJoinKeys(left, right, Seq("user_id"), "ts",
      carry = Map("ts" -> "m_ts", "tag" -> "m_tag"))
    // the carry must surface under the caller's OUTPUT names, in carry-map
    // order (the silent-degrade mode where CleanupAliases strips an Alias
    // carry would re-expose the source names here)
    assert(joined.columns.toSeq === Seq("event_id", "user_id", "ts", "m_ts", "m_tag"))
    val out = joined
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4))))
    assert(out === Array(
      (1L, Some(100L), Some("b")),
      (2L, Some(50L), Some("a")),
      (3L, None, None),
      (4L, None, None)))
  }

  test("native as-of agrees with a brute-force reference on random data") {
    val rnd = new scala.util.Random(41)
    val left = Seq.tabulate(150)(i =>
      (i.toLong, (rnd.nextInt(6) + 1).toLong, rnd.nextInt(1000).toLong))
    val right = Seq.tabulate(120)(i =>
      ((rnd.nextInt(7) + 1).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val lDF = left.toDF("event_id", "user_id", "ts")
    val rDF = right.toDF("user_id", "ts", "tag")
    val tol = 80L
    def brute(direction: String, tolerance: Option[Long]): Map[Long, Option[Long]] =
      left.map { case (id, k, t) =>
        val cands = right.filter(_._1 == k)
        val b: Option[Long] = cands.map(_._2).filter(_ <= t)
          .filter(v => tolerance.forall(tl => t - v <= tl)).sorted.lastOption
        val f: Option[Long] = cands.map(_._2).filter(_ >= t)
          .filter(v => tolerance.forall(tl => v - t <= tl)).sorted.headOption
        val m: Option[Long] = direction match {
          case "backward" => b
          case "forward"  => f
          case "nearest"  => (b, f) match {
            case (Some(bb), Some(ff)) => if (t - bb <= ff - t) Some(bb) else Some(ff)
            case (x, y) => x.orElse(y)
          }
        }
        id -> m
      }.toMap
    for (direction <- Seq("backward", "forward", "nearest");
         tolerance <- Seq(None, Some(tol))) {
      val got = AsOfJoinNative.asOfJoinKeys(lDF, rDF, Seq("user_id"), "ts",
          carry = Map("ts" -> "m_ts"), direction = direction, tolerance = tolerance)
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toMap
      assert(got === brute(direction, tolerance), s"$direction tol=$tolerance")
    }
  }

  test("native and window formulations are value-identical, nulls included") {
    // nullable composite keys and nullable times on both sides: the two
    // engines must agree row-for-row on every direction × tolerance. Carry
    // is the matched TIME, so exact (key, time) ties — where both engines
    // legitimately pick an arbitrary member — still compare equal.
    val rnd = new scala.util.Random(97)
    def optKey(): Option[Long] =
      if (rnd.nextInt(12) == 0) None else Some((rnd.nextInt(5) + 1).toLong)
    val left = Seq.tabulate(800)(i => (i.toLong, optKey(),
      (rnd.nextInt(3) + 1).toLong, Some(rnd.nextInt(400).toLong)))
    val right = Seq.tabulate(700)(_ => (optKey(), (rnd.nextInt(3) + 1).toLong,
      if (rnd.nextInt(15) == 0) Option.empty[Long] else Some(rnd.nextInt(400).toLong)))
    val lDF = left.toDF("event_id", "k1", "k2", "ts")
    val rDF = right.toDF("k1", "k2", "ts")
    for (direction <- Seq("backward", "forward", "nearest");
         tolerance <- Seq(None, Some(25L))) {
      def collect(df: DataFrame): Map[Long, Option[Long]] = df.collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .toMap
      val native = collect(AsOfJoinNative.asOfJoinKeys(lDF, rDF,
        Seq("k1", "k2"), "ts", Map("ts" -> "m_ts"), direction, tolerance))
      val window = collect(Temporal.asOfJoinKeys(lDF, rDF,
        Seq("k1", "k2"), "ts", Map("ts" -> "m_ts"), direction, tolerance))
      assert(native === window, s"$direction tol=$tolerance")
    }
  }

  test("native as-of: null times never match, on either side") {
    val left = Seq(
      (1L, 10L, Some(100L)), // normal
      (2L, 10L, Option.empty[Long]) // null left time: no match, not 'earliest'
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, Option(50L), "a"),
      (10L, Option.empty[Long], "n"), // null right time: matchable by nobody
      (20L, Option.empty[Long], "m")  // sole row of its key, still unmatchable
    ).toDF("user_id", "ts", "tag")
    for (direction <- Seq("backward", "forward", "nearest")) {
      val out = AsOfJoinNative.asOfJoinKeys(left, right, Seq("user_id"), "ts",
          carry = Map("tag" -> "m_tag"), direction = direction)
        .orderBy("event_id").collect()
        .map(r => (r.getLong(0), Option(r.get(3))))
      val expected1 = if (direction == "forward") None else Some("a")
      assert(out === Array((1L, expected1), (2L, None)), direction)
    }
  }

  test("native as-of: atomic row carry — a null value on the matched row stays null") {
    // right@100 matches with tag=null; per-column carry would have leaked
    // tag='a' from right@50 (the mixed-row bug the struct carry prevents)
    val left = Seq((1L, 10L, 150L)).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 50L, Option("a")), (10L, 100L, Option.empty[String])
    ).toDF("user_id", "ts", "tag")
    val out = AsOfJoinNative.asOfJoinKeys(left, right, Seq("user_id"), "ts",
        carry = Map("ts" -> "m_ts", "tag" -> "m_tag"))
      .collect().map(r => (r.getLong(0), r.getLong(3), Option(r.get(4))))
    assert(out === Array((1L, 100L, None)))
  }

  test("native as-of: empty right side and empty left side") {
    val left = Seq((1L, 10L, 100L)).toDF("event_id", "user_id", "ts")
    val right = Seq.empty[(Long, Long)].toDF("user_id", "ts")
    val out = AsOfJoinNative.asOfJoinKeys(left, right, Seq("user_id"), "ts",
      carry = Map("ts" -> "m_ts")).collect()
    assert(out.length === 1 && out(0).isNullAt(3))
    val none = AsOfJoinNative.asOfJoinKeys(
      Seq.empty[(Long, Long, Long)].toDF("event_id", "user_id", "ts"),
      Seq((10L, 50L)).toDF("user_id", "ts"),
      Seq("user_id"), "ts", Map("ts" -> "m_ts")).collect()
    assert(none.isEmpty)
  }

  test("plan shape: streaming merge exec, one exchange + one sort per side — even for nearest") {
    val rnd = new scala.util.Random(7)
    val lDF = Seq.tabulate(500)(i =>
      (i.toLong, (rnd.nextInt(9) + 1).toLong, rnd.nextInt(5000).toLong))
      .toDF("event_id", "user_id", "ts")
    val rDF = Seq.tabulate(400)(_ =>
      ((rnd.nextInt(9) + 1).toLong, rnd.nextInt(5000).toLong))
      .toDF("user_id", "ts")
    val plan = planOf(AsOfJoinNative.asOfJoinKeys(lDF, rDF, Seq("user_id"),
      "ts", Map("ts" -> "m_ts"), direction = "nearest"))
    assert(plan.contains("GraftAsOfJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    val sorts = "Sort \\[".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges in:\n$plan")
    // the window formulation needs TWO sorts over its union for nearest
    // (ascending + descending); the native exec needs one per side, total 2,
    // and never re-sorts for the second frame
    assert(sorts == 2, s"expected 2 sorts, got $sorts in:\n$plan")
  }

  test("plan shape: pre-clustered inputs need ZERO added exchanges") {
    // both sides arrive hash-partitioned on the key (the bucketed-fact
    // shape); EnsureRequirements must recognize the distribution as
    // satisfied — only the two explicit repartition exchanges may appear.
    // AQE off for a deterministic plan string (its re-optimization may
    // legally coalesce the pre-shuffles).
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val rnd = new scala.util.Random(13)
      val lDF = Seq.tabulate(300)(i =>
        (i.toLong, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(900).toLong))
        .toDF("event_id", "user_id", "ts").repartition(4, col("user_id"))
      val rDF = Seq.tabulate(200)(_ =>
        ((rnd.nextInt(5) + 1).toLong, rnd.nextInt(900).toLong))
        .toDF("user_id", "ts").repartition(4, col("user_id"))
      val df = AsOfJoinNative.asOfJoinKeys(lDF, rDF, Seq("user_id"), "ts",
        Map("ts" -> "m_ts"))
      val plan = planOf(df)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(plan.contains("GraftAsOfJoin"), plan)
      assert(exchanges == 2 && !plan.contains("ENSURE_REQUIREMENTS"),
        s"pre-clustered inputs grew extra exchanges ($exchanges):\n$plan")
      // and the result is still right: spot-check against the window form
      val window = Temporal.asOfJoin(lDF, rDF, "user_id", "ts", Map("ts" -> "m_ts"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      val native = df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      assert(native === window)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("composite keys: same-user other-day rows never match (native)") {
    val left = Seq((1L, 7L, 3L, 100L), (2L, 7L, 4L, 100L))
      .toDF("event_id", "user_id", "day", "ts")
    val right = Seq((7L, 3L, 90L)).toDF("user_id", "day", "ts")
    val out = AsOfJoinNative.asOfJoinKeys(left, right, Seq("user_id", "day"),
        "ts", Map("ts" -> "m_ts"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(out === Array((1L, Some(90L)), (2L, None)))
  }
}
