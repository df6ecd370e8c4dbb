package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** Hand-computed pins for the funnel / cohort analytics operators. */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (user_id, event_type, ts)
  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "ts")

  test("funnel: ordered, strictly-after, per-stage tolerance window") {
    val events = ev(
      // user 1 converts fully: view@10 → click@20 → purchase@25
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 25L),
      // user 2: click BEFORE the view never counts; no click after → stage 1 only
      (2L, "click", 5L), (2L, "view", 10L),
      // user 3: click at exactly the view ts is NOT strictly after → stage 1
      (3L, "view", 10L), (3L, "click", 10L),
      // user 4: click beyond tolerance (10+100 < 200) → stage 1 only
      (4L, "view", 10L), (4L, "click", 200L),
      // user 5: second view is later but the FIRST view anchors the clock;
      // click@50 is within 100 of view@10 → stage 2; purchase missing
      (5L, "view", 10L), (5L, "view", 90L), (5L, "click", 50L),
      // user 6: purchase skips click → stage 1 only
      (6L, "view", 10L), (6L, "purchase", 20L))
    val got = Analytics.funnel(events, Seq("view", "click", "purchase"), 100L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got === Map(1 -> 6L, 2 -> 2L, 3 -> 1L))
  }

  test("funnel: stage clock restarts at the previous stage's entry") {
    // view@0, click@90 (within 100 of view), purchase@150 (within 100 of
    // CLICK though 150 > view+100) → converts; purchase tolerance anchors
    // on the click, not the first stage
    val events = ev(
      (1L, "view", 0L), (1L, "click", 90L), (1L, "purchase", 150L))
    val got = Analytics.funnel(events, Seq("view", "click", "purchase"), 100L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got === Map(1 -> 1L, 2 -> 1L, 3 -> 1L))
  }

  test("cohort retention: day-0 cell is the cohort size, offsets count actives") {
    val d = graft.Tables.NanosPerDay
    val events = ev(
      // users 1,2 first seen day 0; user 1 returns day 2; user 2 never
      (1L, "view", 0L), (2L, "view", d - 1),
      (1L, "click", 2 * d + 5),
      // user 3 first seen day 1, active again day 1 (same-day dedup) + day 3
      (3L, "view", d), (3L, "click", d + 7), (3L, "purchase", 3 * d))
    val got = Analytics.cohortRetention(events)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      (0L, 0L) -> 2L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L))
  }

  // corpus tests run the exact battery path: µs-grain ts + the shared
  // TolUs constant (a hand-rolled 72h-in-nanos literal drifted 1000× from
  // the battery once already — keep ONE constant)
  private def corpusEvents = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    .withColumn("ts", expr("ts div 1000"))

  test("funnel counts are monotone non-increasing on the real corpus") {
    val got = Analytics.funnel(corpusEvents, Seq("view", "click", "purchase"),
        Analytics.TolUs)
      .orderBy(col("stage_idx")).collect().map(_.getLong(2))
    assert(got.length === 3)
    assert(got(0) >= got(1) && got(1) >= got(2), got.toSeq)
    assert(got(0) > 0)
  }

  test("user-cardinality re-joins carry no forced broadcast hint and still " +
    "work with auto-broadcast disabled") {
    // At 100 TB the per-user frames are 10^8-10^9 rows: a forced broadcast()
    // there is an executor-memory bomb, and it suppresses the cheap
    // co-partitioned join (both sides are hash-partitioned on user_id by
    // the preceding aggregation). Pin: (a) the optimized plans contain no
    // hint-forced broadcast on those joins — disabling auto-broadcast must
    // remove every BroadcastHashJoin (a hint would survive the threshold);
    // (b) results are identical either way.
    // cohortRetention expects the raw nano-grain ts (it derives µs itself)
    val events = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    def run() = (
      Analytics.funnel(corpusEvents, Seq("view", "click", "purchase"),
          Analytics.TolUs)
        .orderBy(col("stage_idx")).collect().toSeq,
      Analytics.cohortRetention(events)
        .orderBy(col("cohort_day"), col("day_offset")).collect().toSeq)
    val (fDef, cDef) = run()
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(thr)
    try {
      spark.conf.set(thr, "-1")
      val f = Analytics.funnel(corpusEvents, Seq("view", "click", "purchase"),
        Analytics.TolUs)
      val c = Analytics.cohortRetention(events)
      for (df <- Seq(f, c)) {
        val phys = df.queryExecution.executedPlan.toString
        assert(!phys.contains("BroadcastHashJoin"),
          "forced broadcast survived autoBroadcastJoinThreshold=-1:\n" + phys)
      }
      val (fOff, cOff) = run()
      assert(fOff === fDef)
      assert(cOff === cDef)
    } finally spark.conf.set(thr, old)
  }

  test("skyline: strict dominance, per-group frontier, duplicates both survive") {
    // group g1, minimize x and y:
    //   (1,5) and (3,3) and (5,1) — the frontier staircase
    //   (3,5) dominated by (1,5)? x: 1<3, y: 5≤5 → yes (strict in x)
    //   (3,4) dominated by (3,3) (same x, strictly larger y)
    //   (6,1) dominated by (5,1); (5,2) dominated by (5,1)
    //   (0,9) undominated (best x)
    // group g2: two identical points — neither dominates, both stay
    val pts = Seq(
      ("g1", 1, 1.0, 5.0), ("g1", 2, 3.0, 3.0), ("g1", 3, 5.0, 1.0),
      ("g1", 4, 3.0, 5.0), ("g1", 5, 3.0, 4.0), ("g1", 6, 6.0, 1.0),
      ("g1", 7, 5.0, 2.0), ("g1", 8, 0.0, 9.0),
      ("g2", 9, 2.0, 2.0), ("g2", 10, 2.0, 2.0)
    ).toDF("g", "id", "x", "y")
    val sky = Analytics.skyline(pts, col("g"), col("x"), col("y"))
      .select(col("id")).collect().map(_.getInt(0)).toSet
    assert(sky === Set(1, 2, 3, 8, 9, 10))
    // the quadratic reference check, computed inline: a point survives iff
    // nothing in its group weakly dominates it with one strict coordinate
    val rows = pts.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    val ref = rows.filter { case (g, _, qx, qy) =>
      !rows.exists { case (pg, _, px, py) =>
        pg == g && px <= qx && py <= qy && (px < qx || py < qy) }
    }.map(_._2).toSet
    assert(sky === ref)
  }
}
