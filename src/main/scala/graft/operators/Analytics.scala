package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics aggregates over the event stream — the funnel and
  * cohort-retention reductions every event warehouse serves (the reference
  * dashboards serve static fact lookups; these are the event-sequence
  * reports that need actual engine work).
  *
  * Scale shape: both operators reduce the corpus to USER-BOUNDED frames
  * first (first-touch timestamps, distinct activity days) before any
  * re-join, and outputs are stage- or cell-sized. "User-bounded" does NOT
  * mean small — at 100 TB the user set is 10⁸–10⁹ rows — so the re-joins
  * carry NO forced broadcast hint: both sides arrive hash-partitioned on
  * `user_id` from the preceding aggregation, so the sort-merge/shuffled-hash
  * join reuses those exchanges, and AQE still picks a broadcast at runtime
  * when the per-user frame really is small (same bounded-state policy as
  * `Clustering.pageRank`, which broadcasts only the rank VECTOR it proves
  * bounded, never an unbounded per-user frame).
  */
object Analytics {

  /** Ordered-funnel conversion: for each user, stage i counts only if an
    * event of stage i's type occurs STRICTLY AFTER the user's stage-(i-1)
    * entry time and within `tolerance` of it; the user's stage-i entry
    * time is the EARLIEST such event. Returns one row per stage with the
    * surviving user count — the classic conversion funnel with per-stage
    * windows (each stage's clock restarts at the previous stage's entry).
    *
    * `ts` is an epoch long; `tolerance` is in the same unit. The battery
    * entry feeds µs (see the grain note below).
    */
  def funnel(events: DataFrame, stages: Seq[String],
             tolerance: Long): DataFrame = {
    require(stages.nonEmpty)
    val byType = events.select(col("user_id"), col("event_type"), col("ts"))
    var entered = byType.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_in"))
    val counts = Seq.newBuilder[DataFrame]
    def stageCount(idx: Int, name: String, d: DataFrame): DataFrame =
      d.agg(count(lit(1)).as("n_users"))
        .withColumn("stage_idx", lit(idx)).withColumn("stage", lit(name))
        .select(col("stage_idx"), col("stage"), col("n_users"))
    counts += stageCount(1, stages.head, entered)
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      entered = byType.filter(col("event_type") === st)
        .join(entered, "user_id")
        .filter(col("ts") > col("t_in") &&
          col("ts") <= col("t_in") + tolerance)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_in"))
      counts += stageCount(i + 1, st, entered)
    }
    counts.result().reduce(_ unionByName _)
  }

  /** Day-granular cohort retention: users cohort by their FIRST-ever event
    * day; each (cohort_day, day_offset) cell counts the cohort members
    * active that many days later — the (user, day) frame is already
    * distinct and a user contributes one row per cell, so a plain count
    * suffices (countDistinct would add an Expand + extra shuffle for the
    * identical result). Day 0 re-derives the cohort size, so retention
    * curves read directly off the rows.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"),
        expr(s"(ts div 1000) div $UsPerDay").as("day"))
      .distinct()
    val cohorts = days.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, "user_id")
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Group-wise 2-D skyline (Börzsönyi, Kossmann & Stocker, ICDE 2001 —
    * "The Skyline Operator"): the Pareto frontier minimizing `x` and `y`
    * within each group. A point q is dominated iff some p in its group has
    * p.x ≤ q.x ∧ p.y ≤ q.y with at least one strict; the skyline is every
    * undominated point (duplicates both survive — neither dominates).
    *
    * NOT the quadratic dominance scan: in 2-D, dominance decomposes into
    * two prefix minima —
    *   dominated(q) ⇔ minY(x < q.x) ≤ q.y  ∨  minY(x = q.x) < q.y
    * so the plan is one groupBy (brand, x) → per-distinct-x min, one
    * window prefix-min over the DISTINCT-x relation (ROWS … 1 PRECEDING
    * is exactly "strictly smaller x" there), and one equi-join back —
    * O(n log n), every stage hash-partitioned on the group key, nothing
    * quadratic anywhere. The DuckDB oracle runs the textbook NOT EXISTS
    * dominance scan instead: two independent formulations must agree on
    * the exact point set, strictness, and duplicate handling.
    */
  def skyline(df: DataFrame, group: Column, x: Column, y: Column): DataFrame = {
    // Internal working columns are made collision-free against the caller's
    // schema (a caller column literally named "sk_x" must survive), and the
    // join back is NULL-SAFE (<=>): a NULL group or NULL x forms its own
    // bucket and is ranked within it (NULL x sorts first, i.e. "smallest x"
    // by Spark's asc-nulls-first — a defined convention, not a silent drop).
    // A NULL y is explicitly rejected: dominance over an unknown value is
    // undefined, and min() would ignore it anyway — the filter names it.
    def fresh(base: String): String = {
      var n = base
      while (df.columns.contains(n)) n += "_"
      n
    }
    val (gC, xC, yC) = (fresh("sk_g"), fresh("sk_x"), fresh("sk_y"))
    val (eqC, ltC) = (fresh("sk_min_y_eq"), fresh("sk_min_y_lt"))
    val (gR, xR) = (fresh("sk_g_r"), fresh("sk_x_r"))
    val pts = df.withColumn(gC, group).withColumn(xC, x).withColumn(yC, y)
      .filter(col(yC).isNotNull)
    val perX = pts.groupBy(col(gC), col(xC)).agg(min(col(yC)).as(eqC))
    val w = Window.partitionBy(col(gC)).orderBy(col(xC))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pref = perX.withColumn(ltC, min(col(eqC)).over(w))
      .select(col(gC).as(gR), col(xC).as(xR), col(eqC), col(ltC))
    pts.join(pref, col(gC) <=> col(gR) && col(xC) <=> col(xR))
      .filter(col(eqC) === col(yC) &&
        (col(ltC).isNull || col(ltC) > col(yC)))
      .drop(gC, xC, yC, gR, xR, eqC, ltC)
  }

  // Events timestamps compare at MICROSECOND grain everywhere in this
  // module: the events parquet has a TIMESTAMP(NANOS) vintage whose
  // sub-µs digits DuckDB truncates (same reason stream_sessionize works in
  // `ts div 1000` — EventStreams.scala), so an epoch_ns oracle would
  // diverge from Spark exactly at the strictly-after boundaries this
  // operator is defined by.
  private[graft] val TolUs = 72L * 3600 * 1000 * 1000 // 72 h
  private val UsPerDay = 86400000000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // view → click → purchase conversion with a 72 h per-stage window
    // (oracle-gated, 3 rows)
    "funnel_conversion" -> ((s, dir) =>
      funnel(graft.Tables(s, dir, "events")
          .withColumn("ts", expr("ts div 1000")),
        Seq("view", "click", "purchase"), TolUs)),
    // first-event-day cohorts × active-day offsets (oracle-gated)
    "cohort_retention" -> ((s, dir) =>
      cohortRetention(graft.Tables(s, dir, "events"))),
    // per-brand price/size Pareto frontier (min price, max size): the
    // window formulation vs the oracle's NOT EXISTS dominance scan
    // (oracle-gated at both scales)
    "pareto_skyline" -> ((s, dir) =>
      skyline(graft.Tables(s, dir, "part"),
        col("p_brand"), col("p_retailprice"), -col("p_size"))
        .select(col("p_brand"), col("p_partkey"),
          col("p_retailprice"), col("p_size")))
  )

  def oracles: Map[String, String] = Map(
    "funnel_conversion" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |s1 AS (SELECT user_id, MIN(tus) AS t_in FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(e.tus) AS t_in
        |       FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.tus > s1.t_in
        |         AND e.tus <= s1.t_in + 259200000000
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(e.tus) AS t_in
        |       FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.tus > s2.t_in
        |         AND e.tus <= s2.t_in + 259200000000
        |       GROUP BY e.user_id)
        |SELECT 1 AS stage_idx, 'view' AS stage, COUNT(*) AS n_users FROM s1
        |UNION ALL
        |SELECT 2, 'click', COUNT(*) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', COUNT(*) FROM s3""".stripMargin,
    "cohort_retention" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |c AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
        |SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
        |  COUNT(*) AS n_users
        |FROM d JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    // textbook dominance semantics, intentionally NOT the engine's plan:
    // p dominates q iff price ≤, size ≥, one strict — within the brand
    "pareto_skyline" ->
      """SELECT q.p_brand, q.p_partkey, q.p_retailprice, q.p_size
        |FROM part q
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part p
        |  WHERE p.p_brand = q.p_brand
        |    AND p.p_retailprice <= q.p_retailprice
        |    AND p.p_size >= q.p_size
        |    AND (p.p_retailprice < q.p_retailprice OR p.p_size > q.p_size))""".stripMargin
  )
}
