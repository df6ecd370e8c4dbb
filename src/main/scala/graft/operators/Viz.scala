package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Plot-side data reductions — the engine half of the reference frontend's
  * charts (`Frontend/app.py:538-572` renders; the reduction that makes a
  * million-point series drawable is a DATA operation and belongs here,
  * next to `a17_density_grid` and the `o4_topk` preview caps).
  */
object Viz {

  /** Largest-Triangle-Three-Buckets downsampling (Steinarsson, "Downsampling
    * Time Series for Visual Representation", 2013): keep the first and last
    * points, split the middle into k-2 buckets, and from each bucket keep
    * the point forming the largest triangle with the previously-kept point
    * and the next bucket's centroid — the standard "draw 1M points as 1k"
    * reduction that preserves visual extremes where uniform striding
    * flattens them. Ties keep the earliest point (deterministic).
    */
  def lttb(pts: IndexedSeq[(Double, Double)], k: Int): IndexedSeq[(Double, Double)] = {
    val n = pts.length
    if (n == 0 || k <= 0) return IndexedSeq.empty
    if (k >= n) return pts
    // degenerate budgets honor the ≤k contract exactly: a 1-point budget
    // keeps the first point; a 2-point budget keeps the endpoints
    if (k == 1) return IndexedSeq(pts.head)
    if (k == 2) return IndexedSeq(pts.head, pts.last)
    val out = IndexedSeq.newBuilder[(Double, Double)]
    out += pts(0)
    var a = 0
    val every = (n - 2).toDouble / (k - 2)
    var i = 0
    while (i < k - 2) {
      val bStart = (i * every).toInt + 1
      val bEnd = math.min(((i + 1) * every).toInt + 1, n - 1)
      val cStart = bEnd
      val cEnd = math.min((((i + 2) * every).toInt + 1).max(cStart + 1), n)
      var cx = 0.0; var cy = 0.0
      var j = cStart
      while (j < cEnd) { cx += pts(j)._1; cy += pts(j)._2; j += 1 }
      val cn = cEnd - cStart
      cx /= cn; cy /= cn
      var best = -1.0; var bestIdx = bStart
      j = bStart
      while (j < bEnd) {
        val area = math.abs(
          (pts(a)._1 - cx) * (pts(j)._2 - pts(a)._2) -
            (pts(a)._1 - pts(j)._1) * (cy - pts(a)._2))
        if (area > best) { best = area; bestIdx = j }
        j += 1
      }
      out += pts(bestIdx)
      a = bestIdx
      i += 1
    }
    out += pts(n - 1)
    out.result()
  }

  /** Per-series LTTB over a DataFrame: each `seriesCol` group's (x, y)
    * points reduce to ≤ k. The per-series point set assembles with
    * `sort_array(collect_list(...))` — a chart series is by definition
    * small enough to render, and `maxPoints` guards the pathological case
    * with a uniform pre-stride inside the same pass (documented fidelity
    * trade, same bounded-state discipline as the streaming buffers). The
    * LTTB selection itself is iterative geometry no builtin expresses —
    * the documented UDF exception.
    */
  def downsampleSeries(d: DataFrame, seriesCol: String, xCol: String,
                       yCol: String, k: Int,
                       maxPoints: Int = 1 << 20): DataFrame = {
    val sel = udf { (arr: Seq[Row]) =>
      var pts = arr.map(r => (r.getDouble(0), r.getDouble(1))).toIndexedSeq
      if (pts.length > maxPoints) {
        val stride = math.ceil(pts.length.toDouble / maxPoints).toInt
        val idx = pts.indices.by(stride)
        // force-include the final index: the stride otherwise drops the
        // series' last point whenever (n-1) % stride != 0, and the LTTB
        // endpoint invariant (gated by viz_lttb_check) must survive the
        // documented pre-stride fidelity trade
        val withEnd =
          if (idx.last == pts.length - 1) idx else idx :+ (pts.length - 1)
        pts = withEnd.map(pts).toIndexedSeq
      }
      lttb(pts, k)
    }
    d.select(col(seriesCol),
        struct(col(xCol).cast("double").as("x"),
          col(yCol).cast("double").as("y")).as("p"))
      .groupBy(col(seriesCol))
      .agg(sort_array(collect_list(col("p"))).as("pts"))
      .select(col(seriesCol), explode(sel(col("pts"))).as("q"))
      .select(col(seriesCol), col("q._1").as("x"), col("q._2").as("y"))
  }

  /** LTTB semantic gate (the `pack_bins_ffd_check` pattern): DuckDB cannot
    * run the triangle selection, but it CAN independently derive the
    * conservation columns — series count and Σ min(k, n_in) output points —
    * and assert the invariant-violation counters are zero. Any downsampling
    * bug flips a counter: a fabricated/duplicated point breaks
    * `multiset_violations` (output must be a sub-multiset of the input), a
    * dropped endpoint breaks `missing_endpoints` (LTTB keeps the first and
    * last point of the (x, y)-sorted series), and a wrong output size
    * breaks `size_mismatch_series` / `total_points` (exactly min(k, n) per
    * series — which with sub-multiset membership also forces the kept
    * points to be distinct positions of the sorted input, i.e. the
    * strictly-increasing order the algorithm guarantees).
    */
  def lttbInvariants(d: DataFrame, seriesCol: String, xCol: String,
                     yCol: String, k: Int): DataFrame = {
    val in = d.select(col(seriesCol).as("s"),
      col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
    val out = downsampleSeries(d, seriesCol, xCol, yCol, k)
      .select(col(seriesCol).as("s"), col("x"), col("y"))
    val nIn = in.groupBy(col("s")).agg(count(lit(1)).as("n_in"))
    val nOut = out.groupBy(col("s")).agg(count(lit(1)).as("n_out"))
    val sizes = nOut.join(nIn, "s")
      .agg(count(lit(1)).cast("long").as("n_series"),
        sum(col("n_out")).cast("long").as("total_points"),
        sum(when(col("n_out") =!= least(lit(k.toLong), col("n_in")), 1L)
          .otherwise(0L)).as("size_mismatch_series"))
    val outM = out.groupBy(col("s"), col("x"), col("y"))
      .agg(count(lit(1)).as("m_out"))
    val inM = in.groupBy(col("s"), col("x"), col("y"))
      .agg(count(lit(1)).as("m_in"))
    val multi = outM.join(inM, Seq("s", "x", "y"), "left")
      .agg(coalesce(sum(
        when(col("m_out") > coalesce(col("m_in"), lit(0L)),
          col("m_out") - coalesce(col("m_in"), lit(0L))).otherwise(0L)),
        lit(0L)).as("multiset_violations"))
    val ends = in.groupBy(col("s")).agg(
      min(struct(col("x"), col("y"))).as("p_first"),
      max(struct(col("x"), col("y"))).as("p_last"))
    // per-series kept-point sets are ≤ k entries by the contract under test
    val outPts = out.groupBy(col("s"))
      .agg(collect_set(struct(col("x"), col("y"))).as("pts"))
    val missEnds = ends.join(outPts, "s")
      .agg(coalesce(sum(
        when(array_contains(col("pts"), col("p_first")), 0L).otherwise(1L) +
          when(array_contains(col("pts"), col("p_last")), 0L).otherwise(1L)),
        lit(0L)).as("missing_endpoints"))
    sizes.crossJoin(multi).crossJoin(missEnds)
  }

  private def series(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "events")
      .select(col("user_id"), expr("ts div 1000").as("x"), col("value"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-user 20-point LTTB reduction of the value series (rows-only:
    // triangle selection is not SQL-expressible; algorithm spec-pinned;
    // semantics oracle-gated by viz_lttb_check below)
    "viz_lttb_downsample" -> ((s, dir) =>
      downsampleSeries(series(s, dir),
        seriesCol = "user_id", xCol = "x", yCol = "value", k = 20)),
    // the LTTB semantic gate — hash-compared against an oracle that derives
    // the conservation columns from raw `events` and pins the violation
    // counters at zero
    "viz_lttb_check" -> ((s, dir) =>
      lttbInvariants(series(s, dir),
        seriesCol = "user_id", xCol = "x", yCol = "value", k = 20)))

  def oracles: Map[String, String] = Map(
    "viz_lttb_check" ->
      """WITH n AS (SELECT user_id, COUNT(*) AS n_in FROM events GROUP BY user_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_series,
        |  CAST(SUM(LEAST(20, n_in)) AS BIGINT) AS total_points,
        |  CAST(0 AS BIGINT) AS size_mismatch_series,
        |  CAST(0 AS BIGINT) AS multiset_violations,
        |  CAST(0 AS BIGINT) AS missing_endpoints
        |FROM n""".stripMargin)
}
