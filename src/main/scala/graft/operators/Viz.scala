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
        pts = pts.indices.by(stride).map(pts).toIndexedSeq
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-user 20-point LTTB reduction of the value series (rows-only:
    // triangle selection is not SQL-expressible; algorithm spec-pinned)
    "viz_lttb_downsample" -> ((s, dir) =>
      downsampleSeries(
        graft.Tables(s, dir, "events")
          .select(col("user_id"), expr("ts div 1000").as("x"), col("value")),
        seriesCol = "user_id", xCol = "x", yCol = "value", k = 20)))

  def oracles: Map[String, String] = Map.empty
}
