package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Viz

/** LTTB downsampling specs: canonical outlier retention, structural
  * invariants, and the DataFrame wrapper's per-series behavior.
  */
class VizSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lttb keeps endpoints and the visually-dominant outlier") {
    // flat line with one spike: uniform striding at k=5 over 100 points
    // would likely miss index 37; the triangle criterion must keep it
    val pts = (0 until 100).map(i =>
      (i.toDouble, if (i == 37) 50.0 else 1.0)).toIndexedSeq
    val out = Viz.lttb(pts, 5)
    assert(out.length === 5)
    assert(out.head === pts.head && out.last === pts.last)
    assert(out.contains((37.0, 50.0)), s"spike dropped: $out")
  }

  test("lttb structural invariants: subset, sorted, exact k, edge cases") {
    val rnd = new scala.util.Random(5)
    val pts = (0 until 500).map(i => (i.toDouble, rnd.nextDouble() * 100)).toIndexedSeq
    for (k <- Seq(3, 10, 100)) {
      val out = Viz.lttb(pts, k)
      assert(out.length === k)
      assert(out.toSet.subsetOf(pts.toSet), "invented a point")
      assert(out.map(_._1) === out.map(_._1).sorted, "x order broken")
      assert(out.head === pts.head && out.last === pts.last)
    }
    assert(Viz.lttb(pts, 500) === pts)      // k >= n: identity
    assert(Viz.lttb(pts, 1000) === pts)
    assert(Viz.lttb(pts.take(1), 5) === pts.take(1))
    assert(Viz.lttb(IndexedSeq.empty, 5) === IndexedSeq.empty)
    // degenerate budgets never exceed k (k∈{0,1} used to return 2 points)
    assert(Viz.lttb(pts, 2) === IndexedSeq(pts.head, pts.last))
    assert(Viz.lttb(pts, 1) === IndexedSeq(pts.head))
    assert(Viz.lttb(pts, 0) === IndexedSeq.empty)
    assert(Viz.lttb(pts, -3) === IndexedSeq.empty)
    assert(Viz.lttb(pts.take(1), 0) === IndexedSeq.empty)
  }

  test("downsampleSeries: per-series k, points from the series, order by x") {
    val d = Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), expr("ts div 1000").as("x"), col("value"))
    val out = Viz.downsampleSeries(d, "user_id", "x", "value", k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val counts = d.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byUser = out.groupBy(_._1)
    assert(byUser.keySet === counts.keySet)
    byUser.foreach { case (u, rows) =>
      assert(rows.length === math.min(20L, counts(u)), s"user $u")
    }
    // every emitted point is a real observation of that user
    val raw = d.collect()
      .map(r => (r.getLong(0), r.getLong(1).toDouble, r.getDouble(2))).toSet
    assert(out.toSet.subsetOf(raw))
  }

  test("pre-stride over maxPoints keeps the series' last point") {
    // 11 points with maxPoints=4 → stride 3 → indices 0,3,6,9: without the
    // forced final index the endpoint invariant (viz_lttb_check pins
    // missing_endpoints=0) false-fails on any series longer than maxPoints
    // whose (n-1) is not a stride multiple
    val d = (0 until 11).map(i => (1L, i.toDouble, i.toDouble))
      .toDF("s", "x", "y")
    val out = Viz.downsampleSeries(d, "s", "x", "y", k = 4, maxPoints = 4)
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(out.length === 4)
    assert(out.head === ((0.0, 0.0)) && out.last === ((10.0, 10.0)),
      s"endpoints lost through the pre-stride: ${out.toSeq}")
  }
}
