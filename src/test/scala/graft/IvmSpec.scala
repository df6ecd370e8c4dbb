package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ivm

/** Pins for incremental additive-rollup maintenance: the merge of per-batch
  * rollups must EXACTLY equal the full recompute (the IVM contract), across
  * arbitrary cuts and degenerate batches.
  */
class IvmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rollupMap(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDecimal(2), r.getDouble(3), r.getDouble(4))).toMap

  test("mergeRollups(rollup(A), rollup(B)) equals rollup(A ∪ B) exactly") {
    val all = Seq(
      ("a", 1.25), ("a", 2.50), ("a", -1.00),
      ("b", 10.00), ("b", 0.75),
      ("c", 3.00)
    ).toDF("k", "v")
    for (cut <- 0 to 6) {
      val rows = all.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("k"), col("v"))))
      val a = rows.filter(col("rn") <= cut).drop("rn")
      val b = rows.filter(col("rn") > cut).drop("rn")
      val merged = Ivm.mergeRollups(
        Ivm.additiveRollup(a, Seq(col("k")), col("v")),
        Ivm.additiveRollup(b, Seq(col("k")), col("v")), Seq("k"))
      val full = Ivm.additiveRollup(all, Seq(col("k")), col("v"))
      assert(rollupMap(merged) === rollupMap(full), s"cut=$cut")
    }
  }

  test("join-IVM: stored view + delta rollup equals a full recompute, any cuts") {
    // r12: Δ(A⋈B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB. Randomized corpus with
    // repeated join keys (orders×lines shape); every (aCut, bCut) split —
    // including all-old and all-new degenerate batches — must merge to the
    // full recompute EXACTLY. The mid cut is checked non-vacuous: all three
    // delta terms contribute pairs.
    val rnd = new scala.util.Random(7)
    val a = Seq.tabulate(40)(i =>
      (i.toLong % 12, i.toLong, s"p${i % 3}")).toDF("jk", "a_seq", "grp")
    val b = Seq.tabulate(120)(i =>
      (rnd.nextInt(12).toLong, i.toLong,
        math.round(rnd.nextDouble() * 1000) / 100.0)).toDF("jk", "b_seq", "v")
    def full = {
      val j = a.join(b, Seq("jk"))
        .select(col("grp").as("__g0"), col("v").as("__v"))
      Ivm.additiveRollup(j, Seq(col("__g0")), col("__v"))
    }
    def rm(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2), r.getDouble(3), r.getDouble(4))).toMap
    val want = rm(full)
    for (aCut <- Seq(0L, 20L, 40L); bCut <- Seq(0L, 60L, 120L)) {
      val (aOld, aDelta) = (a.filter(col("a_seq") < aCut), a.filter(col("a_seq") >= aCut))
      val (bOld, bDelta) = (b.filter(col("b_seq") < bCut), b.filter(col("b_seq") >= bCut))
      val storedJoin = aOld.join(bOld, Seq("jk"))
        .select(col("grp").as("__g0"), col("v").as("__v"))
      val merged = Ivm.mergeRollups(
        Ivm.additiveRollup(storedJoin, Seq(col("__g0")), col("__v")),
        Ivm.deltaJoinRollup(aOld, aDelta, bOld, bDelta,
          Seq("jk"), Seq(col("grp")), col("v")),
        Seq("__g0"))
      assert(rm(merged) === want, s"aCut=$aCut bCut=$bCut")
      if (aCut == 20L && bCut == 60L) {
        assert(aDelta.join(bOld, Seq("jk")).count() > 0, "ΔA⋈B₀ vacuous")
        assert(aOld.join(bDelta, Seq("jk")).count() > 0, "A₀⋈ΔB vacuous")
        assert(aDelta.join(bDelta, Seq("jk")).count() > 0, "ΔA⋈ΔB vacuous")
      }
    }
  }

  test("merge with an empty delta is the identity") {
    val base = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val empty = base.filter(lit(false))
    val merged = Ivm.mergeRollups(
      Ivm.additiveRollup(base, Seq(col("k")), col("v")),
      Ivm.additiveRollup(empty, Seq(col("k")), col("v")), Seq("k"))
    assert(rollupMap(merged) === rollupMap(
      Ivm.additiveRollup(base, Seq(col("k")), col("v"))))
  }
}
