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
