package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

/** Hand-computed pins for the privacy/governance operators. */
class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val people = Seq(
    // (zip, age, disease)
    ("130", 28, "flu"), ("130", 28, "flu"), ("130", 28, "cold"),
    ("130", 29, "flu"),                       // cohort of 1 → k<2 violation
    ("131", 40, "flu"), ("131", 40, "flu")    // cohort of 2, 1 secret value
  ).toDF("zip", "age", "disease")

  test("k-anonymity flags exactly the small cohorts") {
    val v = Privacy.kAnonymityViolations(people, Seq(col("zip"), col("age")), k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(v.toSet === Set(("130", 29, 1L)))
    // k=3 additionally flags the (131,40) pair
    val v3 = Privacy.kAnonymityViolations(people, Seq(col("zip"), col("age")), k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(v3 === Set(("130", 29), ("131", 40)))
  }

  test("l-diversity flags homogeneous cohorts even when k-anonymous") {
    val v = Privacy.lDiversityViolations(people, Seq(col("zip"), col("age")),
        col("disease"), l = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(3))).toSet
    // (130,28) has 2 diseases → fine; (130,29) and (131,40) have 1 each
    assert(v === Set(("130", 29, 1L), ("131", 40, 1L)))
  }

  test("generalization ladder: min group size is monotone in width, " +
    "top width is one bucket") {
    val ladder = Privacy.generalizationLadder(
        graft.Tables(spark, "/root/testdata/sf0.001", "customer"),
        col("c_acctbal"))
      .orderBy(col("w")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ladder.length === 17)
    ladder.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3, s"min_group_n not monotone: $a -> $b")
    case _ => ()
    }
    // 2^16 = 65536 covers the whole acctbal range → a single bucket holding
    // every row... unless the range straddles a bucket boundary (negatives):
    // allow ≤ 2 buckets whose total is the row count
    val top = ladder.last
    assert(top._2 <= 2, top)
    // ladder derives from ONE finest histogram: widths nest, so bucket
    // counts never increase with width
    ladder.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2, s"n_buckets grew with width: $a -> $b")
    case _ => ()
    }
  }
}
