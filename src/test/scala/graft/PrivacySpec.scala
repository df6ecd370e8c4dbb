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

  test("t-closeness: hand-computed integer TV, absent-category term, threshold boundary") {
    // global: flu 4/6, cold 2/6. zip 130 (4 rows: 3 flu, 1 cold):
    //   tv2 = |3·6 − 4·4| + |1·6 − 2·4| = 2 + 2 = 4; TV = 4/(2·4·6) = 1/12
    // zip 131 (2 rows: 1 flu, 1 cold):
    //   tv2 = |1·6 − 4·2| + |1·6 − 2·2| = 2 + 2 = 4; TV = 4/(2·2·6) = 1/6
    // zip 132 (2 rows: 2 cold, flu ABSENT — its C_c·n_g term must count):
    //   tv2 = |0·6 − 4·2| + |2·6 − 2·2| = 8 + 8 = 16; TV = 16/24 = 2/3
    val d = Seq(
      ("130", "flu"), ("130", "flu"), ("130", "flu"), ("130", "cold"),
      ("131", "flu"), ("131", "cold")
    ).toDF("zip", "disease")
    val d3 = d.union(Seq(("132", "cold"), ("132", "cold")).toDF("zip", "disease"))
    // recompute the hand numbers on the 8-row corpus: global flu 4, cold 4, N 8
    // zip 130: |3·8−4·4| + |1·8−4·4| = 8 + 8 = 16; TV = 16/(2·4·8) = 1/4
    // zip 131: |1·8−4·2| + |1·8−4·2| = 0 + 0 = 0;  TV = 0
    // zip 132: |0·8−4·2| + |2·8−4·2| = 8 + 8 = 16; TV = 16/(2·2·8) = 1/2
    def run(tNum: Long, tDen: Long) =
      Privacy.tClosenessByGroup(d3, col("zip"), col("disease"), tNum, tDen)
        .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    val at04 = run(2, 5) // t = 0.4: only zip 132 (TV = 0.5) violates
    assert(at04 === Map("130" -> (16L, false), "131" -> (0L, false),
      "132" -> (16L, true)))
    // boundary exactness: t = 1/4 — zip 130's TV EQUALS t, strict > means clean
    val at025 = run(1, 4)
    assert(at025("130") === ((16L, false)))
    assert(at025("132") === ((16L, true)))
  }

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
