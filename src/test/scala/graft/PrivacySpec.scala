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

  // the 52-bit uniform re-derived OUTSIDE Spark (JDK MessageDigest) — the
  // dp tests replay the mechanism through an independent md5 path
  private def md5u52(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 13), 16)

  private def noiseAt(u: Long, thr: Seq[(Int, Long, Long)]): Int =
    thr.find(t => u >= t._2 && u < t._3)
      .getOrElse(fail(s"u=$u not covered by the threshold table"))._1

  test("dp thresholds: exact partition of [0, 2^52) matching the " +
    "discrete-Laplace pmf, symmetric in k") {
    val thr = Privacy.dpNoiseThresholds(1, 2)
    val M = 1L << 52
    assert(thr.head._2 === 0L)
    assert(thr.last._3 === M)
    thr.sliding(2).foreach { // contiguous intervals, strictly increasing k
      case Seq(a, b) =>
        assert(a._3 === b._2, s"gap between $a and $b")
        assert(a._1 < b._1, s"k not increasing: $a -> $b")
      case _ => ()
    }
    val alpha = math.exp(-0.5)
    val widths = thr.map { case (k, lo, hi) => k -> (hi - lo) }.toMap
    widths.foreach { case (k, w) =>
      val pmf = (1 - alpha) / (1 + alpha) * math.pow(alpha, math.abs(k))
      assert(math.abs(w - pmf * M) <= 2.0,
        s"k=$k interval width $w drifts from pmf ${pmf * M}")
      assert(math.abs(w - widths.getOrElse(-k, 0L)) <= 2L, s"asymmetric at k=$k")
    }
    // tighter ε → tighter noise: the ε=2 table spans fewer noise values
    val tight = Privacy.dpNoiseThresholds(2, 1)
    assert(tight.last._1 < thr.last._1)
  }

  test("dp counts: release equals the JDK-md5 replay; noise is bounded and salt-keyed") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 1)).toDF("seg", "x")
    val out = Privacy.dpNoisyCounts(df, Seq("seg"), epsNum = 1, epsDen = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val thr = Privacy.dpNoiseThresholds(1, 2)
    assert(out("a") === 3L + noiseAt(md5u52("dp-v1-a"), thr))
    assert(out("b") === 1L + noiseAt(md5u52("dp-v1-b"), thr))
    val maxK = thr.last._1
    out.foreach { case (_, v) => assert(math.abs(v) <= 3 + maxK) }
    // a different salt re-keys the uniform: same groups, different noise
    val resalted = Privacy.dpNoisyCounts(df, Seq("seg"),
        epsNum = 1, epsDen = 2, salt = "dp-v2")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(resalted("a") === 3L + noiseAt(md5u52("dp-v2-a"), thr))
  }

  test("dp sums: clip bounds one row's influence; release is clip-quantized " +
    "and matches the JDK replay") {
    val df = Seq(("g", 6000.0), ("g", -100.0), ("g", 1234.0)).toDF("seg", "v")
    val out = Privacy.dpNoisySums(df, Seq("seg"), col("v"), clip = 5000L,
        epsNum = 1, epsDen = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = noiseAt(md5u52("dp-sum-v1-g"),
      Privacy.dpNoiseThresholds(1, 2))
    // clipped: 5000 (clipped down from 6000) + 0 (negative) + 1234 = 6234
    // → floor(6234/5000) = 1 clip unit → release (1 + k)·5000
    assert(out("g") === (1L + k) * 5000L)
    assert(out("g") % 5000L === 0L)
  }

  test("pseudonymize: tokens preserve referential integrity, never expose " +
    "the key, and re-salt into an unlinkable space") {
    val dir = "/root/testdata/sf0.001"
    val c = graft.Tables(spark, dir, "customer")
    val o = graft.Tables(spark, dir, "orders")
    // token cardinality == key cardinality (collision-free on this domain)
    val nKeys = c.select(col("c_custkey")).distinct().count()
    val tok = c.select(Privacy.pseudonym(col("c_custkey"), "s1").as("pid"))
    assert(tok.distinct().count() === nKeys)
    // the raw-key join and the token join produce identical aggregates
    val raw = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaTok = o.select(Privacy.pseudonym(col("o_custkey"), "s1").as("pid"))
      .join(c.select(Privacy.pseudonym(col("c_custkey"), "s1").as("pid"),
        col("c_mktsegment")), "pid")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaTok === raw)
    // tokens are 32-hex and never equal the raw key's string form
    val sample = c.select(col("c_custkey").cast("string").as("k"),
        Privacy.pseudonym(col("c_custkey"), "s1").as("pid"))
      .limit(20).collect()
    sample.foreach { r =>
      assert(r.getString(1).matches("[0-9a-f]{32}"))
      assert(r.getString(1) !== r.getString(0))
    }
    // a rotated salt shares NO tokens with the old space
    val s2 = c.select(Privacy.pseudonym(col("c_custkey"), "s2").as("pid"))
    assert(tok.intersect(s2).count() === 0L)
  }
}
