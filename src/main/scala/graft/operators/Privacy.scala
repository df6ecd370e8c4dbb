package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Privacy / re-identification governance over a training corpus — the
  * release-gating checks a dataset passes before it leaves the pipeline,
  * complementing [[Curation.redactPii]] (which removes direct identifiers;
  * these operators measure what the RESIDUAL quasi-identifiers still leak):
  *
  *  - k-anonymity (Sweeney 2002): a quasi-identifier combination held by
  *    fewer than k rows singles those rows out;
  *  - l-diversity (Machanavalli et al. 2007): a k-anonymous group whose
  *    sensitive attribute shows < l distinct values still discloses it;
  *  - generalization ladder: the minimal bucket width that makes a numeric
  *    quasi-identifier k-anonymous — the knob an anonymizer actually turns.
  *
  * Scale shape: every check is ONE hash aggregation keyed by the quasi
  * columns (partial+final, shuffle carries group rows only). The ladder
  * never re-scans per candidate width: the corpus reduces ONCE to the
  * finest-width histogram (bounded by the value range), and all coarser
  * widths fold that histogram (floor(x/2w) nests inside floor(x/w)) — the
  * per-width work is metadata-sized.
  */
object Privacy {

  /** Quasi-identifier groups with fewer than `k` members — each row here is
    * a re-identifiable cohort that blocks release.
    */
  def kAnonymityViolations(df: DataFrame, quasi: Seq[Column], k: Int): DataFrame =
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)

  /** Groups (by quasi-identifier) whose sensitive attribute has fewer than
    * `l` distinct values: the cohort may be large, but everyone in it shares
    * the "secret".
    */
  def lDiversityViolations(df: DataFrame, quasi: Seq[Column],
                           sensitive: Column, l: Int): DataFrame =
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(sensitive).as("n_distinct_sensitive"))
      .filter(col("n_distinct_sensitive") < l)

  /** Power-of-two generalization ladder for a numeric quasi-identifier:
    * for each width w = 2^0..2^maxExp, the bucket count and the SMALLEST
    * bucket population — pick the first width whose `min_group_n ≥ k` to
    * anonymize. Monotone by construction (each coarser bucket contains a
    * finer one, so `min_group_n` never decreases with w — spec-pinned).
    *
    * One corpus-wide shuffle total: the finest histogram `floor(x)` is the
    * only aggregation over data; every width derives from it because
    * floor(floor(x)/w) = floor(x/w) for integer w ≥ 1.
    */
  def generalizationLadder(df: DataFrame, x: Column, maxExp: Int = 16): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val hist = df.select(floor(x).cast("long").as("b1"))
      .groupBy(col("b1")).agg(count(lit(1)).as("n"))
    val widths = (0 to maxExp).map(1L << _).toDF("w")
    hist.crossJoin(broadcast(widths))
      .select(col("w"),
        floor(col("b1").cast("double") / col("w")).cast("long").as("bw"), col("n"))
      .groupBy(col("w"), col("bw")).agg(sum(col("n")).as("bn"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_buckets"), min(col("bn")).as("min_group_n"))
  }

  /** t-closeness (Li, Li & Venkatasubramanian, ICDE 2007) for a
    * CATEGORICAL sensitive attribute, where the paper's EMD reduces to
    * total-variation distance: a quasi-identifier cohort violates when
    * TV(cohort's sensitive distribution, global distribution) > t.
    *
    * Exactness trick — the whole computation stays in INTEGERS: with
    * cohort counts c_gc (category c in group g), cohort size n_g, global
    * counts C_c and total N,
    *   TV = (1/2)·Σ_c |c_gc/n_g − C_c/N| = Σ_c |c_gc·N − C_c·n_g| / (2·n_g·N)
    * so `tv2 = Σ_c |c_gc·N − C_c·n_g|` is an exact long (counts ≤ 10⁶ at
    * any battery scale ⇒ products < 2⁶³), integer sums are associative —
    * no float distribution arithmetic, no summation-order hazard — and the
    * t = tNum/tDen test becomes `tv2·tDen > 2·tNum·n_g·N`, exact for any
    * rational t. Categories ABSENT from a cohort still contribute
    * C_c·n_g, so the comparison runs over the (cohorts × categories) grid
    * (a cross join of two tiny aggregates, broadcast), not just observed
    * pairs — dropping them understates TV exactly when the cohort is most
    * skewed, i.e. when it matters.
    */
  def tClosenessByGroup(df: DataFrame, quasi: Column, sensitive: Column,
                        tNum: Long, tDen: Long): DataFrame = {
    require(tNum >= 0 && tDen > 0, s"t must be a rational ≥ 0, got $tNum/$tDen")
    val gCounts = df.groupBy(quasi.as("q"), sensitive.as("sv"))
      .agg(count(lit(1)).as("cgc"))
    val gTot = df.groupBy(quasi.as("q")).agg(count(lit(1)).as("n_g"))
    val cTot = df.groupBy(sensitive.as("sv")).agg(count(lit(1)).as("c_c"))
    val total = df.agg(count(lit(1)).as("n_total"))
    gTot.crossJoin(broadcast(cTot)).crossJoin(broadcast(total))
      .join(gCounts, Seq("q", "sv"), "left")
      .withColumn("term",
        abs(coalesce(col("cgc"), lit(0L)) * col("n_total") -
          col("c_c") * col("n_g")))
      .groupBy(col("q"), col("n_g"), col("n_total"))
      .agg(sum(col("term")).as("tv2"))
      .select(col("q"), col("n_g").as("n"), col("tv2"),
        (col("tv2") * tDen > lit(2L) * tNum * col("n_g") * col("n_total"))
          .as("violation"))
  }

  private def cust(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "customer")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // cohorts smaller than k=10 on (segment, nation) (oracle-gated)
    "privacy_k_anonymity" -> ((s, dir) =>
      kAnonymityViolations(cust(s, dir),
        Seq(col("c_mktsegment"), col("c_nationkey")), k = 10)),
    // cohorts on (nation, balance-kilobucket) where the segment "secret"
    // shows < 3 values (oracle-gated)
    "privacy_l_diversity" -> ((s, dir) =>
      lDiversityViolations(cust(s, dir),
        Seq(col("c_nationkey"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("bal_kb")),
        col("c_mktsegment"), l = 3)),
    // the anonymization knob: per-width bucket stats for c_acctbal
    // (oracle-gated; monotonicity spec-pinned)
    "privacy_generalize_ladder" -> ((s, dir) =>
      generalizationLadder(cust(s, dir), col("c_acctbal"))),
    // t-closeness at t = 1/20 on nation cohorts vs the global segment
    // distribution — integer-exact TV, one row per cohort (oracle-gated)
    "privacy_t_closeness" -> ((s, dir) =>
      tClosenessByGroup(cust(s, dir), col("c_nationkey"),
          col("c_mktsegment"), tNum = 1, tDen = 20)
        .withColumnRenamed("q", "c_nationkey"))
  )

  def oracles: Map[String, String] = Map(
    "privacy_k_anonymity" ->
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
        |FROM customer GROUP BY 1, 2 HAVING COUNT(*) < 10""".stripMargin,
    "privacy_l_diversity" ->
      """SELECT c_nationkey, CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_kb,
        |  COUNT(*) AS n, COUNT(DISTINCT c_mktsegment) AS n_distinct_sensitive
        |FROM customer GROUP BY 1, 2
        |HAVING COUNT(DISTINCT c_mktsegment) < 3""".stripMargin,
    // the same integer TV grid: cohorts × ALL categories (absent ones
    // contribute C_c·n_g), t = 1/20 as exact integer comparison
    "privacy_t_closeness" ->
      """WITH g AS (SELECT c_nationkey AS q, c_mktsegment AS sv, COUNT(*) AS cgc
        |  FROM customer GROUP BY 1, 2),
        |gt AS (SELECT c_nationkey AS q, COUNT(*) AS n_g FROM customer GROUP BY 1),
        |ct AS (SELECT c_mktsegment AS sv, COUNT(*) AS c_c FROM customer GROUP BY 1),
        |tt AS (SELECT COUNT(*) AS n_total FROM customer),
        |grid AS (
        |  SELECT gt.q, gt.n_g, ct.sv, ct.c_c, tt.n_total,
        |    ABS(COALESCE(g.cgc, 0) * tt.n_total - ct.c_c * gt.n_g) AS term
        |  FROM gt CROSS JOIN ct CROSS JOIN tt
        |  LEFT JOIN g ON g.q = gt.q AND g.sv = ct.sv)
        |SELECT q AS c_nationkey, n_g AS n,
        |  CAST(SUM(term) AS BIGINT) AS tv2,
        |  CAST(SUM(term) AS BIGINT) * 20 > 2 * 1 * n_g * n_total AS violation
        |FROM grid GROUP BY q, n_g, n_total""".stripMargin,
    "privacy_generalize_ladder" ->
      """WITH h AS (
        |  SELECT CAST(FLOOR(c_acctbal) AS BIGINT) AS b1, COUNT(*) AS n
        |  FROM customer GROUP BY 1),
        |w(w) AS (VALUES (1),(2),(4),(8),(16),(32),(64),(128),(256),(512),
        |  (1024),(2048),(4096),(8192),(16384),(32768),(65536)),
        |bw AS (
        |  SELECT CAST(w.w AS BIGINT) AS w,
        |    CAST(FLOOR(CAST(h.b1 AS DOUBLE) / w.w) AS BIGINT) AS bw,
        |    CAST(SUM(h.n) AS BIGINT) AS bn
        |  FROM h CROSS JOIN w GROUP BY 1, 2)
        |SELECT w, COUNT(*) AS n_buckets, MIN(bn) AS min_group_n
        |FROM bw GROUP BY w""".stripMargin
  )
}
