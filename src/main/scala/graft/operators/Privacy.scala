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

  /** Inverse-CDF threshold table for the discrete Laplace (two-sided
    * geometric) distribution at ε = epsNum/epsDen — the integer-valued
    * mechanism production DP libraries use for count releases (Ghosh,
    * Roughgarden & Sundararajan, SIAM J. Comput. 2012 proved it
    * universally utility-maximizing; Canonne, Kamath & Steinke, NeurIPS
    * 2020 treat its discrete-noise practicalities).
    *
    * pmf P(X=k) = (1−α)/(1+α)·α^|k| with α = e^(−ε); the CDF is
    *   F(k) = α^(−k)/(1+α)        for k < 0
    *   F(k) = 1 − α^(k+1)/(1+α)   for k ≥ 0
    * Each row (k, lo, hi) assigns noise k to the 52-bit uniform U ∈
    * [lo, hi), with τ(k) = round(F(k)·2^52). The tail is truncated where
    * the interval rounds empty (α^K·2^52 < 1 ⇒ K ≈ 53·ln2/ε), a ≤2^−52
    * total-variation perturbation — below the resolution of the uniform
    * itself.
    *
    * The table is computed ONCE, driver-side, in plain Scala; both the
    * Spark query and the DuckDB oracle consume the SAME Long thresholds
    * (a broadcast range join / a VALUES list), so the release is
    * bit-reproducible across engines with no RNG state anywhere — the
    * "randomness" is a keyed md5 of the group, exactly the seeded-noise
    * discipline a replayable 100 TB pipeline needs.
    */
  def dpNoiseThresholds(epsNum: Long, epsDen: Long): Seq[(Int, Long, Long)] = {
    require(epsNum > 0 && epsDen > 0, s"ε must be positive, got $epsNum/$epsDen")
    val alpha = math.exp(-epsNum.toDouble / epsDen)
    val M = 1L << 52
    def cdf(k: Int): Double =
      if (k < 0) math.pow(alpha, -k) / (1 + alpha)
      else 1.0 - math.pow(alpha, k + 1) / (1 + alpha)
    val maxK = math.ceil(53 * math.log(2) / -math.log(alpha)).toInt
    var prev = 0L
    (-maxK to maxK).flatMap { k =>
      val hi0 = if (k == maxK) M else math.round(cdf(k) * M)
      val hi = math.min(M, math.max(hi0, prev)) // monotone + range clamp
      val lo = prev
      prev = hi
      if (hi > lo) Some((k, lo, hi)) else None
    }
  }

  /** The 52-bit keyed uniform both engines derive identically:
    * U = first 13 hex chars of md5(salt-key1-key2-…) ∈ [0, 2^52).
    */
  private def u52(salt: String, keys: Seq[Column]): Column =
    conv(substring(md5(concat_ws("-",
      lit(salt) +: keys.map(c => coalesce(c.cast("string"), lit(""))): _*)),
      1, 13), 16, 10).cast("long")

  private def noiseTable(s: SparkSession, epsNum: Long, epsDen: Long): DataFrame =
    s.createDataFrame(dpNoiseThresholds(epsNum, epsDen))
      .toDF("noise_k", "nt_lo", "nt_hi")

  /** ε-differentially-private group counts: COUNT has sensitivity 1, so
    * adding discrete-Laplace(ε) noise per group is the textbook release.
    * Noisy counts may be negative — post-processing (clamping) is the
    * CONSUMER's choice and costs no budget; the release stays raw so the
    * gate compares the mechanism itself.
    *
    * Scale shape: one hash aggregation (partial+final) over the corpus,
    * then a broadcast range join against the ~150-row threshold table on
    * the ALREADY-AGGREGATED relation — per-group work is O(1), nothing
    * corpus-sized moves after the groupBy.
    */
  def dpNoisyCounts(df: DataFrame, quasi: Seq[String],
                    epsNum: Long, epsDen: Long,
                    salt: String = "dp-v1"): DataFrame = {
    val s = df.sparkSession
    df.groupBy(quasi.map(col): _*).agg(count(lit(1)).as("n"))
      .withColumn("u52", u52(salt, quasi.map(col)))
      .join(broadcast(noiseTable(s, epsNum, epsDen)),
        col("u52") >= col("nt_lo") && col("u52") < col("nt_hi"))
      .select(quasi.map(col) :+
        (col("n") + col("noise_k")).cast("long").as("noisy_n"): _*)
  }

  /** ε-DP group sums via clip-then-quantize: each value is clipped to
    * [0, clip] (bounding any one row's influence — the sensitivity), the
    * clipped sum is quantized to `floor(sum/clip)` (an integer query with
    * sensitivity 1), discrete-Laplace(ε) noise is added in CLIP UNITS, and
    * the release is rescaled. Quantizing at the sensitivity granularity is
    * what keeps the threshold table small at ANY clip bound — the noise
    * scale in release units is clip/ε, exactly the Laplace mechanism's.
    * Values stay integer-exact end to end (clip and sums in cents-free
    * longs), so the oracle replays bit-for-bit.
    */
  def dpNoisySums(df: DataFrame, quasi: Seq[String], value: Column, clip: Long,
                  epsNum: Long, epsDen: Long,
                  salt: String = "dp-sum-v1"): DataFrame = {
    val s = df.sparkSession
    val clipped = greatest(lit(0L), least(value.cast("long"), lit(clip)))
    df.groupBy(quasi.map(col): _*)
      .agg(sum(clipped).as("clipped_sum"))
      .withColumn("u52", u52(salt, quasi.map(col)))
      .join(broadcast(noiseTable(s, epsNum, epsDen)),
        col("u52") >= col("nt_lo") && col("u52") < col("nt_hi"))
      .select(quasi.map(col) :+
        ((floor(col("clipped_sum") / clip).cast("long") + col("noise_k")) * clip)
          .as("noisy_sum"): _*)
  }

  /** Keyed deterministic pseudonymization: the direct identifier is
    * replaced by md5(salt ‖ key) — the same key always maps to the same
    * token (referential integrity survives: joins, counts and group sizes
    * are identical on tokens and on raw keys, spec-pinned), different
    * salts produce unlinkable token spaces (rotate the salt to revoke a
    * release), and the raw key never appears in the output. This is the
    * tokenization half of a de-identification pipeline;
    * [[Curation.redactPii]] handles free-text identifiers and the k/l/t
    * checks above measure what the residual quasi-identifiers leak.
    *
    * Scale shape: a pure per-row projection — zero shuffles added. Joins
    * on the 32-hex token instead of the raw long hash-partition the same
    * way (the join key is hashed either way); the real pipeline
    * materializes tokenized tables once and serves every downstream read
    * from them.
    */
  def pseudonym(key: Column, salt: String): Column =
    md5(concat_ws("-", lit(salt), key.cast("string")))

  /** The threshold table as a DuckDB VALUES list — the SAME Longs the
    * Spark side broadcasts, so the oracle is a replay, not a re-derivation.
    */
  private def noiseValuesSql(epsNum: Long, epsDen: Long): String =
    dpNoiseThresholds(epsNum, epsDen)
      .map { case (k, lo, hi) => s"($k,$lo,$hi)" }
      .mkString(",")

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
        .withColumnRenamed("q", "c_nationkey")),
    // ε = 1/2 DP counts per (segment, nation) cohort — discrete-Laplace
    // noise from a keyed md5 uniform, bit-reproducible in both engines
    // (oracle-gated; the mechanism's CDF is spec-pinned in PrivacySpec)
    "privacy_dp_counts" -> ((s, dir) =>
      dpNoisyCounts(cust(s, dir), Seq("c_mktsegment", "c_nationkey"),
        epsNum = 1, epsDen = 2)),
    // ε = 1/2 DP account-balance sums per segment, clipped to [0, 5000]
    // and quantized at the clip granularity (oracle-gated)
    "privacy_dp_sum" -> ((s, dir) =>
      dpNoisySums(cust(s, dir), Seq("c_mktsegment"), col("c_acctbal"),
        clip = 5000L, epsNum = 1, epsDen = 2)),
    // customer keys tokenized in BOTH tables, then joined on the token:
    // the per-segment order stats must equal the raw-key join's (the
    // referential-integrity claim, oracle-gated; raw≡token spec-pinned)
    "privacy_pseudonymize" -> ((s, dir) => {
      val c = cust(s, dir).select(
        pseudonym(col("c_custkey"), "pseu-v1").as("pid"), col("c_mktsegment"))
      val o = graft.Tables(s, dir, "orders").select(
        pseudonym(col("o_custkey"), "pseu-v1").as("pid"), col("o_totalprice"))
      o.join(c, "pid")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("pid")).as("n_active_customers"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
    })
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
        |FROM bw GROUP BY w""".stripMargin,
    // the SAME threshold Longs the Spark side broadcasts, as a VALUES
    // list — the oracle replays the mechanism, it does not re-derive it.
    // Quasi columns are COALESCE'd to '' to match the Spark u52 exactly:
    // Spark's concat_ws keeps the separator around a coalesced '' while
    // DuckDB's concat_ws SKIPS a NULL argument, so a NULL quasi value
    // would hash (and therefore noise) differently between the engines.
    "privacy_dp_counts" ->
      s"""WITH nt(noise_k, nt_lo, nt_hi) AS (VALUES ${noiseValuesSql(1, 2)}),
        |g AS (SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
        |  ('0x' || substr(md5(concat_ws('-', 'dp-v1',
        |    COALESCE(CAST(c_mktsegment AS VARCHAR), ''),
        |    COALESCE(CAST(c_nationkey AS VARCHAR), ''))), 1, 13))::UBIGINT AS u52
        |  FROM customer GROUP BY 1, 2)
        |SELECT c_mktsegment, c_nationkey, CAST(n + noise_k AS BIGINT) AS noisy_n
        |FROM g JOIN nt ON g.u52 >= nt.nt_lo AND g.u52 < nt.nt_hi""".stripMargin,
    "privacy_dp_sum" ->
      s"""WITH nt(noise_k, nt_lo, nt_hi) AS (VALUES ${noiseValuesSql(1, 2)}),
        |g AS (SELECT c_mktsegment,
        |  SUM(GREATEST(0, LEAST(CAST(TRUNC(c_acctbal) AS BIGINT), 5000))) AS clipped_sum,
        |  ('0x' || substr(md5(concat_ws('-', 'dp-sum-v1',
        |    COALESCE(CAST(c_mktsegment AS VARCHAR), ''))),
        |    1, 13))::UBIGINT AS u52
        |  FROM customer GROUP BY 1)
        |SELECT c_mktsegment,
        |  (CAST(FLOOR(CAST(clipped_sum AS DOUBLE) / 5000) AS BIGINT) + noise_k) * 5000 AS noisy_sum
        |FROM g JOIN nt ON g.u52 >= nt.nt_lo AND g.u52 < nt.nt_hi""".stripMargin,
    "privacy_pseudonymize" ->
      """WITH c AS (SELECT md5(concat_ws('-', 'pseu-v1',
        |    CAST(c_custkey AS VARCHAR))) AS pid, c_mktsegment FROM customer),
        |o AS (SELECT md5(concat_ws('-', 'pseu-v1',
        |    CAST(o_custkey AS VARCHAR))) AS pid, o_totalprice FROM orders)
        |SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  COUNT(DISTINCT o.pid) AS n_active_customers,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM o JOIN c USING (pid)
        |GROUP BY c_mktsegment""".stripMargin
  )
}
