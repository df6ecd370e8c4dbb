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
      generalizationLadder(cust(s, dir), col("c_acctbal")))
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
