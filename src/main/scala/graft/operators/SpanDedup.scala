package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-level (sub-document) deduplication — the C4/CCNet step that removes
  * REPEATED SPANS from documents that are otherwise unique: boilerplate
  * headers, license blocks, navigation chrome. Whole-doc dedup
  * ([[Dedup.exactDedup]]) and near-dup tiers keep one copy per document;
  * this operator edits documents in place, dropping every token covered by
  * an n-token window whose content also appears in another document.
  *
  * Distributed shape (the canonical one for corpus-scale span dedup):
  *   1. one posexplode + per-doc window pass builds (doc, pos, shingle)
  *      rows — the same token-stream pass every corpus n-gram analysis pays
  *      (shared machinery with [[Decontam.shingles]], same MD5 digest so the
  *      oracle re-derives it bit-for-bit);
  *   2. shingle frequency is a hash aggregation over 16-byte digests with
  *      map-side partial combine — the shuffle carries (digest, count)
  *      pairs, never text;
  *   3. the duplicated-shingle set joins back WITHOUT a broadcast hint:
  *      its size is data-dependent (bounded by real duplication, not corpus
  *      size), so AQE picks broadcast when it fits and shuffle-hash when it
  *      does not — the [[Dedup.minHashLsh]] precedent;
  *   4. coverage is a per-doc running-max window over the SAME partitioning
  *      as step 1's window — no extra exchange — and reconstruction is one
  *      per-doc aggregation of (pos, tok) structs.
  *
  * A token at position p is covered iff a duplicated span STARTS at some
  * s ∈ [p-n+1, p]; `max(startFlag) over rows (n-1) preceding..current` is
  * exactly that test, and evaluates in one pass per document.
  */
object SpanDedup {

  /** Width of the spans considered for removal. 5 tokens ≈ the scale of
    * boilerplate fragments on the ~40-token synthetic docs; real C4 used
    * 3-sentence spans, which at 100 TB is the same plan with a different
    * window width.
    */
  val SpanN = 5

  /** Per-document span-deduplicated text: tokens covered by any n-token
    * span occurring in ≥ `minDocs` DISTINCT documents are removed; the
    * remainder re-joins with single spaces (whitespace is normalized, as
    * in every tokenizing pass here). Documents whose every token is
    * covered come back as empty strings; null-text documents carry no
    * tokens and are absent, same as [[Decontam.dupNgramCoverage]].
    */
  def stripDuplicatedSpans(d: DataFrame, n: Int = SpanN,
                           minDocs: Int = 2): DataFrame = {
    require(n >= 2, s"span width must be >= 2, got $n")
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val toks = d.select(col("doc_id"),
      posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
    val parts = col("tok") +: (1 until n).map(i => lead(col("tok"), i).over(byPos))
    // grams keyed by START position; short tail windows emit no gram
    val grams = toks
      .select(col("doc_id"), col("pos"), col("tok"),
        when(parts.last.isNotNull, md5(concat_ws(" ", parts: _*))).as("shingle"))
    val dupSet = grams.filter(col("shingle").isNotNull)
      .groupBy(col("shingle"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("shingle"))
    val flagged = grams
      .join(dupSet.withColumn("dup", lit(1)), Seq("shingle"), "left")
      .select(col("doc_id"), col("pos"), col("tok"),
        coalesce(col("dup"), lit(0)).as("dup"))
    val cover = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(n - 1), Window.currentRow)
    flagged
      .withColumn("covered", max(col("dup")).over(cover))
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", transform(
          sort_array(collect_list(when(col("covered") === 0,
            struct(col("pos"), col("tok"))))),
          s => s.getField("tok"))).as("clean_text"),
        count(lit(1)).as("n_tokens"),
        sum(col("covered")).as("n_removed"))
  }

  // `grams` carries every token row (null shingle for tail windows) so the
  // dup join + coverage window + reconstruction all run over ONE exploded
  // relation — re-deriving toks separately would pay the explode twice.

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "span_dedup" -> ((s, dir) =>
      stripDuplicatedSpans(graft.Tables(s, dir, "documents"))))

  /** DuckDB re-derivation: 0-based positions via unnest(range), the same
    * MD5 span digest, EXISTS-over-start-window instead of the running max
    * (equivalent: both test "a duplicated span starts within the last n-1
    * positions"), COALESCE('') for fully-covered documents where
    * string_agg over zero rows is NULL but Spark's concat_ws over an
    * empty array is ''.
    */
  def oracles: Map[String, String] = Map(
    "span_dedup" ->
      s"""WITH base AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
         |  FROM documents WHERE text IS NOT NULL),
         |toks AS (
         |  SELECT doc_id, CAST(unnest(range(0, len(toks))) AS BIGINT) AS pos, toks
         |  FROM base),
         |t AS (
         |  SELECT doc_id, pos, toks[CAST(pos AS INT) + 1] AS tok,
         |    CASE WHEN pos + $SpanN <= len(toks)
         |         THEN md5(array_to_string(toks[CAST(pos AS INT) + 1 : CAST(pos AS INT) + $SpanN], ' '))
         |    END AS shingle
         |  FROM toks),
         |dup AS (
         |  SELECT shingle FROM t WHERE shingle IS NOT NULL
         |  GROUP BY shingle HAVING COUNT(DISTINCT doc_id) >= 2),
         |flagged AS (
         |  SELECT doc_id, pos, tok,
         |    CASE WHEN shingle IN (SELECT shingle FROM dup) THEN 1 ELSE 0 END AS dup
         |  FROM t),
         |covered AS (
         |  SELECT doc_id, pos, tok,
         |    MAX(dup) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN ${SpanN - 1} PRECEDING AND CURRENT ROW) AS covered
         |  FROM flagged)
         |SELECT doc_id,
         |  COALESCE(string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE covered = 0), '') AS clean_text,
         |  COUNT(*) AS n_tokens,
         |  CAST(SUM(covered) AS BIGINT) AS n_removed
         |FROM covered GROUP BY doc_id""".stripMargin)
}
