package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually ships: exact-dedup survivors → quality floor → language filter
  * → deterministic split assignment, as ONE dataflow gated by ONE oracle
  * (the training-data analog of the composed EDGAR fact: the per-operator
  * gates prove the pieces, this proves their interaction).
  *
  * Scale shape: one fingerprint aggregation (shuffles 128-bit hashes +
  * ids), one join back to the corpus on the unique survivor id, then pure
  * per-row column math (quality, lang-ID, md5 split) — no second shuffle.
  */
object Curation {

  /** Curated corpus: one surviving row per distinct normalized content
    * (min doc_id wins), kept only if `quality ≥ minQuality` and the
    * language guess matches, with the md5 train/val/test assignment
    * attached. Output: (doc_id, quality, split).
    */
  def curateCorpus(d: DataFrame, minQuality: Double, lang: String): DataFrame = {
    val survivors = d
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    d.join(survivors, Seq("doc_id"))
      .select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.langGuess(col("text")).as("lang_guess"),
        Sampling.hashSplit(col("doc_id")).as("split"))
      .filter(col("quality") >= minQuality && col("lang_guess") === lang)
      .select(col("doc_id"), col("quality"), col("split"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curate_corpus" -> ((s, dir) =>
      curateCorpus(graft.Tables(s, dir, "documents"),
        minQuality = 0.5, lang = "en"))
  )

  /** DuckDB transliteration — each sub-formula is the one already validated
    * by its per-operator oracle (fingerprint, quality, lang-ID, hash split).
    */
  def oracles: Map[String, String] = Map(
    "curate_corpus" ->
      """WITH surv AS (
        |  SELECT MIN(doc_id) AS doc_id
        |  FROM documents
        |  GROUP BY MD5(LOWER(regexp_replace(trim(text), '\s+', ' ', 'g')))),
        |scored AS (
        |  SELECT d.doc_id,
        |    len(string_split_regex(trim(d.text), '\s+')) AS n_tokens,
        |    len(list_filter(string_split_regex(trim(d.text), '\s+'),
        |        x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x))) AS n_stop,
        |    len(list_filter(string_split_regex(trim(d.text), '\s+'),
        |        x -> list_contains(['the','and','of','is','with','that'], x))) AS s_en,
        |    len(list_filter(string_split_regex(trim(d.text), '\s+'),
        |        x -> list_contains(['der','die','das','und','ist','nicht'], x))) AS s_de,
        |    len(list_filter(string_split_regex(trim(d.text), '\s+'),
        |        x -> list_contains(['le','les','une','est','dans','pour'], x))) AS s_fr,
        |    len(list_filter(string_split_regex(trim(d.text), '\s+'),
        |        x -> list_contains(['el','los','las','es','por','como'], x))) AS s_es
        |  FROM documents d JOIN surv USING (doc_id)),
        |q AS (
        |  SELECT doc_id,
        |    ROUND(LEAST(1.0, n_tokens / 50.0) *
        |          (1.0 - 0.5 * (CAST(n_stop AS DOUBLE) / n_tokens)), 4) AS quality,
        |    CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        |         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        |         WHEN s_fr >= s_es THEN 'fr'
        |         ELSE 'es' END AS lang_guess
        |  FROM scored)
        |SELECT doc_id, quality,
        |  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100 < 80 THEN 'train'
        |       WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM q
        |WHERE quality >= 0.5 AND lang_guess = 'en'""".stripMargin
  )
}
