package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the data-ops primitive behind reproducible
  * training sets: given two versions of a corpus, report exactly which
  * documents were added, removed, or changed (by normalized-content
  * fingerprint, so whitespace-only churn is invisible — the same identity
  * [[Dedup]] uses). Re-ingesting a refreshed crawl and diffing against the
  * previous snapshot is how a pipeline decides what to re-process and how
  * an audit ties a trained model back to its data.
  *
  * Scale shape: each side collapses to (doc_id, 16-byte fingerprint) in a
  * per-row projection before anything moves; the full-outer join shuffles
  * those fingerprint pairs once on doc_id, and the output is delta-sized —
  * unchanged documents (the overwhelming majority between adjacent
  * snapshots) are dropped before the sink. At 100 TB the network cost is
  * two id+digest streams, never text.
  */
object Versioning {

  /** Delta rows between two corpus versions: (doc_id, status) with status
    * ∈ added | removed | changed. Text is fingerprinted with
    * [[TextAnalysis.fingerprint]]; null-text rows fingerprint to null and
    * compare via null-safe equality (a doc whose text became null IS a
    * change).
    */
  def corpusDiff(oldV: DataFrame, newV: DataFrame): DataFrame = {
    val o = oldV.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp_old"),
      lit(true).as("in_old"))
    val n = newV.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp_new"),
      lit(true).as("in_new"))
    o.join(n, Seq("doc_id"), "full")
      .select(col("doc_id"),
        when(coalesce(col("in_old"), lit(false)) === false, "added")
          .when(coalesce(col("in_new"), lit(false)) === false, "removed")
          .when(!(col("fp_old") <=> col("fp_new")), "changed")
          .otherwise("unchanged").as("status"))
      .filter(col("status") =!= "unchanged")
  }

  /** Delta WITH payload — the materialized artifact [[applyDiff]] consumes:
    * [[corpusDiff]]'s (doc_id, status) rows plus the NEW-side row content
    * for added/changed documents (data columns null on removed rows).
    *
    * Scale shape: statuses come from the digest-only diff; payload text is
    * then fetched by an id join against the delta-sized status set — AQE
    * broadcasts the small side, so corpus text is read once and never
    * shuffles. Between adjacent snapshots the delta is a sliver of the
    * corpus; the expensive side stays a scan.
    */
  def corpusDiffRows(oldV: DataFrame, newV: DataFrame): DataFrame = {
    val dataCols = newV.columns.toSeq.filterNot(_ == "doc_id")
    val d = corpusDiff(oldV, newV)
    val payload = newV.join(d.filter(col("status") =!= "removed"), Seq("doc_id"))
      .select(col("doc_id") +: col("status") +: dataCols.map(col): _*)
    val removed = d.filter(col("status") === "removed")
      .select(col("doc_id") +: col("status") +: dataCols.map(c =>
        lit(null).cast(newV.schema(c).dataType).as(c)): _*)
    payload.unionByName(removed)
  }

  /** Inverse of [[corpusDiffRows]]: reconstruct the new snapshot from the
    * old one plus a delta — the incremental-snapshot primitive that lets a
    * pipeline store full corpora sparsely (one base + small deltas) and
    * re-materialize any version. `applyDiff(v1, corpusDiffRows(v1, v2)) ≡
    * v2` exactly (oracle- and spec-pinned).
    *
    * Scale shape: untouched documents pass through an anti-join against the
    * delta-sized id set (broadcast under AQE — the corpus never shuffles);
    * added/changed rows stream in from the delta by union. One scan of
    * each input, no wide exchange.
    */
  def applyDiff(oldV: DataFrame, delta: DataFrame): DataFrame = {
    val kept = oldV.join(delta.select("doc_id"), Seq("doc_id"), "left_anti")
    val incoming = delta.filter(col("status") =!= "removed").drop("status")
    kept.unionByName(incoming.select(oldV.columns.toSeq.map(col): _*))
  }

  /** The battery's simulated version pair, derived from doc_id so the
    * oracle re-creates both sides bit-for-bit: v1 lacks the %13==0 docs
    * (→ added), v2 revises the text of %11==0 docs (→ changed; %11∩%13
    * docs are added, not changed — they have no v1 row to differ from),
    * and v1's %17==4 docs are absent from v2 (→ removed).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_diff" -> ((s, dir) => {
      val d = graft.Tables(s, dir, "documents")
      val v1 = d.filter(col("doc_id") % 13 =!= 0)
      val v2 = d.filter(col("doc_id") % 17 =!= 4)
        .withColumn("text",
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
      corpusDiff(v1, v2)
    }),

    // snapshot round trip: v2 rebuilt from v1 + the payload delta must be
    // v2 itself — the oracle constructs v2 directly, so any drift in diff,
    // payload fetch, or apply breaks the hash
    "corpus_diff_apply" -> ((s, dir) => {
      val d = graft.Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val v1 = d.filter(col("doc_id") % 13 =!= 0)
      val v2 = d.filter(col("doc_id") % 17 =!= 4)
        .withColumn("text",
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
      applyDiff(v1, corpusDiffRows(v1, v2))
    }))

  def oracles: Map[String, String] = Map(
    "corpus_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id, MD5(LOWER(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents WHERE doc_id % 13 <> 0),
        |v2 AS (
        |  SELECT doc_id, MD5(LOWER(regexp_replace(trim(
        |      CASE WHEN doc_id % 11 = 0 THEN text || ' rev2' ELSE text END
        |    ), '\s+', ' ', 'g'))) AS fp
        |  FROM documents WHERE doc_id % 17 <> 4),
        |j AS (
        |  SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
        |    CASE WHEN v1.doc_id IS NULL THEN 'added'
        |         WHEN v2.doc_id IS NULL THEN 'removed'
        |         WHEN v1.fp IS DISTINCT FROM v2.fp THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT doc_id, status FROM j WHERE status <> 'unchanged'""".stripMargin,
    "corpus_diff_apply" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 0 THEN text || ' rev2' ELSE text END AS text
        |FROM documents WHERE doc_id % 17 <> 4""".stripMargin)
}
