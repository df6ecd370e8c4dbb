package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence assembly for training pipelines: packing documents into
  * fixed-token-budget training sequences, and chunking long documents into
  * overlapping context windows.
  *
  * Both are pure arithmetic over token counts — no text moves, so the
  * planning step runs at metadata cost and the actual byte shuffling can be
  * done by a later exchange keyed on the computed pack/chunk ids.
  *
  * Scale notes:
  *  - [[sequencePacking]] is the "concatenate then chunk every B tokens"
  *    construction used for pretraining batches: a document's pack span is
  *    a pure function of the running token total before it, i.e. ONE
  *    windowed prefix sum per packing group. Groups (here: language) bound
  *    the sort — a global total order would serialize; per-group order is
  *    the standard compromise and each group sorts in parallel.
  *  - [[chunkSpans]] is embarrassingly parallel (per-row `sequence` +
  *    `explode`).
  */
object Packing {

  /** Assign each document its [start, end] pack ids under `budget` tokens
    * per pack, packing greedily in `orderCol` order within each `groupCol`
    * (concat-then-chunk: a doc may straddle pack boundaries; `offset` is
    * its first-token position inside its first pack).
    */
  def sequencePacking(d: DataFrame, budget: Int,
                      groupCol: String = "lang",
                      orderCol: String = "doc_id"): DataFrame = {
    // fail fast: `div 0` is NULL in non-ANSI Spark — a zero budget would
    // "succeed" with all-NULL pack ids
    require(budget > 0, s"token budget must be positive, got $budget")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // integer `div`, not `/`: the running token total of a 100 TB corpus
    // exceeds double's exact-integer range, and `/` would divide in double
    d.select(col(orderCol), col(groupCol),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("cum_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(orderCol), col(groupCol), col("n_tokens"),
        expr(s"cum_before div $budget").as("pack_start"),
        expr(s"(cum_before + n_tokens - 1) div $budget").as("pack_end"),
        (col("cum_before") % budget).as("offset"))
  }

  /** Overlapping context-window spans of a document: windows of `width`
    * tokens advancing by `width - overlap`; the last window is clipped to
    * the document end. Every document yields at least one span.
    */
  def chunkSpans(d: DataFrame, width: Int, overlap: Int): DataFrame = {
    require(width > overlap && overlap >= 0,
      s"need width > overlap >= 0, got ($width, $overlap)")
    val stride = width - overlap
    // spans = 1 + ceil(max(0, n - width) / stride), in integer arithmetic
    d.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("n_spans",
        lit(1L) + expr(s"greatest(0L, n_tokens - $width + $stride - 1) div $stride"))
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_spans") - 1)).as("span_idx"))
      .select(col("doc_id"), col("span_idx"),
        (col("span_idx") * stride).as("tok_start"),
        least(col("span_idx") * stride + width, col("n_tokens")).as("tok_end"))
  }

  /** Whole-document bin packing (first-fit-decreasing): pack documents into
    * bins of ≤ `budget` tokens WITHOUT splitting any document — the
    * construction for fine-tuning/eval batches where an example must not
    * straddle sequences (the padding-free pretraining form is
    * [[sequencePacking]], which splits). Documents longer than `budget` get
    * a singleton overflow bin (callers chunk those first).
    *
    * FFD is inherently sequential, so it runs per partition via
    * `mapPartitions` (the designed tier-(d) seam: genuine per-partition
    * imperative logic) after hash-partitioning on `groupCol` — a group
    * lives wholly in one partition, so bins never cross groups and each
    * group packs independently in parallel. A bin's id is the doc_id of
    * the document that OPENED it: unique (doc ids are), and — because each
    * group is packed whole after a (tokens desc, doc_id) sort — the entire
    * output is a pure function of the group's contents, independent of
    * partition count or task ids. Packing quality is FFD's
    * ≤ 11/9·OPT + 1 bins per group.
    *
    * Output: (doc_id, group, n_tokens, bin_id, bin_fill) — planning
    * metadata only, like the other packers; no text moves.
    */
  def binPackFFD(d: DataFrame, budget: Int,
                 groupCol: String = "lang"): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val spark = d.sparkSession
    import spark.implicits._
    val par = graft.Tuning.fanout(spark)
    val sized = d.select(col("doc_id").cast("long"), col(groupCol).cast("string"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .repartition(par, col(groupCol))
      .as[(Long, String, Long)]
    sized.mapPartitions { it =>
      val rows = it.toArray
      // (group, tokens desc, id) order → deterministic FFD per group
      val sorted = rows.sortBy { case (id, g, n) => (g, -n, id) }
      // open bins of the CURRENT group only: (opener doc_id, remaining)
      val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var currentGroup: String = null
      val out = sorted.map { case (id, g, n) =>
        if (g != currentGroup) { bins.clear(); currentGroup = g }
        val fit = bins.indexWhere(_._2 >= n)
        val bin =
          if (fit >= 0) { val (b, rem) = bins(fit); bins(fit) = (b, rem - n); b }
          else { bins += ((id, budget - n)); id }
        (id, g, n, bin)
      }
      // second pass: per-bin fill totals (bins are partition-local)
      val fill = out.groupBy(_._4).map { case (b, xs) => b -> xs.map(_._3).sum }
      out.iterator.map { case (id, g, n, b) => (id, g, n, b, fill(b)) }
    }.toDF("doc_id", groupCol, "n_tokens", "bin_id", "bin_fill")
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "documents")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // pack documents into 512-token training sequences per language
    "pack_sequences" -> ((s, dir) =>
      sequencePacking(docs(s, dir), budget = 512)),
    // 128-token context windows with 32-token overlap
    "pack_chunk_spans" -> ((s, dir) =>
      chunkSpans(docs(s, dir), width = 128, overlap = 32)),
    // whole-document FFD bins (no oracle: FFD is not SQL-expressible;
    // deterministic output — budget/isolation/determinism spec-pinned)
    "pack_bins_ffd" -> ((s, dir) => binPackFFD(docs(s, dir), budget = 512))
  )

  def oracles: Map[String, String] = Map(
    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT)
        |      AS cum_before
        |  FROM t)
        |SELECT doc_id, lang, n_tokens,
        |  cum_before // 512 AS pack_start,
        |  (cum_before + n_tokens - 1) // 512 AS pack_end,
        |  cum_before % 512 AS offset
        |FROM c""".stripMargin,
    "pack_chunk_spans" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_tokens,
        |    1 + GREATEST(0, n_tokens - 128 + 96 - 1) // 96 AS n_spans
        |  FROM t)
        |SELECT doc_id, CAST(u.i AS BIGINT) AS span_idx,
        |  CAST(u.i * 96 AS BIGINT) AS tok_start,
        |  CAST(LEAST(u.i * 96 + 128, n_tokens) AS BIGINT) AS tok_end
        |FROM s, unnest(range(0, CAST(n_spans AS BIGINT))) AS u(i)""".stripMargin
  )
}
