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

  /** Inverse of [[chunkSpans]] — reassemble a document from its overlapping
    * context windows and verify the round trip. Each span's NEW content is
    * its tail beyond the previous span's end (`tok_start + overlap`,
    * clipped); concatenating new contents in span order must reproduce the
    * whitespace-normalized original. Emitting the per-document `match` flag
    * makes the lossless-chunking property itself the gated result — the
    * check a pipeline runs before it trusts chunked storage as the only
    * copy of the corpus.
    *
    * One explode-join-regroup per doc; the regroup rides the same doc_id
    * partitioning as the spans, and pieces where a clipped window adds no
    * new tokens are dropped BEFORE concat (`concat_ws` does not skip empty
    * strings — a zero-width piece would inject a double space).
    */
  def reassembleChunks(d: DataFrame, width: Int, overlap: Int): DataFrame = {
    val spans = chunkSpans(d, width, overlap)
    val toks = d.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    spans.join(toks, Seq("doc_id"))
      .withColumn("new_start",
        when(col("span_idx") === 0, lit(0L))
          .otherwise(least(col("tok_start") + overlap, col("tok_end"))))
      .filter(col("tok_end") > col("new_start"))
      .withColumn("piece", concat_ws(" ",
        slice(col("toks"), (col("new_start") + 1).cast("int"),
          (col("tok_end") - col("new_start")).cast("int"))))
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ", transform(
        sort_array(collect_list(struct(col("span_idx"), col("piece")))),
        s => s.getField("piece"))).as("rebuilt"))
      .join(d.select(col("doc_id"),
        concat_ws(" ", TextAnalysis.tokens(col("text"))).as("norm")), Seq("doc_id"))
      .select(col("doc_id"), (col("rebuilt") === col("norm")).as("is_match"))
  }

  /** Sentinel grouping key for a null group value — keeps null-group docs
    * packing together without NPEing String comparisons; the ORIGINAL
    * (possibly null) group value is what the output carries.
    */
  private val NullGroupKey = "\u0000<null-group>"

  /** Sub-group assignment for [[binPackFFD]]: documents of groups whose
    * total token mass exceeds `maxSubGroupTokens` are salted into
    * `ceil(group_tokens / maxSubGroupTokens)` sub-groups by a content hash
    * of `doc_id` — so one task never has to hold more than ~one sub-group
    * of metadata, no matter how dominant a group is. The assignment is
    * content-derived (group totals + doc_id hash), NOT partition-derived,
    * so the final packing is a pure function of the data.
    *
    * Package-visible so the spec can pin that a dominant group genuinely
    * fans out across sub-groups.
    */
  private[graft] def ffdSubGroups(d: DataFrame, groupCol: String,
                                  maxSubGroupTokens: Long): DataFrame = {
    val sized = d.select(col("doc_id").cast("long").as("doc_id"),
        col(groupCol).cast("string").as("grp"),
        // null text packs as a zero-token doc, not a null that breaks the
        // non-nullable Long encoder downstream
        coalesce(TextAnalysis.tokenCount(col("text")).cast("long"), lit(0L))
          .as("n_tokens"))
      .withColumn("gkey", coalesce(col("grp"), lit(NullGroupKey)))
    // per-group token totals: one partial-aggregated shuffle of a frame with
    // one row per GROUP (languages, tenants — small by nature), broadcast
    // back onto the corpus-sized side
    val totals = sized.groupBy(col("gkey"))
      .agg(sum(col("n_tokens")).as("grp_tokens"))
    sized.join(broadcast(totals), Seq("gkey"))
      .withColumn("nsub", greatest(lit(1L),
        expr(s"(grp_tokens + ${maxSubGroupTokens - 1}) div $maxSubGroupTokens")))
      .withColumn("sub", pmod(xxhash64(col("doc_id")), col("nsub")).cast("int"))
      .select(col("doc_id"), col("grp"), col("n_tokens"), col("gkey"), col("sub"))
  }

  /** Whole-document bin packing (first-fit-decreasing): pack documents into
    * bins of ≤ `budget` tokens WITHOUT splitting any document — the
    * construction for fine-tuning/eval batches where an example must not
    * straddle sequences (the padding-free pretraining form is
    * [[sequencePacking]], which splits). Documents longer than `budget` get
    * a singleton overflow bin (callers chunk those first).
    *
    * FFD is inherently sequential, so each (group, sub-group) packs as one
    * imperative unit (the designed tier-(d) seam) inside
    * `groupByKey.flatMapGroups`. Per-task memory is bounded BY CONSTRUCTION:
    * [[ffdSubGroups]] caps a sub-group at ~`maxSubGroupTokens` of token
    * mass, so a dominant group (at a 100 TB corpus, "en" IS most of the
    * data) fans out across ceil(group_tokens / cap) independent units
    * instead of materializing in one task, and the group sort behind
    * `flatMapGroups` is Spark's spill-safe shuffle sort, not an in-memory
    * array of the partition.
    *
    * A bin's id is the doc_id of the document that OPENED it: unique (doc
    * ids are, and bins never cross sub-groups), and — because each sub-group
    * is packed whole after a (tokens desc, doc_id) sort, and sub-group
    * assignment is content-derived — the entire output is a pure function
    * of the data, independent of partition count or task ids. Packing
    * quality is FFD's ≤ 11/9·OPT + 1 bins per sub-group; sub-grouping
    * degrades quality gracefully (the bound applies per sub-group, and the
    * salt spreads sizes uniformly).
    *
    * Output: (doc_id, group, n_tokens, bin_id, bin_fill) — planning
    * metadata only, like the other packers; no text moves.
    */
  def binPackFFD(d: DataFrame, budget: Int,
                 groupCol: String = "lang",
                 maxSubGroupTokens: Long = 512L * 1024 * 1024): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(maxSubGroupTokens >= budget,
      s"sub-group cap $maxSubGroupTokens below bin budget $budget")
    val spark = d.sparkSession
    import spark.implicits._
    ffdSubGroups(d, groupCol, maxSubGroupTokens)
      .as[(Long, String, Long, String, Int)]
      .groupByKey { case (_, _, _, gkey, sub) => (gkey, sub) }
      .flatMapGroups { (_: (String, Int), it: Iterator[(Long, String, Long, String, Int)]) =>
        // one sub-group: ≤ ~maxSubGroupTokens of (id, grp, tokens) tuples
        val rows = it.map { case (id, g, n, _, _) => (id, g, n) }.toArray
        // (tokens desc, id) order → deterministic FFD per sub-group
        val sorted = rows.sortBy { case (id, _, n) => (-n, id) }
        // open bins: (opener doc_id, remaining)
        val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        val out = sorted.map { case (id, g, n) =>
          val fit = bins.indexWhere(_._2 >= n)
          val bin =
            if (fit >= 0) { val (b, rem) = bins(fit); bins(fit) = (b, rem - n); b }
            else { bins += ((id, budget - n)); id }
          (id, g, n, bin)
        }
        // second pass: per-bin fill totals (bins are sub-group-local)
        val fill = out.groupBy(_._4).map { case (b, xs) => b -> xs.map(_._3).sum }
        out.iterator.map { case (id, g, n, b) => (id, g, n, b, fill(b)) }
      }.toDF("doc_id", groupCol, "n_tokens", "bin_id", "bin_fill")
  }

  /** The SQL-expressible face of [[binPackFFD]] — per-group conservation
    * totals plus invariant-violation counters, all provably zero when the
    * packing is correct. FFD itself isn't SQL-expressible, but this IS
    * hash-comparable against an oracle that derives the same row from the
    * raw `documents` table and constant zeros: the conservation columns
    * (doc count, token mass) check that packing neither drops, duplicates,
    * nor re-weighs documents, and any violated invariant (an over-budget
    * multi-doc bin, a bin not named after a member, a `bin_fill` that
    * disagrees with the actual member sum, a doc in two bins) turns a zero
    * nonzero and fails the hash gate.
    */
  def binPackFFDInvariants(d: DataFrame, budget: Int,
                           groupCol: String = "lang",
                           maxSubGroupTokens: Long = 512L * 1024 * 1024,
                           checkBudget: Int = -1): DataFrame = {
    // `checkBudget` defaults to `budget` (packing and contract share the
    // bar); setting it below the packer's simulates a packer that honored
    // the wrong budget — the non-vacuity spec uses it to prove
    // `overfull_bins` is computed, not a constant
    val ckB = if (checkBudget < 0) budget else checkBudget
    val packed = binPackFFD(d, budget, groupCol, maxSubGroupTokens)
    val perBin = packed.groupBy(col(groupCol), col("bin_id")).agg(
      sum(col("n_tokens")).as("fill_calc"),
      min(col("bin_fill")).as("fill_min"),
      max(col("bin_fill")).as("fill_max"),
      count(lit(1)).as("bin_docs"),
      sum(when(col("doc_id") === col("bin_id"), 1L).otherwise(0L)).as("openers"))
    perBin.groupBy(col(groupCol)).agg(
      sum(col("bin_docs")).as("n_docs"),
      sum(col("fill_calc")).as("total_tokens"),
      // a bin over budget with >1 doc (singleton overflow bins are designed)
      sum(when(col("fill_calc") > ckB && col("bin_docs") > 1, 1L)
        .otherwise(0L)).as("overfull_bins"),
      // every bin is named after exactly one of its own members
      sum(when(col("openers") =!= 1L, 1L).otherwise(0L)).as("openerless_bins"),
      // reported bin_fill agrees with the recomputed member sum, for every row
      sum(when(col("fill_min") =!= col("fill_calc") ||
        col("fill_max") =!= col("fill_calc"), 1L).otherwise(0L))
        .as("fill_mismatch_bins"))
      .join(
        // doc-level conservation: no document in two bins. Null-safe join
        // key — a null group is a legal group and must not drop here while
        // the oracle's GROUP BY keeps it.
        packed.groupBy(col(groupCol).as("_g2")).agg(
          (count(lit(1)) - countDistinct(col("doc_id"))).as("dup_docs")),
        col(groupCol) <=> col("_g2"), "inner")
      .select(col(groupCol), col("n_docs"), col("total_tokens"),
        col("overfull_bins"), col("openerless_bins"),
        col("fill_mismatch_bins"), col("dup_docs"))
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
    // lossless-chunking proof: reassembled spans == normalized original,
    // per document (32/8 so the ~40-token docs genuinely multi-span)
    "pack_reassemble" -> ((s, dir) =>
      reassembleChunks(docs(s, dir), width = 32, overlap = 8)),
    // whole-document FFD bins (no oracle: FFD is not SQL-expressible;
    // deterministic output — budget/isolation/determinism spec-pinned)
    "pack_bins_ffd" -> ((s, dir) => binPackFFD(docs(s, dir), budget = 512)),
    // the FFD semantic gate: conservation totals + invariant-violation
    // counters, hash-compared against an oracle that derives the same row
    // from raw `documents` — any packing bug turns a zero nonzero
    "pack_bins_ffd_check" -> ((s, dir) =>
      binPackFFDInvariants(docs(s, dir), budget = 512))
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
    "pack_reassemble" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, toks, n,
        |    CAST(unnest(range(0, 1 + (GREATEST(0, n - 32) + 23) // 24)) AS BIGINT) AS i
        |  FROM t),
        |p AS (
        |  SELECT doc_id, toks, i,
        |    LEAST(i * 24 + 32, n) AS tok_end,
        |    CASE WHEN i = 0 THEN 0
        |         ELSE LEAST(i * 24 + 8, LEAST(i * 24 + 32, n)) END AS new_start
        |  FROM s),
        |pieces AS (
        |  SELECT doc_id, i,
        |    array_to_string(toks[CAST(new_start AS INT) + 1 : CAST(tok_end AS INT)], ' ') AS piece
        |  FROM p WHERE tok_end > new_start),
        |r AS (
        |  SELECT doc_id, string_agg(piece, ' ' ORDER BY i) AS rebuilt
        |  FROM pieces GROUP BY doc_id)
        |SELECT r.doc_id, (r.rebuilt = array_to_string(t.toks, ' ')) AS is_match
        |FROM r JOIN t USING (doc_id)""".stripMargin,
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
        |FROM s, unnest(range(0, CAST(n_spans AS BIGINT))) AS u(i)""".stripMargin,
    // the invariant-violation counters are constants here BY DESIGN: DuckDB
    // cannot run FFD, but it can independently derive the conservation
    // columns (doc count, token mass per group) and assert the violation
    // counters are zero — a Spark-side packing bug (dropped/duplicated doc,
    // over-budget bin, wrong fill, foreign opener) breaks the hash match
    "pack_bins_ffd_check" ->
      """SELECT lang,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(COALESCE(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT), 0))
        |    AS BIGINT) AS total_tokens,
        |  CAST(0 AS BIGINT) AS overfull_bins,
        |  CAST(0 AS BIGINT) AS openerless_bins,
        |  CAST(0 AS BIGINT) AS fill_mismatch_bins,
        |  CAST(0 AS BIGINT) AS dup_docs
        |FROM documents GROUP BY lang""".stripMargin
  )
}
