package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus composition operators — deciding WHICH rows a training run sees
  * and in WHAT order, deterministically: temperature-weighted source
  * rebalance (the multilingual up/down-sampling rule), token-budget
  * selection by quality, and shard assignment for the final training
  * layout. All three follow the [[Sampling]] contract: membership and
  * order are pure functions of stable keys (md5), never `rand()`, so the
  * same corpus yields the same mixture on every engine and every rerun.
  */
object Mixing {

  /** Bucket resolution for rate → threshold quantization (1 bp). */
  private val RateBuckets = 10000

  /** Temperature-weighted rebalance across strata (α = 1/2): stratum s with
    * n_s rows gets target share ∝ √n_s — the standard multilingual mixing
    * rule that up-weights rare strata without letting a dominant one drown
    * the mixture. `targetFrac` sets the overall kept fraction; a stratum
    * whose target exceeds its size is kept whole (rate capped at 1).
    *
    * α is fixed at 1/2 on purpose: √ is correctly rounded under IEEE-754 so
    * the per-stratum thresholds are bit-identical in every engine, which
    * keeps row membership oracle-checkable (`pow(n, α)` for general α is
    * only faithfully rounded and may differ across libm builds).
    *
    * Scale shape: one stratum-level aggregate (rows = #strata, not #docs),
    * threshold math on that tiny frame, broadcast join back, then the same
    * codegen'd md5-bucket filter as [[Sampling.stratifiedSample]]. One
    * corpus shuffle total (the count), and that one is metadata-sized.
    */
  def temperatureMix(d: DataFrame, stratumCol: String, keyCol: String,
                     targetFrac: Double = 0.5): DataFrame = {
    val counts = d.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_s"))
    // whole-frame totals over the #strata-row aggregate; the single-partition
    // window is deliberate — its input is stratum-level, never corpus-level
    val whole = Window.partitionBy()
    val rates = counts
      .withColumn("n_total", sum(col("n_s")).over(whole))
      // Σ√n_s in DECIMAL after round-to-6dp (the embedOutliers contract):
      // a raw double window sum depends on partition/evaluation order, and
      // floor(rate·10⁴) can flip membership at a bucket boundary on a
      // last-bit difference. The decimal sum is exact and order-independent;
      // it re-enters the double math via one deterministic decimal→double
      // conversion.
      .withColumn("sqrt_sum",
        sum(round(sqrt(col("n_s")), 6).cast("decimal(28,6)")).over(whole)
          .cast("double"))
      // parenthesization is part of the contract: the oracle repeats it
      // verbatim so every double op happens in the same order
      .withColumn("rate", least(lit(1.0),
        lit(targetFrac) * col("n_total") * sqrt(col("n_s")) /
          col("sqrt_sum") / col("n_s")))
      .withColumn("thr", floor(col("rate") * RateBuckets).cast("long"))
      .select(col(stratumCol), col("thr"))
    d.join(broadcast(rates), Seq(stratumCol))
      .filter(Sampling.hashBucket(col(keyCol), RateBuckets) < col("thr"))
  }

  /** Greedy token-budget selection: documents ranked by (quality desc,
    * doc_id asc) are admitted while the running token total stays within
    * `budget` — "take the best B tokens", the last gate before training.
    *
    * NOT a global sort: a cumulative window over (quality desc) of the
    * whole corpus would funnel 100 TB through one partition. Instead the
    * prefix sum splits into (1) a quality-bucket aggregate (rows = #distinct
    * quality values — qualityScore is rounded to 4 decimals, so bounded),
    * (2) a running total over that tiny frame, (3) a per-bucket cumulative
    * window partitioned by quality, which spreads buckets across the
    * cluster. Identical admission set to the naive global window.
    */
  def selectByTokenBudget(d: DataFrame, budget: Long): DataFrame =
    selectByTokenBudgetScored(
      d.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
      budget)

  /** [[selectByTokenBudget]] over an externally-scored frame
    * (doc_id, quality, n_tokens) — the seam that makes the budget
    * TOKENIZER-accurate: a training run budgets in its tokenizer's tokens
    * (e.g. [[Bpe.encode]]'s subword counts), not whitespace words. Same
    * bucket-prefix-sum shape, same admission semantics.
    */
  def selectByTokenBudgetScored(scored: DataFrame, budget: Long): DataFrame = {
    val buckets = scored.groupBy(col("quality"))
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
    val before = Window.orderBy(col("quality").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = buckets
      .withColumn("cum_before", coalesce(sum(col("bucket_tokens")).over(before), lit(0L)))
      .select(col("quality"), col("cum_before"))
    val within = Window.partitionBy(col("quality")).orderBy(col("doc_id"))
    scored.join(broadcast(cum), Seq("quality"))
      .withColumn("cum_tokens", col("cum_before") + sum(col("n_tokens")).over(within))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("quality"), col("n_tokens"), col("cum_tokens"))
  }

  /** Deterministic training-shard layout: shard = md5-bucket of the key
    * (so shards are balanced and membership is portable), position within
    * the shard = rank by md5 of the key — a pseudo-random global shuffle
    * of the corpus WITHOUT a global sort: each shard orders independently
    * in parallel, and concatenating shards in (shard, pos) order is the
    * epoch order a trainer reads.
    */
  def shardAssign(d: DataFrame, keyCol: String, shards: Int = 16): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(keyCol))
    d.select(col(keyCol),
        Sampling.hashBucket(col(keyCol), shards).as("shard"),
        md5(col(keyCol).cast("string")).as("h"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(keyCol), col("shard"), col("pos"))
  }

  /** CCNet-style per-stratum quality tiers: within each stratum (source,
    * domain, language), rank documents by quality and split into `nTiles`
    * equal tiers — head/middle/tail for the default 3. CCNet keeps "head"
    * for LM training and drops or down-weights "tail"; tiering WITHIN the
    * stratum (not globally) is the point — it prevents a high-resource
    * source's mediocre documents from outranking a rare source's best.
    *
    * One window shuffle partitioned by stratum; ties break on doc_id so
    * tier membership is deterministic. `ntile` follows the SQL-standard
    * fill rule (leading tiles take the remainder) on every engine.
    */
  def qualityBuckets(d: DataFrame, stratumCol: String,
                     nTiles: Int = 3): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("quality").desc, col("doc_id"))
    d.select(col("doc_id"), col(stratumCol),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .withColumn("tile", ntile(nTiles).over(w).cast("long"))
      .withColumn("tier",
        when(col("tile") === 1, "head")
          .when(col("tile") === nTiles, "tail")
          .otherwise("middle"))
  }

  /** Per-source dominance cap: keep at most `cap` documents from each
    * source, preferring quality — the rule that stops one crawl domain from
    * drowning the mixture while still taking its best pages. Selection order
    * within a source is (quality desc, md5(key), key): the md5 tiebreak
    * spreads equal-quality survivors pseudo-randomly instead of
    * systematically favoring low ids.
    *
    * NOT one window over the whole source: a dominant domain at 100 TB would
    * funnel its entire row set through a single sort partition. Same
    * decomposition as [[selectByTokenBudget]]: (1) a (source, quality)
    * bucket aggregate (quality is round-4, so ≤ 10⁴ buckets per source),
    * (2) a running count over that tiny frame, (3) a per-(source, quality)
    * rank, which spreads the sort across the cluster. Admission set is
    * identical to the naive per-source window.
    */
  def domainCap(d: DataFrame, sourceCol: String, keyCol: String,
                cap: Int): DataFrame = {
    val scored = d.select(col(keyCol), col(sourceCol),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      md5(col(keyCol).cast("string")).as("h"))
    val buckets = scored.groupBy(col(sourceCol), col("quality"))
      .agg(count(lit(1)).as("bucket_n"))
    val before = Window.partitionBy(col(sourceCol))
      .orderBy(col("quality").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = buckets
      .withColumn("cum_before", coalesce(sum(col("bucket_n")).over(before), lit(0L)))
      .select(col(sourceCol), col("quality"), col("cum_before"))
    val within = Window.partitionBy(col(sourceCol), col("quality"))
      .orderBy(col("h"), col(keyCol))
    scored.join(broadcast(cum), Seq(sourceCol, "quality"))
      .withColumn("rk", col("cum_before") + row_number().over(within))
      .filter(col("rk") <= cap)
      .select(col(keyCol), col(sourceCol), col("quality"), col("rk"))
  }

  /** Global deterministic epoch order: every document gets a unique position
    * in [1, N] ranked by md5(epoch ‖ key) — the full-corpus shuffle a trainer
    * replays per epoch (a new epoch seed re-permutes without re-shuffling
    * any data: position is a pure function of (epoch, key)).
    *
    * [[shardAssign]] gives shard-local order; this gives the single TOTAL
    * order across shards — without the global single-partition sort that
    * `ROW_NUMBER() OVER (ORDER BY h)` would plan. Two-phase rank: the first
    * byte of the digest buckets rows into 256 ranges that partition the hash
    * order; per-bucket counts (256 rows) prefix-sum into bucket offsets and
    * broadcast back; each bucket then ranks locally by the full digest and
    * adds its offset. Positions are exactly the global ranks, but the only
    * corpus-wide movement is one 256-way hash exchange that every node
    * sorts in parallel.
    */
  def epochOrder(d: DataFrame, keyCol: String, epoch: Int): DataFrame = {
    val h = md5(concat(lit(s"$epoch:"), col(keyCol).cast("string")))
    val keyed = d.select(col(keyCol), h.as("h"),
      conv(substring(h, 1, 2), 16, 10).cast("int").as("hb"))
    val counts = keyed.groupBy(col("hb")).agg(count(lit(1)).as("n"))
    // 256-row frame: the single-partition window is deliberate (same
    // bucket-level idiom as temperatureMix / selectByTokenBudget)
    val before = Window.orderBy(col("hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("off", coalesce(sum(col("n")).over(before), lit(0L)))
      .select(col("hb"), col("off"))
    val within = Window.partitionBy(col("hb")).orderBy(col("h"), col(keyCol))
    keyed.join(broadcast(offsets), Seq("hb"))
      .withColumn("pos", col("off") + row_number().over(within))
      .select(col(keyCol), col("pos"))
  }

  /** Epoch-weighted upsampling — MATERIALIZE a mixing recipe's per-source
    * epoch weights into the actual training multiset. [[temperatureMix]] and
    * [[selectByTokenBudget]] decide RATES; published data recipes
    * (Gopher/LLaMA-style source tables) then weight a high-quality source at
    * e.g. 2.3 epochs, which means every one of its documents appears twice
    * and a deterministic 30% of them a third time. Weights below 1 fall out
    * of the same rule as plain downsampling (0.4 ⇒ 40% of docs kept once) —
    * one operator covers both directions of the recipe.
    *
    * Each output row carries `copy_id` (1..n, dense) so downstream shard
    * layout and epoch ordering treat copies as distinct rows; the fractional
    * copy reuses the importance-sample decision rule (md5 bucket <
    * round(frac × 10⁴) — see [[Sampling.importanceSample]] for why `round`),
    * so membership is a pure function of (key, weight map) and identical in
    * DuckDB.
    *
    * Scale: a flat projection + `explode(sequence)` — NO shuffle, no driver
    * state; the weight map folds into one codegen'd CASE. The explode's fan-
    * out is the recipe's own epoch multiplier, i.e. exactly the bytes a
    * trainer is asking to read.
    */
  def repeatExpand(d: DataFrame, keyCol: String, stratumCol: String,
                   epochs: Map[String, Double],
                   defaultEpochs: Double = 1.0): DataFrame = {
    // the operator writes these two columns; silently replacing a caller's
    // same-named column (e.g. a frame already expanded once) would be data
    // loss with no error — fail loudly instead
    require(!d.columns.contains("n_copies") && !d.columns.contains("copy_id"),
      "repeatExpand emits n_copies/copy_id; rename the input's columns first")
    val stratum = col(stratumCol)
    val w = epochs.foldLeft(lit(defaultEpochs)) { case (acc, (k, v)) =>
      when(stratum === lit(k), lit(v)).otherwise(acc)
    }
    val frac = w - floor(w)
    val extra = when(
      Sampling.hashBucket(col(keyCol), RateBuckets) <
        round(frac * RateBuckets).cast("long"), 1L).otherwise(0L)
    val n = floor(w).cast("long") + extra
    d.withColumn("n_copies", n)
      .filter(col("n_copies") >= 1L)
      .withColumn("copy_id", explode(sequence(lit(1L), col("n_copies"))))
      .drop("n_copies")
  }

  private val MixTargetFrac = 0.5
  private val TokenBudget = 8000L
  private val Shards = 16
  private val DomainCapN = 40
  private val EpochSeed = 3
  private val RepeatEpochs = Map("src0" -> 2.3, "src1" -> 0.4)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // α=1/2 rebalance over the skewed lang distribution — row-level output
    // so the oracle checks every membership decision
    "mix_temperature" -> ((s, dir) =>
      temperatureMix(graft.Tables(s, dir, "documents"),
        stratumCol = "lang", keyCol = "doc_id", targetFrac = MixTargetFrac)
        .select(col("doc_id"), col("lang"))),

    "budget_select" -> ((s, dir) =>
      selectByTokenBudget(graft.Tables(s, dir, "documents"), TokenBudget)),

    "shard_assign" -> ((s, dir) =>
      shardAssign(graft.Tables(s, dir, "documents"), keyCol = "doc_id",
        shards = Shards)),

    "quality_buckets" -> ((s, dir) =>
      qualityBuckets(graft.Tables(s, dir, "documents"), stratumCol = "source")),

    // per-source dominance cap: at most 40 docs per source, best quality
    // first — row-level output so the oracle checks every admission
    "mix_domain_cap" -> ((s, dir) =>
      domainCap(graft.Tables(s, dir, "documents"), sourceCol = "source",
        keyCol = "doc_id", cap = DomainCapN)),

    // global deterministic epoch order (two-phase rank — no global sort);
    // oracle recomputes the naive global ROW_NUMBER and must agree exactly
    "mix_epoch_order" -> ((s, dir) =>
      epochOrder(graft.Tables(s, dir, "documents"), keyCol = "doc_id",
        epoch = EpochSeed)),

    // epoch-weighted upsampling: src0 at 2.3 epochs (every doc ×2, a
    // deterministic 30% ×3), src1 at 0.4 (40% kept once), the rest at 1 —
    // row-level multiset output so the oracle checks every copy decision
    "mix_repeat_epochs" -> ((s, dir) =>
      repeatExpand(graft.Tables(s, dir, "documents"), keyCol = "doc_id",
        stratumCol = "source", epochs = RepeatEpochs)
        .select(col("doc_id"), col("source"), col("copy_id")))
  )

  /** md5-bucket expression shared by the mixing oracles (identical to the
    * [[Sampling]] oracles' form).
    */
  private def duckBucket(buckets: Int) =
    s"('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % $buckets"

  def oracles: Map[String, String] = Map(
    "mix_temperature" ->
      s"""WITH counts AS (
         |  SELECT lang, COUNT(*) AS n_s FROM documents GROUP BY lang),
         |rates AS (
         |  SELECT lang,
         |    FLOOR(LEAST(1.0,
         |      $MixTargetFrac * (SUM(n_s) OVER ()) * sqrt(n_s) /
         |        CAST(SUM(CAST(ROUND(sqrt(n_s), 6) AS DECIMAL(28,6))) OVER () AS DOUBLE)
         |        / n_s) * $RateBuckets)::BIGINT AS thr
         |  FROM counts)
         |SELECT doc_id, lang
         |FROM documents JOIN rates USING (lang)
         |WHERE ${duckBucket(RateBuckets)} < thr""".stripMargin,
    "budget_select" ->
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    ROUND(LEAST(1.0, len(string_split_regex(trim(text), '\\s+')) / 50.0) *
         |      (1.0 - 0.5 * (CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |          x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x))) AS DOUBLE)
         |        / len(string_split_regex(trim(text), '\\s+')))), 4) AS quality,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |cum AS (
         |  SELECT quality,
         |    COALESCE(SUM(bucket_tokens) OVER (ORDER BY quality DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM (SELECT quality, SUM(n_tokens) AS bucket_tokens
         |        FROM scored GROUP BY quality))
         |SELECT doc_id, quality, n_tokens,
         |  CAST(cum_before + SUM(n_tokens) OVER (PARTITION BY quality
         |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |FROM scored JOIN cum USING (quality)
         |QUALIFY cum_tokens <= $TokenBudget""".stripMargin,
    "shard_assign" ->
      s"""SELECT doc_id,
         |  CAST(${duckBucket(Shards)} AS BIGINT) AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY ${duckBucket(Shards)}
         |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos
         |FROM documents""".stripMargin,
    "mix_domain_cap" ->
      s"""WITH scored AS (
         |  SELECT doc_id, source,
         |    ROUND(LEAST(1.0, len(string_split_regex(trim(text), '\\s+')) / 50.0) *
         |      (1.0 - 0.5 * (CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |          x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x))) AS DOUBLE)
         |        / len(string_split_regex(trim(text), '\\s+')))), 4) AS quality,
         |    md5(CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents)
         |SELECT doc_id, source, quality, rk FROM (
         |  SELECT doc_id, source, quality,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY quality DESC, h, doc_id) AS BIGINT) AS rk
         |  FROM scored) WHERE rk <= $DomainCapN""".stripMargin,
    "mix_epoch_order" ->
      s"""SELECT doc_id,
         |  CAST(ROW_NUMBER() OVER (
         |    ORDER BY md5('$EpochSeed:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos
         |FROM documents""".stripMargin,
    "quality_buckets" ->
      s"""WITH scored AS (
         |  SELECT doc_id, source,
         |    ROUND(LEAST(1.0, len(string_split_regex(trim(text), '\\s+')) / 50.0) *
         |      (1.0 - 0.5 * (CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |          x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x))) AS DOUBLE)
         |        / len(string_split_regex(trim(text), '\\s+')))), 4) AS quality
         |  FROM documents),
         |tiled AS (
         |  SELECT doc_id, source, quality,
         |    CAST(NTILE(3) OVER (PARTITION BY source
         |      ORDER BY quality DESC, doc_id) AS BIGINT) AS tile
         |  FROM scored)
         |SELECT doc_id, source, quality, tile,
         |  CASE WHEN tile = 1 THEN 'head' WHEN tile = 3 THEN 'tail'
         |       ELSE 'middle' END AS tier
         |FROM tiled""".stripMargin,
    // DuckDB's 2.3/0.4 literals are DECIMALs, so ep - FLOOR(ep) is exact
    // there; Spark's doubles land on the same integer threshold because the
    // rule ROUNDS the ×10⁴ image (2999.999… and 3000.0 both → 3000)
    "mix_repeat_epochs" ->
      s"""WITH w AS (
         |  SELECT doc_id, source,
         |    CASE source WHEN 'src0' THEN 2.3 WHEN 'src1' THEN 0.4
         |         ELSE 1.0 END AS ep
         |  FROM documents),
         |n AS (
         |  SELECT doc_id, source,
         |    CAST(FLOOR(ep) AS BIGINT) +
         |    CASE WHEN ${duckBucket(RateBuckets)}
         |           < CAST(ROUND((ep - FLOOR(ep)) * $RateBuckets) AS BIGINT)
         |         THEN 1 ELSE 0 END AS n_copies
         |  FROM w)
         |SELECT doc_id, source,
         |  unnest(generate_series(1, n_copies)) AS copy_id
         |FROM n WHERE n_copies >= 1""".stripMargin
  )
}
