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

  /** The full "raw corpus → training shards" pre-training dataflow as ONE
    * declarative composition Catalyst optimizes jointly: exact-dedup
    * survivors → quality/language gate ([[curateCorpus]]) → benchmark
    * decontamination ([[Decontam.contaminated]] as an anti-join) →
    * temperature-balanced source mixing ([[Mixing.temperatureMix]]) →
    * deterministic shard layout ([[Mixing.shardAssign]]). Every stage is an
    * already-oracled operator; composing them under one end-to-end hash
    * gate is the point — an inter-stage contract drift (column rename, a
    * stage reordering that changes membership) breaks THIS entry even if
    * every per-stage gate stays green.
    *
    * Scale: each stage keeps its documented shape — digest-only dedup
    * shuffle, per-row scoring, broadcast bench shingles, metadata-sized mix
    * rates, per-shard windows — and nothing materializes between stages.
    * Output: (doc_id, shard, pos) — the epoch order a trainer reads.
    */
  def curateToShards(d: DataFrame, bench: DataFrame,
                     minQuality: Double = 0.5, lang: String = "en",
                     targetFrac: Double = 0.5, shards: Int = 16): DataFrame = {
    val curated = d.join(
      curateCorpus(d, minQuality, lang).select(col("doc_id")), Seq("doc_id"))
    val hits = Decontam.contaminated(curated, bench).select(col("doc_id"))
    val clean = curated.join(hits, Seq("doc_id"), "left_anti")
    val mixed = Mixing.temperatureMix(clean,
      stratumCol = "source", keyCol = "doc_id", targetFrac)
    Mixing.shardAssign(mixed, "doc_id", shards)
  }

  /** PII surface patterns, applied in this order (email first so an
    * address is one `<EMAIL>`, not an email husk plus an `<IP>` hit on its
    * host part). Deliberately restricted to regex features with identical
    * semantics in Java regex (Spark) and RE2 (the DuckDB oracle): character
    * classes, bounded repetition, no lookaround, no backreferences.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "EMAIL" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "IP" -> "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
    "SSN" -> "[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "PHONE" -> "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}")

  /** Scrub PII from `textCol` in place and attach `n_pii`, the number of
    * redactions. Counting is STAGED — each pattern counts on the text as
    * the previous stage left it — so a span never double-counts (an email's
    * digits don't also count as an IP once the email is gone).
    *
    * Scale: pure per-row column expressions (regexp_replace/regexp_count
    * chains inside whole-stage codegen) — no shuffle, no UDF, no state;
    * exactly as parallel as the scan that feeds it.
    */
  def redactPii(d: DataFrame, textCol: String = "text"): DataFrame = {
    val (red, n) = PiiPatterns.foldLeft((col(textCol), lit(0L))) {
      case ((t, acc), (marker, p)) =>
        (regexp_replace(t, p, s"<$marker>"), acc + regexp_count(t, lit(p)))
    }
    d.withColumn("n_pii", n).withColumn(textCol, red)
  }

  /** Embedding-space outlier scoring — the curation filter that flags rows
    * far from their group's centroid (mislabeled data, encoding garbage,
    * off-topic scrapes embed far from their cluster's center). Emits each
    * vector's cosine to its group centroid and an outlier flag.
    *
    * Two tricks keep this oracle-gateable despite float math:
    * (1) the centroid is computed as the per-dimension SUM, not the mean —
    * cosine is scale-invariant, so cos(v, Σ) = cos(v, Σ/n) exactly, and
    * skipping the division skips a rounding step the two engines could
    * disagree on; (2) the per-dimension sum runs in DECIMAL (each float
    * rounded to 6 decimals first), which is exact and order-independent —
    * a double sum would depend on partition order and never hash-match.
    *
    * Scale shape: the explode is per-row compute; the (group, dim) hash
    * aggregation's shuffle is bounded by groups×dims rows AFTER map-side
    * partial combine (metadata-sized, like the IVF centroid sync); the
    * groups×dim-array centroid frame broadcasts; scoring is one unrolled
    * codegen'd pass over the corpus. No corpus-sized shuffle anywhere.
    */
  def embedOutliers(e: DataFrame, groupCol: String = "label",
                    dim: Int = graft.Tables.EmbeddingDim,
                    minCos: Double = 0.0): DataFrame = {
    import graft.functions.VectorFns
    val sums = e
      .select(col(groupCol), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy(col(groupCol), col("d"))
      .agg(sum(round(col("v").cast("double"), 6).cast("decimal(16,6)")).as("s"))
    val cent = sums
      .groupBy(col(groupCol))
      .agg(transform(sort_array(collect_list(struct(col("d"), col("s")))),
        t => round(t.getField("s"), 4).cast("double")).as("centroid"))
    // + 0.0 normalizes IEEE negative zero: a tiny negative cosine rounds
    // to -0.0, which stringifies differently from 0.0 in the cross-engine
    // compare (found by the r15 sf1 sweep — one row in 20 000 landed
    // exactly there; both engines get the same treatment)
    e.join(broadcast(cent), Seq(groupCol))
      .select(col("vec_id"), col(groupCol),
        (round(VectorFns.dotN(col("embedding"), col("centroid"), dim) /
          (VectorFns.l2normN(col("embedding"), dim) *
            VectorFns.l2normN(col("centroid"), dim)), 4) + lit(0.0))
          .as("cos_centroid"))
      .withColumn("outlier", col("cos_centroid") < minCos)
  }

  /** Required-stopword list for the Gopher rule battery (the subset of
    * [[TextAnalysis.EnglishStopwords]] Gopher itself checks; the synthetic
    * vocabulary contains 'the' and 'a', so the ≥2-hits rule has genuine
    * per-document signal — 317/500 docs at sf0.01 carry both).
    */
  val RequiredStopwords: Seq[String] = Seq("the", "a", "and", "of", "to")

  /** 30 numeric tokens for the gopher-battery alpha-fraction plant — enough
    * that even a 99-token doc drops below the 0.8 alphabetic floor.
    */
  val GopherNumericJunk: String =
    "101 202 303 404 505 606 707 808 909 111 222 333 444 555 666 " +
      "777 888 999 121 232 343 454 565 676 787 898 919 212 323 434"

  /** Gopher-style rule-based quality gate (Rae et al. 2021, table A1) — the
    * standard pre-filter a training-data pipeline runs BEFORE any model
    * scoring: per-document word-count bounds, mean-word-length bounds,
    * symbol-to-word ratio, alphabetic-word fraction, and a required-
    * stopword count, plus the conjunctive `pass` flag.
    *
    * Scale shape: pure per-row column math over one scan — tokenize once,
    * every rule reads the same token array inside whole-stage codegen; no
    * shuffle, no UDF, no state. Ratios are rounded (shared round4 contract)
    * BEFORE comparison so the flags are engine-portable.
    */
  def gopherRules(d: DataFrame,
                  minWords: Long = 50, maxWords: Long = 100000L,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.8,
                  minStopHits: Int = 2): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val nWords = size(toks).cast("long")
    // chars-sans-whitespace / words == mean token length, without a
    // per-token HOF pass (and with no lambda touching outer columns)
    val meanLen = round(
      length(regexp_replace(col("text"), "\\s", "")).cast("double") / nWords, 4)
    val symRatio = round(
      (regexp_count(col("text"), lit("#")) +
        regexp_count(col("text"), lit("\\.\\.\\."))).cast("double") / nWords, 4)
    val alphaRatio = round(
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / nWords, 4)
    val stopHits = RequiredStopwords
      .map(w => array_contains(toks, w).cast("int")).reduce(_ + _).cast("long")
    d.filter(col("text").isNotNull)
      .select(col("doc_id"), nWords.as("n_words"), meanLen.as("mean_word_len"),
        symRatio.as("symbol_ratio"), alphaRatio.as("alpha_ratio"),
        stopHits.as("stop_hits"))
      .withColumn("pass",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanLen, maxMeanLen) &&
          col("symbol_ratio") < maxSymbolRatio &&
          col("alpha_ratio") >= minAlphaRatio &&
          col("stop_hits") >= minStopHits)
  }

  /** Per-source reputation report — the C4/RefinedWeb "domain" filter shape:
    * for each source, document count, distinct-content count, duplication
    * rate, and mean quality, with a blocklist flag for sources that are
    * mostly boilerplate or low quality. At 100 TB this is THE cheap lever —
    * dropping a bad domain removes millions of documents for the cost of
    * one metadata-sized aggregate.
    *
    * Scale shape: one hash aggregation keyed by source (the shuffle carries
    * (source, fingerprint, quality-decimal) after map-side partial combine
    * of the count/sum; count-distinct expands to the (source, fp) pre-agg
    * Catalyst plans automatically) — output is one row per source. Quality
    * sums in DECIMAL so the mean is order-independent and engine-portable.
    */
  def sourceStats(d: DataFrame, maxDupRate: Double = 0.2,
                  minAvgQuality: Double = 0.3): DataFrame = {
    d.filter(col("text").isNotNull)
      .select(col("source"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.qualityScore(col("text")).cast("decimal(14,4)").as("q"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"),
        sum(col("q")).as("qsum"))
      .select(col("source"), col("n_docs"), col("n_unique"),
        round(lit(1.0) - col("n_unique").cast("double") / col("n_docs"), 4)
          .as("dup_rate"),
        round(col("qsum").cast("double") / col("n_docs"), 4).as("avg_quality"))
      .withColumn("flagged",
        col("dup_rate") > maxDupRate || col("avg_quality") < minAvgQuality)
  }

  /** Cross-source duplicate attribution — for every pair of sources, how
    * many distinct contents they BOTH carry (mirror sites, syndicated
    * boilerplate, scraped re-posts). This is the lineage report behind a
    * dedup policy: it tells you which sources to drop wholesale vs dedup
    * row-by-row, before any row-level work runs.
    *
    * Scale shape: the corpus collapses to DISTINCT (fingerprint, source) —
    * one hash-agg shuffle of 16-byte digests; the self-join then matches
    * within fingerprint groups whose size is bounded by the NUMBER OF
    * SOURCES (a content can appear in at most every source once after the
    * distinct), so the pair blow-up is sources²·contents, never docs².
    * Output is one row per sharing source pair.
    */
  def crossSourceDups(d: DataFrame): DataFrame = {
    val fs = d.filter(col("text").isNotNull)
      .select(TextAnalysis.fingerprint(col("text")).as("fp"), col("source"))
      .distinct()
    fs.alias("a").join(fs.alias("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Line-level boilerplate removal — the C4/CCNet curation rule: a LINE
    * occurring in at least `minDocs` distinct documents is boilerplate
    * (navigation, cookie banners, share buttons, license footers) and is
    * stripped from every document; surviving lines rejoin in their original
    * order. This is the complement of [[SpanDedup]]: spans dedup WITHIN a
    * repetition neighborhood, line dedup removes corpus-global short
    * repeats that span detection's shingle width never sees.
    *
    * Scale shape: the corpus explodes to (doc, pos, line) once; the
    * boilerplate decision shuffles ONLY 16-byte line digests with a
    * map-side-combined distinct-doc count (never the line text); the
    * verdict set (lines occurring ≥ minDocs times — a tiny fraction of
    * distinct lines) joins back under AQE (broadcast at any realistic
    * boilerplate cardinality); reassembly is one doc-keyed aggregate whose
    * collect_list carries only KEPT lines. Docs reduced to nothing stay in
    * the output with empty text (they are rows a downstream length gate
    * should see and drop, not silent losses).
    */
  def stripBoilerplateLines(d: DataFrame, minDocs: Int = 3,
                            delim: String = "\n"): DataFrame = {
    val lines = d.filter(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(split(col("text"), java.util.regex.Pattern.quote(delim)))
          .as(Seq("pos", "line")))
    val boiler = lines
      .groupBy(md5(col("line")).as("lh"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("lh"), lit(true).as("is_boiler"))
    lines
      .join(boiler, md5(col("line")) === boiler("lh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(coalesce(col("is_boiler"), lit(false)), lit(null))
                .otherwise(struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          delim).as("clean_text"),
        sum(when(coalesce(col("is_boiler"), lit(false)), 1L).otherwise(0L))
          .as("n_removed"))
  }

  /** The curation FUNNEL — the composed report a production pipeline emits:
    * how many documents survive each gate, in gate order (raw → encoding →
    * exact-dedup → quality floor → benchmark decontamination). The count
    * after stage k applies gates 1..k cumulatively, which is what makes the
    * report a funnel and the oracle a genuine composition check: a row
    * that any stage misclassifies shifts every later count.
    *
    * Built as per-document boolean gate flags resolved in ONE dataflow
    * (survivor membership and contamination attach by left-semi-style
    * joins), then a single global aggregate of flag sums unpivoted to
    * (stage, n_docs) rows — the whole corpus collapses to five numbers
    * before anything reaches the driver. The survivor set is computed on
    * the encoding-surviving population (gates apply in order — dedup
    * doesn't resurrect a doc the encoding gate killed); contamination is
    * corpus-membership-independent (shingle overlap with the benchmark),
    * so it attaches as a per-doc fact.
    */
  def curationFunnel(d: DataFrame, bench: DataFrame,
                     minQuality: Double = 0.3): DataFrame = {
    val enc = TextAnalysis.encodingSignal(col("text"))
    val flagged = d.select(col("doc_id"), col("text"),
      (enc.getField("replacement_ratio") === 0.0 &&
        enc.getField("non_ascii_ratio") <= 0.2).as("enc_ok"))
    val survivors = flagged.filter(col("enc_ok"))
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(true).as("is_surv"))
    val contaminated = Decontam.contaminated(d, bench)
      .select(col("doc_id"), lit(true).as("is_cont"))
    val staged = flagged
      .join(survivors, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .select(
        col("enc_ok"),
        (col("enc_ok") && coalesce(col("is_surv"), lit(false))).as("surv_ok"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        coalesce(col("is_cont"), lit(false)).as("cont"))
      .select(col("enc_ok"), col("surv_ok"),
        (col("surv_ok") && col("q") >= minQuality).as("qual_ok"),
        col("cont"))
    staged.agg(
        count(lit(1)).as("s0_raw"),
        sum(when(col("enc_ok"), 1L).otherwise(0L)).as("s1_encoding"),
        sum(when(col("surv_ok"), 1L).otherwise(0L)).as("s2_dedup"),
        sum(when(col("qual_ok"), 1L).otherwise(0L)).as("s3_quality"),
        sum(when(col("qual_ok") && !col("cont"), 1L).otherwise(0L)).as("s4_decontam"))
      .unpivot(Array.empty[org.apache.spark.sql.Column],
        Array(col("s0_raw"), col("s1_encoding"), col("s2_dedup"),
          col("s3_quality"), col("s4_decontam")), "stage", "n_docs")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curate_corpus" -> ((s, dir) =>
      curateCorpus(graft.Tables(s, dir, "documents"),
        minQuality = 0.5, lang = "en")),

    // the full raw-corpus → training-shards dataflow (dedup → quality/lang
    // → decontaminate vs the mod-7 bench → temperature mix → shards) under
    // one end-to-end hash
    "e2e_training_shards" -> ((s, dir) => {
      val docs = graft.Tables(s, dir, "documents")
      curateToShards(
        d = docs.filter(col("doc_id") % 7 =!= 0),
        bench = docs.filter(col("doc_id") % 7 === 0))
    }),

    // the composed funnel over the documents table, with the mod-7 docs as
    // the stand-in external benchmark (same convention as `decontaminate`).
    // The synthetic corpus is clean ASCII with no exact dups, so two gates
    // would idle; deterministic planting (the `curate_redact` convention —
    // both engines derive the same damage from doc_id) gives every stage
    // real drops: %31==3 docs gain a replacement char (encoding gate),
    // %31==5 docs collapse to one constant text (exact-dedup gate; its
    // 4-token survivor then falls to the quality floor).
    "curate_funnel" -> ((s, dir) => {
      val d = graft.Tables(s, dir, "documents")
      val planted = d.withColumn("text",
        when(col("doc_id") % 31 === 3, concat(col("text"), lit(" �")))
          .when(col("doc_id") % 31 === 5, lit("duplicate seed text block"))
          .otherwise(col("text")))
      curationFunnel(
        planted.filter(col("doc_id") % 7 =!= 0),
        bench = planted.filter(col("doc_id") % 7 === 0))
    }),

    "curate_embed_outliers" -> ((s, dir) =>
      embedOutliers(graft.Tables(s, dir, "embeddings"))),

    // line-level boilerplate removal. The synthetic corpus has no line
    // structure (single-line docs), so banners are planted deterministically
    // (the curate_redact convention — both engines derive identical lines
    // from doc_id): %5 docs gain a subscribe banner line, %7 docs a license
    // footer line; each occurs in ≥3 docs and must strip everywhere, while
    // the original text lines are (at gate scales) unique and survive.
    "curate_line_dedup" -> ((s, dir) => {
      val d = graft.Tables(s, dir, "documents").filter(col("text").isNotNull)
      val planted = d.withColumn("text", concat(
        when(col("doc_id") % 5 === 0,
          lit("subscribe to our newsletter for updates\n")).otherwise(lit("")),
        col("text"),
        when(col("doc_id") % 7 === 0,
          lit("\nall rights reserved contact us for licensing")).otherwise(lit(""))))
      stripBoilerplateLines(planted, minDocs = 3)
    }),

    // Gopher rule gate with deterministic planted damage (the curate_redact
    // convention — both engines derive identical damage from doc_id) so
    // every rule fires on real rows: %17==1 gains symbol runs, %17==2 gains
    // 30 numeric tokens (alpha-fraction fail), %17==3 gains one 800-char
    // token (mean-word-length fail); word-count and stopword rules have
    // natural signal (10–99-token docs; 'the'/'a' presence varies)
    "curate_gopher_rules" -> ((s, dir) => {
      val d = graft.Tables(s, dir, "documents")
      val planted = d.withColumn("text",
        when(col("doc_id") % 17 === 1,
          concat(col("text"), lit(" ### #### ## ... ... ... ##")))
          .when(col("doc_id") % 17 === 2,
            concat(col("text"), lit(" " + GopherNumericJunk)))
          .when(col("doc_id") % 17 === 3,
            concat(col("text"), lit(" " + "x" * 800)))
          .otherwise(col("text")))
      gopherRules(planted)
    }),

    // per-source reputation with three planted boilerplate-heavy sources
    // (src3/src7/src11: two thirds of their docs collapse to one shared
    // banner) — those sources must flag, the others must not
    "curate_source_stats" -> ((s, dir) => {
      val d = graft.Tables(s, dir, "documents")
      val planted = d.withColumn("text",
        when(col("source").isin("src3", "src7", "src11") &&
          col("doc_id") % 3 =!= 0, lit("shared boilerplate banner text"))
          .otherwise(col("text")))
      sourceStats(planted)
    }),

    // cross-source shared-content report with two planted syndicated
    // banners (%23==2 and %23==7 docs collapse to one of two constant
    // texts, wherever they live) — the sources carrying them must pair up
    "dedup_cross_source" -> ((s, dir) => {
      val d = graft.Tables(s, dir, "documents")
      val planted = d.withColumn("text",
        when(col("doc_id") % 23 === 2, lit("syndicated banner alpha"))
          .when(col("doc_id") % 23 === 7, lit("syndicated banner beta"))
          .otherwise(col("text")))
      crossSourceDups(planted)
    }),

    // PII scrub over the corpus with deterministic planted PII (every 10th
    // doc gains an email + ip + ssn + phone suffix, derived from doc_id in
    // both engines) so the oracle exercises real redactions, not just the
    // no-match identity path
    "curate_redact" -> ((s, dir) => {
      val d = graft.Tables(s, dir, "documents")
      val planted = d.withColumn("text",
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@mail.example.com ip 10.0."), col("doc_id") % 256,
            lit(".7 ssn 123-45-6789 tel 555-123-4567")))
          .otherwise(col("text")))
      redactPii(planted)
        .select(col("doc_id"), col("text").as("red_text"), col("n_pii"))
    })
  )

  /** DuckDB transliteration — each sub-formula is the one already validated
    * by its per-operator oracle (fingerprint, quality, lang-ID, hash split).
    */
  def oracles: Map[String, String] = Map(
    "curate_funnel" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 31 = 3 THEN text || ' ' || chr(65533)
        |         WHEN doc_id % 31 = 5 THEN 'duplicate seed text block'
        |         ELSE text END AS text
        |  FROM documents),
        |raw AS (
        |  SELECT doc_id, text FROM planted WHERE doc_id % 7 <> 0),
        |enc AS (
        |  SELECT doc_id, text,
        |    (ROUND(CAST(LENGTH(text) - LENGTH(regexp_replace(text, '\x{FFFD}', '', 'g')) AS DOUBLE) / LENGTH(text), 4) = 0.0
        |     AND ROUND(CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^\x00-\x7F]', '', 'g')) AS DOUBLE) / LENGTH(text), 4) <= 0.2) AS enc_ok
        |  FROM raw),
        |surv AS (
        |  SELECT MIN(doc_id) AS doc_id FROM enc WHERE enc_ok
        |  GROUP BY MD5(LOWER(regexp_replace(trim(text), '\s+', ' ', 'g')))),
        |shc AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id,
        |      unnest([md5(array_to_string(toks[i:i+4], ' '))
        |              for i in range(1, len(toks) - 3)]) AS shingle
        |    FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |          FROM planted WHERE doc_id % 7 <> 0))),
        |shb AS (
        |  SELECT DISTINCT shingle FROM (
        |    SELECT unnest([md5(array_to_string(toks[i:i+4], ' '))
        |                   for i in range(1, len(toks) - 3)]) AS shingle
        |    FROM (SELECT string_split_regex(trim(text), '\s+') AS toks
        |          FROM planted WHERE doc_id % 7 = 0))),
        |cont AS (SELECT DISTINCT doc_id FROM shc WHERE shingle IN (SELECT shingle FROM shb)),
        |flags AS (
        |  SELECT e.doc_id, e.enc_ok,
        |    (e.enc_ok AND e.doc_id IN (SELECT doc_id FROM surv)) AS surv_ok,
        |    ROUND(LEAST(1.0, len(string_split_regex(trim(e.text), '\s+')) / 50.0) *
        |      (1.0 - 0.5 * (CAST(len(list_filter(string_split_regex(trim(e.text), '\s+'),
        |          x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x))) AS DOUBLE)
        |        / len(string_split_regex(trim(e.text), '\s+')))), 4) AS q,
        |    e.doc_id IN (SELECT doc_id FROM cont) AS cont
        |  FROM enc e),
        |f2 AS (
        |  SELECT enc_ok, surv_ok, (surv_ok AND q >= 0.3) AS qual_ok, cont FROM flags),
        |agg AS (
        |  SELECT COUNT(*) AS s0_raw,
        |    CAST(SUM(CASE WHEN enc_ok THEN 1 ELSE 0 END) AS BIGINT) AS s1_encoding,
        |    CAST(SUM(CASE WHEN surv_ok THEN 1 ELSE 0 END) AS BIGINT) AS s2_dedup,
        |    CAST(SUM(CASE WHEN qual_ok THEN 1 ELSE 0 END) AS BIGINT) AS s3_quality,
        |    CAST(SUM(CASE WHEN qual_ok AND NOT cont THEN 1 ELSE 0 END) AS BIGINT) AS s4_decontam
        |  FROM f2)
        |SELECT 's0_raw' AS stage, s0_raw AS n_docs FROM agg
        |UNION ALL SELECT 's1_encoding', s1_encoding FROM agg
        |UNION ALL SELECT 's2_dedup', s2_dedup FROM agg
        |UNION ALL SELECT 's3_quality', s3_quality FROM agg
        |UNION ALL SELECT 's4_decontam', s4_decontam FROM agg""".stripMargin,
    "curate_line_dedup" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0
        |         THEN 'subscribe to our newsletter for updates' || chr(10)
        |         ELSE '' END
        |    || text ||
        |    CASE WHEN doc_id % 7 = 0
        |         THEN chr(10) || 'all rights reserved contact us for licensing'
        |         ELSE '' END AS text
        |  FROM documents WHERE text IS NOT NULL),
        |lines AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, chr(10))) AS line,
        |    unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
        |  FROM planted),
        |boiler AS (
        |  SELECT line FROM lines GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 3)
        |SELECT l.doc_id,
        |  COALESCE(string_agg(CASE WHEN b.line IS NULL THEN l.line END,
        |                      chr(10) ORDER BY l.pos), '') AS clean_text,
        |  COUNT(b.line) AS n_removed
        |FROM lines l LEFT JOIN boiler b USING (line)
        |GROUP BY l.doc_id""".stripMargin,
    "curate_embed_outliers" ->
      """WITH d AS (
        |  SELECT label, unnest(embedding) AS v,
        |    unnest(range(1, len(embedding) + 1)) AS di
        |  FROM embeddings),
        |s AS (
        |  SELECT label, di,
        |    SUM(CAST(ROUND(CAST(v AS DOUBLE), 6) AS DECIMAL(16,6))) AS sv
        |  FROM d GROUP BY label, di),
        |cent AS (
        |  SELECT label, list(CAST(ROUND(sv, 4) AS DOUBLE) ORDER BY di) AS c
        |  FROM s GROUP BY label),
        |scored AS (
        |  SELECT e.vec_id, e.label,
        |    ROUND(
        |      list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * c[i])) /
        |      (SQRT(list_sum(list_transform(range(1, len(e.embedding) + 1),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) *
        |       SQRT(list_sum(list_transform(range(1, len(c) + 1),
        |        i -> c[i] * c[i])))), 4) + 0.0 AS cos_centroid
        |  FROM embeddings e JOIN cent USING (label))
        |SELECT vec_id, label, cos_centroid, cos_centroid < 0.0 AS outlier
        |FROM scored""".stripMargin,
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
        |WHERE quality >= 0.5 AND lang_guess = 'en'""".stripMargin,
    "e2e_training_shards" ->
      """WITH corpus AS (SELECT * FROM documents WHERE doc_id % 7 <> 0),
        |surv AS (
        |  SELECT MIN(doc_id) AS doc_id FROM corpus
        |  GROUP BY MD5(LOWER(regexp_replace(trim(text), '\s+', ' ', 'g')))),
        |scored AS (
        |  SELECT d.doc_id, d.source,
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
        |  FROM corpus d JOIN surv USING (doc_id)),
        |curated AS (
        |  SELECT doc_id, source FROM (
        |    SELECT doc_id, source,
        |      ROUND(LEAST(1.0, n_tokens / 50.0) *
        |            (1.0 - 0.5 * (CAST(n_stop AS DOUBLE) / n_tokens)), 4) AS quality,
        |      CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        |           WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        |           WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS lang_guess
        |    FROM scored)
        |  WHERE quality >= 0.5 AND lang_guess = 'en'),
        |sh AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id,
        |      unnest([md5(array_to_string(toks[i:i+4], ' '))
        |              for i in range(1, len(toks) - 3)]) AS shingle
        |    FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |          FROM documents))),
        |hits AS (
        |  SELECT DISTINCT s.doc_id FROM sh s
        |  JOIN (SELECT DISTINCT shingle FROM sh WHERE doc_id % 7 = 0) b USING (shingle)
        |  WHERE s.doc_id % 7 <> 0),
        |clean AS (
        |  SELECT c.doc_id, c.source FROM curated c
        |  ANTI JOIN hits h ON c.doc_id = h.doc_id),
        |counts AS (SELECT source, COUNT(*) AS n_s FROM clean GROUP BY source),
        |rates AS (
        |  SELECT source,
        |    FLOOR(LEAST(1.0,
        |      0.5 * (SUM(n_s) OVER ()) * sqrt(n_s) /
        |        CAST(SUM(CAST(ROUND(sqrt(n_s), 6) AS DECIMAL(28,6))) OVER () AS DOUBLE)
        |        / n_s) * 10000)::BIGINT AS thr
        |  FROM counts),
        |mixed AS (
        |  SELECT doc_id FROM clean JOIN rates USING (source)
        |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000 < thr)
        |SELECT doc_id,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 16 AS BIGINT) AS shard,
        |  CAST(ROW_NUMBER() OVER (
        |    PARTITION BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 16
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos
        |FROM mixed""".stripMargin,
    "curate_gopher_rules" ->
      ("""WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 17 = 1 THEN text || ' ### #### ## ... ... ... ##'
        |         WHEN doc_id % 17 = 2 THEN text || ' """ + GopherNumericJunk +
        """'
        |         WHEN doc_id % 17 = 3 THEN text || ' ' || repeat('x', 800)
        |         ELSE text END AS text
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
        |    ROUND(CAST(LENGTH(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |      / len(string_split_regex(trim(text), '\s+')), 4) AS mean_word_len,
        |    ROUND(CAST(len(regexp_extract_all(text, '#')) +
        |               len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE)
        |      / len(string_split_regex(trim(text), '\s+')), 4) AS symbol_ratio,
        |    ROUND(CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
        |      / len(string_split_regex(trim(text), '\s+')), 4) AS alpha_ratio,
        |    CAST(CAST(list_contains(string_split_regex(trim(text), '\s+'), 'the') AS INT)
        |       + CAST(list_contains(string_split_regex(trim(text), '\s+'), 'a') AS INT)
        |       + CAST(list_contains(string_split_regex(trim(text), '\s+'), 'and') AS INT)
        |       + CAST(list_contains(string_split_regex(trim(text), '\s+'), 'of') AS INT)
        |       + CAST(list_contains(string_split_regex(trim(text), '\s+'), 'to') AS INT)
        |      AS BIGINT) AS stop_hits
        |  FROM planted)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio, stop_hits,
        |  (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3 AND 10
        |   AND symbol_ratio < 0.1 AND alpha_ratio >= 0.8 AND stop_hits >= 2) AS pass
        |FROM r""").stripMargin,
    "curate_source_stats" ->
      """WITH planted AS (
        |  SELECT doc_id, source,
        |    CASE WHEN source IN ('src3','src7','src11') AND doc_id % 3 <> 0
        |         THEN 'shared boilerplate banner text' ELSE text END AS text
        |  FROM documents),
        |base AS (
        |  SELECT source,
        |    MD5(LOWER(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
        |    CAST(ROUND(LEAST(1.0, len(string_split_regex(trim(text), '\s+')) / 50.0) *
        |      (1.0 - 0.5 * (CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |          x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x))) AS DOUBLE)
        |        / len(string_split_regex(trim(text), '\s+')))), 4) AS DECIMAL(14,4)) AS q
        |  FROM planted WHERE text IS NOT NULL),
        |agg AS (
        |  SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_unique,
        |    SUM(q) AS qsum
        |  FROM base GROUP BY source)
        |SELECT source, n_docs, n_unique,
        |  ROUND(1.0 - CAST(n_unique AS DOUBLE) / n_docs, 4) AS dup_rate,
        |  ROUND(CAST(qsum AS DOUBLE) / n_docs, 4) AS avg_quality,
        |  (ROUND(1.0 - CAST(n_unique AS DOUBLE) / n_docs, 4) > 0.2 OR
        |   ROUND(CAST(qsum AS DOUBLE) / n_docs, 4) < 0.3) AS flagged
        |FROM agg""".stripMargin,
    "dedup_cross_source" ->
      """WITH planted AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 23 = 2 THEN 'syndicated banner alpha'
        |         WHEN doc_id % 23 = 7 THEN 'syndicated banner beta'
        |         ELSE text END AS text
        |  FROM documents),
        |fs AS (
        |  SELECT DISTINCT
        |    MD5(LOWER(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
        |    source
        |  FROM planted WHERE text IS NOT NULL)
        |SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
        |FROM fs a JOIN fs b ON a.fp = b.fp AND a.source < b.source
        |GROUP BY a.source, b.source""".stripMargin,
    "curate_redact" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |      '@mail.example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
        |      '.7 ssn 123-45-6789 tel 555-123-4567'
        |    ELSE text END AS text
        |  FROM documents),
        |s1 AS (SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n1,
        |  regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
        |  FROM planted),
        |s2 AS (SELECT doc_id, n1,
        |  len(regexp_extract_all(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS n2,
        |  regexp_replace(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS t
        |  FROM s1),
        |s3 AS (SELECT doc_id, n1, n2,
        |  len(regexp_extract_all(t, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS n3,
        |  regexp_replace(t, '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS t
        |  FROM s2),
        |s4 AS (SELECT doc_id, n1, n2, n3,
        |  len(regexp_extract_all(t, '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}')) AS n4,
        |  regexp_replace(t, '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}', '<PHONE>', 'g') AS t
        |  FROM s3)
        |SELECT doc_id, t AS red_text, CAST(n1 + n2 + n3 + n4 AS BIGINT) AS n_pii
        |FROM s4""".stripMargin
  )
}
