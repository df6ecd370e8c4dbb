package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** Character-level BPE specs: the classic Sennrich corpus learns the
  * canonical merge sequence, inference reproduces training segmentation,
  * every encoding concatenates back to its word (losslessness), and more
  * merges never increase the corpus token count.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val paperVocab = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learnMerges reproduces the canonical first merges on the paper corpus") {
    // weighted pair counts: (e,s)=9 ties (s,t</w>)=9 → lexicographic; then
    // (es,t</w>)=9, (l,o)=7, and the 6-count tie resolves to (e,w)
    val merges = Bpe.learnMerges(paperVocab, numMerges = 4)
    assert(merges === Seq(
      ("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w")))
  }

  test("encodeWord segments an unseen word with learned merges, losslessly") {
    val ranks = Bpe.learnMerges(paperVocab, numMerges = 4).zipWithIndex.toMap
    assert(Bpe.encodeWord("lowest", ranks) === Vector("lo", "w", "est</w>"))
    // losslessness holds for any word, in- or out-of-vocabulary
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "wide", "xyz")) {
      val joined = Bpe.encodeWord(w, ranks).mkString
      assert(joined === w + Bpe.EndOfWord, s"lossy encoding of '$w': $joined")
    }
    // zero merges degenerate to characters
    assert(Bpe.encodeWord("abc", Map.empty) === Vector("a", "b", "c</w>"))
  }

  test("full-merge training segments training words back to whole words") {
    // with enough rounds every training word collapses to a single symbol —
    // the fixed point that proves inference follows training order
    val ranks = Bpe.learnMerges(paperVocab, numMerges = 100).zipWithIndex.toMap
    for ((w, _) <- paperVocab)
      assert(Bpe.encodeWord(w, ranks) === Vector(w + Bpe.EndOfWord), w)
  }

  test("BPE-token budget selection ≡ the naive global-window greedy") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.{Bpe, Mixing, TextAnalysis}
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val top = Bpe.wordFreqs(d).orderBy(col("n").desc, col("word")).limit(500)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val scored = d
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
      .join(Bpe.encode(d, Bpe.learnMerges(top, 40))
        .select(col("doc_id"), col("n_subwords").as("n_tokens")), Seq("doc_id"))
      .select(col("doc_id"), col("quality"), col("n_tokens"))
    val budget = 5000L
    val got = Mixing.selectByTokenBudgetScored(scored, budget)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val w = Window.orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = scored.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got === ref)
    assert(got.nonEmpty && got.values.max <= budget)
  }

  test("persisted merge table: train/encode split ≡ the one-shot path") {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val td = java.nio.file.Files.createTempDirectory("bpe-table-spec").toString + "/merges"
    Bpe.trainBpe(d, td, topWords = 500, numMerges = 40).count()
    // the artifact round-trips the merge list exactly, in training order
    val persisted = Bpe.loadMerges(spark, td)
    val oneShot = Bpe.corpusMerges(d, topWords = 500, numMerges = 40)
    assert(persisted === oneShot)
    // and the frozen-tokenizer encode is row-identical to the one-shot path
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(Bpe.encodeWithTable(d, td)) === rows(Bpe.encode(d, oneShot)))
  }

  test("corpus encoding: fertility bounds and monotone compression in merges") {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val top = Bpe.wordFreqs(d).orderBy(col("n").desc, col("word")).limit(500)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    def totalSubwords(numMerges: Int): Long =
      Bpe.encode(d, Bpe.learnMerges(top, numMerges))
        .agg(sum("n_subwords")).head().getLong(0)
    val Seq(m0, m20, m60) = Seq(0, 20, 60).map(totalSubwords)
    assert(m0 > m20 && m20 > m60,
      s"more merges must compress: $m0 → $m20 → $m60")
    // fertility floor: a subword count can never drop below the word count
    val viol = Bpe.encode(d, Bpe.learnMerges(top, 60))
      .filter(col("n_subwords") < col("n_words")).count()
    assert(viol === 0L)
  }

  test("trainInvariants fires on a corrupted merge table (gate non-vacuity)") {
    // the battery pins every counter at zero over the real frozen table;
    // this is the other direction — each wellformedness counter must FIRE
    // on the corruption it guards against, or the gate is an echo
    val d = Seq((1L, "ab ab"), (2L, "ab")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bpe-gate").toString
    // rank hole (0 then 2), an under-derived operand ("xy" never produced),
    // and alphabet escapees (x, y, z are not corpus characters)
    Seq((0L, "a", "b</w>"), (2L, "xy", "z"))
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    val row = Bpe.trainInvariants(d, s"$dir/merges").head()
    assert(row.getAs[Long]("n_corpus_chars") === 2L)       // {a, b}
    assert(row.getAs[Long]("rank_violations") === 1L)      // 2 where 1 expected
    assert(row.getAs[Long]("malformed_merge_violations") === 1L) // "xy"
    assert(row.getAs[Long]("foreign_char_violations") === 2L)    // "xy", "z"
    assert(row.getAs[Long]("merge_count_violation") === 0L)
    // and the clean table from the same corpus keeps every counter at zero
    Bpe.trainBpe(d, s"$dir/clean")
    val ok = Bpe.trainInvariants(d, s"$dir/clean").head()
    Seq("malformed_merge_violations", "foreign_char_violations",
      "rank_violations", "merge_count_violation")
      .foreach(c => assert(ok.getAs[Long](c) === 0L, c))
  }
}
