package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Clustering, QualityClassifier, Similarity,
  TextAnalysis}

/** Non-vacuity proofs for the property-oracle `_check` gates: the battery
  * pins every violation counter at ZERO over the real operators, so each
  * counter must also be shown to FIRE when its contract is actually broken —
  * otherwise a gate could be a constant echo of its own oracle. Each test
  * induces exactly one violation (a parameter that breaks the contract, or a
  * corrupted persisted artifact) and asserts the counter moves; where cheap,
  * the same test re-runs the clean path and asserts it stays at zero.
  * (BpeSpec carries the corrupted-merge-table twin for `text_bpe_train_check`.)
  */
class GateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("tokenTopKInvariants: missing_top_m fires when k cannot hold top-m") {
    // exact top-2 is {aa, bb}; a top-1 sketch can surface only one of them
    val d = Seq((1L, "aa aa bb"), (2L, "aa")).toDF("doc_id", "text")
    val row = TextAnalysis.tokenTopKInvariants(d, k = 1, m = 2).head()
    assert(row.getAs[Long]("n_terms_distinct") === 2L)
    assert(row.getAs[Long]("missing_top_m") === 1L)
    assert(row.getAs[Long]("dup_terms") === 0L)
    assert(row.getAs[Long]("row_count_violation") === 0L) // 1 row = min(1, 2)
  }

  test("lshClusterInvariants: split_exact_pairs fires when pairing is broken") {
    // threshold > 1 admits no pair (exact duplicates score exactly 1.0), so
    // the planted exact-text pair cannot be co-clustered
    val d = Seq((1L, "duplicate body"), (2L, "duplicate body"),
      (3L, "something else")).toDF("doc_id", "text")
    val broken = Clustering.lshClusterInvariants(d, threshold = 1.01).head()
    assert(broken.getAs[Long]("n_exact_text_pairs") === 1L)
    assert(broken.getAs[Long]("split_exact_pairs") === 1L)
    // at the real threshold the same corpus keeps every counter at zero
    val clean = Clustering.lshClusterInvariants(d, threshold = 0.8).head()
    assert(clean.getAs[Long]("split_exact_pairs") === 0L)
    assert(clean.getAs[Long]("clusters_spanning_exact") === 0L)
    assert(clean.getAs[Long]("lsh_nodes_not_in_exact") === 0L)
  }

  test("embeddingLshInvariants: missing_planted_pairs fires when recovery is broken") {
    val e = Tables(spark, sf, "embeddings")
    // an unreachable threshold rejects every verified pair, so every plant
    // goes unrecovered — the counter must count all of them, not echo zero
    val broken = Dedup.embeddingLshInvariants(e, threshold = 1.5).head()
    val planted = broken.getAs[Long]("n_planted")
    assert(planted > 0L)
    assert(broken.getAs[Long]("missing_planted_pairs") === planted)
  }

  test("trainScoreInvariants: accuracy_floor_violation binds to the floor") {
    val d = Tables(spark, sf, "documents")
    val label = col("text").contains("customer")
    // an unattainable floor must fire ...
    val broken = QualityClassifier.trainScoreInvariants(d, label,
      accFloor = 1.01).head()
    assert(broken.getAs[Long]("accuracy_floor_violation") === 1L)
    // ... while conservation and consistency hold either way
    assert(broken.getAs[Long]("dup_docs") === 0L)
    assert(broken.getAs[Long]("prob_bounds_violations") === 0L)
    assert(broken.getAs[Long]("pred_prob_mismatches") === 0L)
  }

  test("ivfLifecycleInvariants: seg_count_mismatch fires on a corrupted segment") {
    val e = Tables(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ivf-gate").toString + "/idx"
    // clean lifecycle first: every counter zero at sf0.001
    val clean = Similarity.ivfLifecycleInvariants(e, dir).head()
    assert(clean.getAs[Long]("seg_count_mismatch") === 0L)
    assert(clean.getAs[Long]("rows_not_k") === 0L)
    assert(clean.getAs[Long]("dup_pairs") === 0L)
    assert(clean.getAs[Long]("self_matches") === 0L)
    // duplicate one quantized row inside a cell partition of the delta
    // segment (the segment is hive-partitioned by cell, so the corruption
    // must land inside a cell=N directory to be discovered) — the
    // conservation counter must notice the segment sum no longer matches
    // the corpus
    val cellDir = new java.io.File(s"$dir/delta").listFiles()
      .filter(_.getName.startsWith("cell=")).head.getPath
    val src = spark.read.parquet(cellDir)
    val one = src.limit(1).collect().toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(one), src.schema)
      .write.mode("append").parquet(cellDir)
    val broken = Similarity.ivfLifecycleInvariants(e, dir).head()
    assert(broken.getAs[Long]("seg_count_mismatch") === 1L)
  }
}
