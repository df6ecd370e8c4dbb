package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Retrieval

/** Streaming text-index maintenance — the ingest half of a deployed phrase-
  * search service, mirroring [[VectorIngest]] for the positional inverted
  * index: documents arrive continuously, and each micro-batch is tokenized
  * and bucketed with the index's STORED modulus (one pass over the batch,
  * zero over the base corpus) and lands as its own immutable
  * `tokb`-partitioned delta segment (`indexDir/delta_b<batchId>`).
  * Searches between batches discover every landed delta via
  * [[Retrieval.searchTextIndex]]'s DeltaStore view, so index freshness is
  * one micro-batch behind ingest with no coordination beyond directory
  * listing; [[Retrieval.compactTextIndex]] periodically folds the deltas
  * to bound file-listing overhead (spec-pinned as a pure rewrite).
  */
object TextIndexIngest {

  /** Start the ingest stream. Each non-empty micro-batch (needs `doc_id` +
    * `text` columns) writes one delta segment; `onBatch(batchId, n)` fires
    * after the segment lands with the number of postings appended.
    *
    * `compactRatio` (when set) runs the ratio-triggered auto-compaction
    * after each landed segment ([[Retrieval.maybeCompactTextIndex]]) —
    * same in-stream maintenance loop as [[VectorIngest.ivfIngestStream]].
    */
  def textIngestStream(docs: DataFrame, indexDir: String,
                       compactRatio: Option[Double] = None)
                      (onBatch: (Long, Long) => Unit = (_, _) => ()): StreamingQuery =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val summary = Retrieval.appendToTextIndex(batch.toDF, indexDir,
            segment = s"delta_b$batchId")
          val n = summary.agg(coalesce(sum(col("n_postings")), lit(0L)))
            .head().getLong(0)
          compactRatio.foreach(r =>
            Retrieval.maybeCompactTextIndex(batch.sparkSession, indexDir, r))
          onBatch(batchId, n)
        }
    }.start()
}
