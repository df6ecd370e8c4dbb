package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** Streaming ANN index maintenance — the ingest half of a deployed
  * similarity service: vectors arrive continuously, and each micro-batch is
  * assigned + quantized into the persisted IVF index's TRAINED centroids
  * (one pass over the batch, zero over the base corpus) and lands as its
  * own immutable cell-partitioned delta segment
  * (`indexDir/delta_b<batchId>`) — exactly how an object-store-resident
  * index grows: new parquet files per ingest cycle, never a rewrite of
  * existing segments. Searches between batches discover every landed delta
  * via [[Similarity.searchIvfIndexWithDelta]], so index freshness is one
  * micro-batch behind ingest with no coordination beyond directory listing.
  *
  * Trade-offs carried honestly (same as the batch append path): centroids
  * drift as the distribution shifts, so append-heavy indexes degrade probe
  * recall until the next retrain — the batch-path recall pins measure that
  * degradation; and many tiny deltas accumulate file-listing overhead, so a
  * production deployment periodically compacts `delta_b*` into `segments`
  * with [[Similarity.buildIvfIndex]]'s writer (the spec pins that deltas
  * compose associatively, which is what makes compaction a pure rewrite).
  */
object VectorIngest {

  /** Start the ingest stream. Each non-empty micro-batch (needs `vec_id` +
    * `embedding` columns) writes one delta segment; `onBatch(batchId, n)`
    * fires after the segment lands with the number of vectors appended.
    *
    * `compactRatio` (when set) runs the ratio-triggered auto-compaction
    * after each landed segment ([[Similarity.maybeCompactIvfDeltas]]): the
    * trigger check is a directory walk, and a fold runs only when the
    * accumulated deltas actually exceed that fraction of the base — the
    * maintenance loop a deployed index otherwise needs a side scheduler
    * for.
    */
  def ivfIngestStream(vectors: DataFrame, indexDir: String,
                      dim: Int = graft.Tables.EmbeddingDim,
                      compactRatio: Option[Double] = None)
                     (onBatch: (Long, Long) => Unit = (_, _) => ()): StreamingQuery =
    vectors.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val summary = Similarity.appendToIvfIndex(batch.toDF, indexDir,
            dim = dim, segment = s"delta_b$batchId")
          val n = summary.agg(sum(col("n_vectors"))).head().getLong(0)
          compactRatio.foreach(r =>
            Similarity.maybeCompactIvfDeltas(batch.sparkSession, indexDir, r))
          onBatch(batchId, n)
        }
    }.start()
}
