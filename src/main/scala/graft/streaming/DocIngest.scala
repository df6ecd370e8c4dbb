package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming document ingest with corpus-level exact dedup — the
  * composition a training-data store actually runs in front of a 100 TB
  * corpus. Per micro-batch:
  *
  *  1. self-dedup WITHIN the batch (first arrival — min doc_id — per
  *     normalized-content fingerprint, the same survivor rule as
  *     [[EventStreams.dedupBatch]]);
  *  2. route through the corpus Bloom filter and exact-verify the maybe set
  *     ([[Dedup.bloomAdmitIds]]): the corpus contributes one broadcast-semi
  *     verification scan and ZERO shuffles per batch;
  *  3. fold the admitted fingerprints back into both the driver's filter
  *     copy (`putLong` — a Bloom filter unions by OR) and the
  *     verification-base delta, so a duplicate arriving in a LATER batch is
  *     still caught even though the static corpus never saw it.
  *
  * `foreachBatch` is the right host: the Bloom routing needs per-batch
  * actions (the broadcast-size gate, the state fold) that a pure streaming
  * transform cannot express, and the sink keeps exactly-once by writing
  * idempotently per `batchId` as usual with foreachBatch.
  *
  * RESTART CONTRACT: the cross-batch state (filter + admitted delta) lives
  * in driver memory and dies with the query. The sink that persists
  * admitted rows is the durable record, so on restart the caller passes the
  * store's already-admitted documents as `priorAdmitted` — they are folded
  * into the filter and verification base before the first batch, restoring
  * exactly the state the crash lost (admissions are idempotent: re-feeding
  * an admitted doc is simply rejected). Without it a restarted stream would
  * re-admit content accepted before the crash.
  *
  * Driver state is bounded and explicit: the filter bytes (sized by
  * `expectedRows`, which must include admission headroom) plus one collected
  * long per admitted document per batch — the same driver-residency contract
  * as `stat.bloomFilter` itself. The serialized filter literal is re-used
  * across batches and only re-built after a batch that actually admitted
  * something — a mostly-duplicate stream never re-serializes. At
  * 10B-document scale, shard the filter by fingerprint prefix and rebuild
  * from the stored corpus on a schedule; the per-batch protocol here does
  * not change.
  */
object DocIngest {

  def bloomIngestStream(docs: DataFrame, corpus: DataFrame,
                        expectedRows: Long, fpp: Double = 0.01,
                        maxBroadcastFps: Long = 4L << 20,
                        priorAdmitted: Option[DataFrame] = None)
                       (onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    val bf = Dedup.corpusFingerprintBloomFilter(corpus, expectedRows, fpp)
    // static corpus fingerprints, materialized once for every batch's
    // verification scan; a restart's prior admissions fold in here AND
    // into the filter, rebuilding the lost cross-batch state
    val corpusFps = Dedup.fingerprint64Of(corpus).select("fp64").localCheckpoint()
    // admitted-fps deltas: each micro-batch's admissions materialize ONCE
    // (their own localCheckpoint) and the verification base is the LAZY
    // union of corpus + deltas — re-checkpointing the cumulative union per
    // batch would re-materialize every prior admission every batch
    // (quadratic in total admissions); this keeps total materialization
    // linear, at the cost of a union plan one node wider per batch
    var deltas: List[DataFrame] = priorAdmitted.map { prior =>
      val fps = Dedup.fingerprint64Of(prior).select("fp64").localCheckpoint()
      fps.collect().foreach(r => if (!r.isNullAt(0)) bf.putLong(r.getLong(0)))
      fps
    }.toList
    var filterBytes = Dedup.serializeBloom(bf)

    docs.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], batchId: Long) =>
        val withFp = Dedup.fingerprint64Of(batch.toDF)
        // self-dedup groups NON-NULL fingerprints only: null-text rows are
        // each their own document (null keys never join in the anti-join
        // form, and groupBy would wrongly collapse them into one group)
        val firsts = withFp.filter(col("fp64").isNotNull)
          .groupBy(col("fp64")).agg(min(col("doc_id")).as("doc_id"))
          .unionByName(withFp.filter(col("fp64").isNull)
            .select(col("fp64"), col("doc_id")))
        val verifyBase = (corpusFps :: deltas).reduce(_ union _)
        val admitted = Dedup.bloomAdmitIds(verifyBase, firsts, filterBytes, maxBroadcastFps)
          .localCheckpoint()
        val newFps = admitted.select("fp64").collect()
          .collect { case r if !r.isNullAt(0) => r.getLong(0) }
        if (newFps.nonEmpty) {
          newFps.foreach(bf.putLong)
          filterBytes = Dedup.serializeBloom(bf)
          deltas = admitted.select("fp64") :: deltas
        }
        onBatch(batch.toDF.join(admitted.select("doc_id"), Seq("doc_id")), batchId)
    }.start()
  }
}
