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
  * idempotently per `batchId` as usual with foreachBatch. The per-batch
  * protocol itself lives in [[DocIngest.BloomIngestState]], which other
  * hosts (a batch backfill loop, a spec) can drive directly.
  *
  * RESTART CONTRACT: the cross-batch state (filter + admitted deltas) lives
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

  /** The cross-batch dedup state and per-batch admission protocol, hoisted
    * out of the stream host so it is testable without a streaming harness
    * and reusable by non-streaming ingest loops.
    *
    * Verification-base shape: admitted-fps deltas each materialize ONCE
    * (their own localCheckpoint) and the base is the LAZY union of
    * corpus + deltas — re-checkpointing the cumulative union per batch
    * would re-materialize every prior admission every batch (quadratic in
    * total admissions). Left unbounded, though, the union grows one plan
    * arm per admitting batch and per-batch ANALYSIS cost eventually
    * dominates a months-long stream — so every `compactEvery` admitting
    * batches the delta list folds into one fresh checkpoint. Per-batch
    * plan width stays ≤ compactEvery + 1 arms forever; total
    * re-materialization is one extra copy of the (tiny, 8-byte-per-doc)
    * admission fingerprints per compaction, never the corpus.
    *
    * Saturation: the filter was sized for `expectedRows`; admissions past
    * that headroom degrade fpp toward 1, which silently turns every batch
    * into the broadcast-verify (or, past `maxBroadcastFps`, the full
    * shuffle anti-join the tier exists to avoid). Correctness never
    * depends on the filter, so occupancy crossing 80% logs a LOUD warning —
    * and once inserts actually reach the sizing, the state REBUILDS the
    * filter itself: a fresh filter sized with doubled headroom, filled from
    * the fingerprint union the state already maintains (corpus + admitted
    * deltas — one distributed aggregate over 8-byte fingerprints, no text
    * re-fingerprinting, no driver materialization of the corpus). The
    * broadcast route therefore keeps serving long-running streams instead
    * of degrading to the shuffle anti-join the tier exists to avoid;
    * spec-pinned by driving admissions past the sizing and asserting the
    * next batch still routes broadcast with an fpp-level maybe set.
    */
  final class BloomIngestState(corpus: DataFrame, expectedRows: Long,
                               fpp: Double = 0.01,
                               maxBroadcastFps: Long = 4L << 20,
                               compactEvery: Int = 16,
                               priorAdmitted: Option[DataFrame] = None) {
    require(compactEvery >= 2,
      s"compactEvery=$compactEvery would re-checkpoint (nearly) every batch — the quadratic this tier avoids")
    private val log = org.slf4j.LoggerFactory.getLogger(getClass)
    // current sizing — doubles on every saturation rebuild
    private var sizedFor: Long = expectedRows
    private var bf = Dedup.corpusFingerprintBloomFilter(corpus, expectedRows, fpp)
    // static corpus fingerprints, materialized once for every batch's
    // verification scan
    private val corpusFps = Dedup.fingerprint64Of(corpus).select("fp64").localCheckpoint()
    // row count, not distinct — duplicate contents overestimate occupancy,
    // which only makes the saturation warning fire early (safe side)
    private var inserted: Long =
      corpusFps.filter(col("fp64").isNotNull).count()
    private var saturationWarned = false
    private var deltas: List[DataFrame] = priorAdmitted.map { prior =>
      val fps = Dedup.fingerprint64Of(prior).select("fp64").localCheckpoint()
      val longs = fps.collect().collect { case r if !r.isNullAt(0) => r.getLong(0) }
      longs.foreach(bf.putLong)
      noteInserted(longs.length.toLong)
      fps
    }.toList
    private var filterBytes = Dedup.serializeBloom(bf)

    private def noteInserted(n: Long): Unit = {
      inserted += n
      if (!saturationWarned && inserted >= sizedFor * 8 / 10) {
        saturationWarned = true
        log.warn(s"bloom ingest filter at ~$inserted of sizedFor=$sizedFor " +
          "inserts (>=80%): fpp is degrading; the filter will be rebuilt with " +
          "doubled headroom when inserts reach the sizing.")
      }
    }

    /** Saturated-filter rebuild: re-size with doubled headroom and refill
      * from the maintained fingerprint union (corpus + admitted deltas).
      * Runs as one distributed bloom aggregate over 8-byte fingerprints —
      * the corpus text is never re-read, nothing corpus-sized reaches the
      * driver beyond the filter bitmap itself (the same residency contract
      * as the original build).
      */
    private def rebuildIfSaturated(): Unit = {
      if (inserted >= sizedFor) {
        sizedFor = math.max(inserted * 2, sizedFor * 2)
        val allFps = (corpusFps :: deltas.map(_.select("fp64"))).reduce(_ union _)
        bf = Dedup.fpsBloomFilter(allFps, sizedFor, fpp)
        filterBytes = Dedup.serializeBloom(bf)
        saturationWarned = false
        rebuilds += 1
        log.info(s"bloom ingest filter rebuilt: $inserted inserts, new sizing $sizedFor")
      }
    }

    /** Rebuild count + current sizing + last routing decision
      * (maybe-set size, took-broadcast-route) — observability for specs and
      * stream monitors.
      */
    private var rebuilds: Int = 0
    private var lastRouteState: Option[(Long, Boolean)] = None
    def rebuildCount: Int = rebuilds
    def currentSizing: Long = sizedFor
    def lastRoute: Option[(Long, Boolean)] = lastRouteState

    /** Plan arms in the verification base (corpus + pending deltas) —
      * bounded by `compactEvery + 1` for the life of the stream; spec-pinned.
      */
    def verifyArms: Int = 1 + deltas.length

    /** Run one batch through self-dedup + Bloom routing + exact verify,
      * fold its admissions into the cross-batch state, and return the
      * admitted (fp64, doc_id) rows (materialized).
      */
    def admitBatch(batch: DataFrame): DataFrame = {
      rebuildIfSaturated()
      val withFp = Dedup.fingerprint64Of(batch)
      // self-dedup groups NON-NULL fingerprints only: null-text rows are
      // each their own document (null keys never join in the anti-join
      // form, and groupBy would wrongly collapse them into one group)
      val firsts = withFp.filter(col("fp64").isNotNull)
        .groupBy(col("fp64")).agg(min(col("doc_id")).as("doc_id"))
        .unionByName(withFp.filter(col("fp64").isNull)
          .select(col("fp64"), col("doc_id")))
      val verifyBase = (corpusFps :: deltas).reduce(_ union _)
      val admitted = Dedup.bloomAdmitIds(verifyBase, firsts, filterBytes,
          maxBroadcastFps,
          onRoute = (n, bc) => lastRouteState = Some((n, bc)))
        .localCheckpoint()
      val newFps = admitted.select("fp64").collect()
        .collect { case r if !r.isNullAt(0) => r.getLong(0) }
      if (newFps.nonEmpty) {
        newFps.foreach(bf.putLong)
        noteInserted(newFps.length.toLong)
        filterBytes = Dedup.serializeBloom(bf)
        deltas = admitted.select("fp64") :: deltas
        if (deltas.length >= compactEvery) {
          // fold the list into ONE checkpoint; the dropped frames' blocks
          // are reference-cleaned by the ContextCleaner once unreachable
          deltas = List(deltas.reduce(_ union _).localCheckpoint())
        }
      }
      admitted
    }
  }

  def bloomIngestStream(docs: DataFrame, corpus: DataFrame,
                        expectedRows: Long, fpp: Double = 0.01,
                        maxBroadcastFps: Long = 4L << 20,
                        priorAdmitted: Option[DataFrame] = None,
                        compactEvery: Int = 16)
                       (onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    val state = new BloomIngestState(corpus, expectedRows, fpp,
      maxBroadcastFps, compactEvery, priorAdmitted)
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], batchId: Long) =>
        val admitted = state.admitBatch(batch.toDF)
        onBatch(batch.toDF.join(admitted.select("doc_id"), Seq("doc_id")), batchId)
    }.start()
  }
}
