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
  * RESTART CONTRACT: with a `stateDir`, the cross-batch state is DURABLE —
  * every admitting batch lands its admitted `(fp64, doc_id)` rows as a
  * rename-committed parquet delta BEFORE the sink callback sees them, and
  * the filter bitmap itself snapshots (sizing + insert count + covered
  * delta seq + bitmap bytes, rename-committed, older snapshots pruned)
  * every `snapshotEveryAdmits` admitting batches. A restarted state
  * restores from the latest snapshot (skipping the corpus filter build — at
  * 100 TB the expensive startup scan), folds only the deltas the snapshot
  * hadn't covered, and REPLAYS a retried batchId from its persisted delta
  * without re-mutating state — so foreachBatch's retry of the last batch
  * re-delivers exactly the admitted set the crash interrupted instead of
  * recomputing (and possibly re-admitting) it. Without a `stateDir` the
  * state is process-local and the caller passes the durable sink's
  * already-admitted documents as `priorAdmitted` — they are folded into the
  * filter and verification base before the first batch (admissions are
  * idempotent: re-feeding an admitted doc is simply rejected).
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
                               priorAdmitted: Option[DataFrame] = None,
                               stateDir: Option[String] = None,
                               snapshotEveryAdmits: Int = 4) {
    require(compactEvery >= 2,
      s"compactEvery=$compactEvery would re-checkpoint (nearly) every batch — the quadratic this tier avoids")
    require(snapshotEveryAdmits >= 1, s"snapshotEveryAdmits=$snapshotEveryAdmits")
    private val log = org.slf4j.LoggerFactory.getLogger(getClass)
    private val durable = stateDir.map(d => new DurableBloomState(corpus.sparkSession, d))
    private val snapshot = durable.flatMap(_.readLatestSnapshot())
    // current sizing — doubles on every saturation rebuild
    private var sizedFor: Long = snapshot.map(_.sizedFor).getOrElse(expectedRows)
    // a restored snapshot skips the corpus filter build entirely — at scale
    // that startup corpus scan is exactly what the snapshot exists to avoid
    private var bf = snapshot.map(_.filter)
      .getOrElse(Dedup.corpusFingerprintBloomFilter(corpus, expectedRows, fpp))
    // static corpus fingerprints, materialized once for every batch's
    // verification scan
    private val corpusFps = Dedup.fingerprint64Of(corpus).select("fp64").localCheckpoint()
    // row count, not distinct — duplicate contents overestimate occupancy,
    // which only makes the saturation warning fire early (safe side)
    private var inserted: Long = snapshot.map(_.inserted)
      .getOrElse(corpusFps.filter(col("fp64").isNotNull).count())
    private var saturationWarned = false
    // highest delta seq whose fingerprints are already IN the filter
    // (either via the snapshot or folded below/at admit time)
    private var lastSeqFolded: Long = snapshot.map(_.coveredSeq).getOrElse(-1L)
    // delta seqs found on disk at construction — a retried batchId among
    // them is REPLAYED from its persisted delta, never recomputed
    private val restoredSeqs = scala.collection.mutable.Set.empty[Long]
    private var deltas: List[DataFrame] = {
      val persisted = durable.toList.flatMap { d =>
        d.listDeltaSeqs().map { seq =>
          restoredSeqs += seq
          val fps = d.readDelta(seq).select("fp64").localCheckpoint()
          if (seq > lastSeqFolded) {
            val longs = fps.collect().collect { case r if !r.isNullAt(0) => r.getLong(0) }
            longs.foreach(bf.putLong)
            noteInserted(longs.length.toLong)
          }
          fps
        }
      }
      if (restoredSeqs.nonEmpty)
        lastSeqFolded = math.max(lastSeqFolded, restoredSeqs.max)
      val prior = priorAdmitted.map { p =>
        val fps = Dedup.fingerprint64Of(p).select("fp64").localCheckpoint()
        val longs = fps.collect().collect { case r if !r.isNullAt(0) => r.getLong(0) }
        longs.foreach(bf.putLong)
        noteInserted(longs.length.toLong)
        fps
      }.toList
      prior ++ persisted
    }
    private var filterBytes = Dedup.serializeBloom(bf)
    private var nextSeq: Long =
      (lastSeqFolded :: restoredSeqs.toList).max + 1
    private var admitsSinceSnapshot = 0

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

    /** Delta seqs restored from the durable store at construction — exactly
      * the batch ids [[admitBatch]] will replay instead of recomputing.
      */
    def replayableSeqs: Set[Long] = restoredSeqs.toSet

    /** Whether a restored filter snapshot skipped the corpus filter build. */
    def restoredFromSnapshot: Boolean = snapshot.isDefined

    /** Run one batch through self-dedup + Bloom routing + exact verify,
      * fold its admissions into the cross-batch state, and return the
      * admitted (fp64, doc_id) rows (materialized).
      *
      * With a `stateDir`, `seq` is the durable identity of the batch (the
      * streaming host passes `batchId`): a seq whose delta already exists on
      * disk is a RETRY — its persisted admitted rows are replayed verbatim,
      * state untouched — and a fresh admitting seq lands its delta on disk
      * before this method returns, so the sink callback never sees rows the
      * state could forget. Callers without a natural seq let the state
      * assign a monotonic one.
      */
    def admitBatch(batch: DataFrame): DataFrame = admitBatch(batch, None)

    def admitBatch(batch: DataFrame, seq: Option[Long]): DataFrame =
      seq.filter(restoredSeqs.contains) match {
        case Some(s) =>
          log.info(s"bloom ingest replaying persisted delta for retried seq $s")
          durable.get.readDelta(s).select(col("doc_id"), col("fp64"))
            .localCheckpoint()
        case None => admitFresh(batch, seq)
      }

    private def admitFresh(batch: DataFrame, seq: Option[Long]): DataFrame = {
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
      val admittedAny = newFps.nonEmpty || !admitted.limit(1).isEmpty
      val mySeq = seq.getOrElse(nextSeq)
      nextSeq = math.max(nextSeq, mySeq + 1)
      if (admittedAny)
        // durability BEFORE state mutation and before the caller's sink sees
        // the rows: a crash after this point replays the identical admitted
        // set from disk on retry instead of recomputing it
        durable.foreach(_.writeDelta(mySeq, admitted))
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
      if (admittedAny) {
        lastSeqFolded = math.max(lastSeqFolded, mySeq)
        admitsSinceSnapshot += 1
        if (admitsSinceSnapshot >= snapshotEveryAdmits) {
          durable.foreach(_.writeSnapshot(sizedFor, inserted, lastSeqFolded, filterBytes))
          admitsSinceSnapshot = 0
        }
      }
      admitted
    }
  }

  def bloomIngestStream(docs: DataFrame, corpus: DataFrame,
                        expectedRows: Long, fpp: Double = 0.01,
                        maxBroadcastFps: Long = 4L << 20,
                        priorAdmitted: Option[DataFrame] = None,
                        compactEvery: Int = 16,
                        stateDir: Option[String] = None)
                       (onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    val state = new BloomIngestState(corpus, expectedRows, fpp,
      maxBroadcastFps, compactEvery, priorAdmitted, stateDir)
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[Row], batchId: Long) =>
        val admitted = state.admitBatch(batch.toDF, Some(batchId))
        onBatch(batch.toDF.join(admitted.select("doc_id"), Seq("doc_id")), batchId)
    }.start()
  }

  /** The Bloom ingest's durable-state store: admitted-fingerprint deltas
    * (one rename-committed parquet dir per admitting batch, named by the
    * batch's seq) plus periodic filter snapshots (sizing + insert count +
    * highest delta seq the bitmap covers + the bitmap bytes, also
    * rename-committed, older snapshots pruned after a successful write).
    * Every path goes through the Hadoop FS API, so the same store works on
    * HDFS/object-store checkpoint locations, and every commit is a single
    * rename — a crash at any point leaves either the old state or the new
    * state, never a torn file (the reader ignores `tmp/`). Deltas are
    * append-only: folding them into the corpus on a schedule (and clearing
    * the store) is the same offline compaction the in-memory tier documents.
    */
  private[streaming] final class DurableBloomState(spark: org.apache.spark.sql.SparkSession,
                                                   rootDir: String) {
    import org.apache.hadoop.fs.Path
    private val root = new Path(rootDir)
    private def fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    private val deltaDir = new Path(root, "deltas")
    private val filterDir = new Path(root, "filter")
    private val tmpDir = new Path(root, "tmp")
    fs.mkdirs(deltaDir); fs.mkdirs(filterDir); fs.mkdirs(tmpDir)

    private def deltaPath(seq: Long) = new Path(deltaDir, f"delta_$seq%012d")
    private def snapPath(seq: Long) = new Path(filterDir, f"snap_$seq%012d.bin")

    def listDeltaSeqs(): Seq[Long] =
      fs.listStatus(deltaDir).toSeq.map(_.getPath.getName)
        .collect { case n if n.startsWith("delta_") => n.stripPrefix("delta_").toLong }
        .sorted

    def readDelta(seq: Long): DataFrame =
      spark.read.parquet(deltaPath(seq).toString)

    def writeDelta(seq: Long, admitted: DataFrame): Unit = {
      val dst = deltaPath(seq)
      if (!fs.exists(dst)) {
        val tmp = new Path(tmpDir, s"delta_${seq}_${System.nanoTime()}")
        admitted.write.mode("overwrite").parquet(tmp.toString)
        if (!fs.rename(tmp, dst)) {
          fs.delete(tmp, true)
          if (!fs.exists(dst))
            throw new java.io.IOException(s"bloom state delta commit failed: $dst")
        }
      }
    }

    private val SnapMagic = 0x47424C4FL // "GBLO"

    def writeSnapshot(sizedFor: Long, inserted: Long, coveredSeq: Long,
                      filterBytes: Array[Byte]): Unit = {
      val tmp = new Path(tmpDir, s"snap_${coveredSeq}_${System.nanoTime()}.bin")
      val out = new java.io.DataOutputStream(fs.create(tmp, true))
      try {
        out.writeLong(SnapMagic); out.writeInt(1)
        out.writeLong(sizedFor); out.writeLong(inserted); out.writeLong(coveredSeq)
        out.writeInt(filterBytes.length); out.write(filterBytes)
      } finally out.close()
      val dst = snapPath(coveredSeq)
      if (fs.rename(tmp, dst) || fs.exists(dst)) {
        // prune older snapshots only after the new one is committed
        fs.listStatus(filterDir).foreach { st =>
          if (st.getPath.getName.startsWith("snap_") && st.getPath != dst &&
              st.getPath.getName < dst.getName)
            fs.delete(st.getPath, false)
        }
      } else fs.delete(tmp, false)
    }

    final case class Snapshot(sizedFor: Long, inserted: Long, coveredSeq: Long,
                              filter: org.apache.spark.util.sketch.BloomFilter)

    def readLatestSnapshot(): Option[Snapshot] = {
      val snaps = fs.listStatus(filterDir).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("snap_")).sortBy(_.getName)
      snaps.lastOption.flatMap { p =>
        val in = new java.io.DataInputStream(fs.open(p))
        try {
          if (in.readLong() != SnapMagic || in.readInt() != 1) None
          else {
            val sizedFor = in.readLong(); val inserted = in.readLong()
            val coveredSeq = in.readLong()
            val n = in.readInt()
            val bytes = new Array[Byte](n)
            in.readFully(bytes)
            Some(Snapshot(sizedFor, inserted, coveredSeq,
              org.apache.spark.util.sketch.BloomFilter
                .readFrom(new java.io.ByteArrayInputStream(bytes))))
          }
        } catch { case _: java.io.IOException => None }
        finally in.close()
      }
    }
  }
}
