package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The base+delta segment-store protocol shared by the persisted ANN index
  * (`Similarity` — base dir `segments`, partitioned by `cell`) and the
  * persisted text index (`Retrieval` — base dir `postings`, partitioned by
  * `tokb`), extracted in r14 so the two lifecycles cannot drift:
  *
  *  - bulk appends write `delta`, streaming ingest writes `delta_b<id>`
  *    per micro-batch — immutable partitioned parquet dirs next to the
  *    base, discovered by directory listing (how an object-store-resident
  *    index grows: new files per ingest cycle, never a rewrite);
  *  - [[compactDeltas]] periodically folds live deltas into the base to
  *    bound file-listing overhead. A multi-directory store cannot flip
  *    atomically with renames alone (swapping the base BEFORE deleting
  *    deltas double-counts them; deleting deltas first loses them if the
  *    swap never lands), so the commit point is ONE atomic rename whose
  *    payload carries its own invalidation list: the folded store is
  *    staged in `<base>_compacting` together with a [[FoldedManifest]]
  *    naming the deltas it absorbed, the old base swaps out to
  *    `<base>_old`, and the stage renames into place — from that instant
  *    readers see the folded base and skip exactly the manifest-listed
  *    deltas, so the post-commit deletes are pure cleanup that can crash
  *    at any point without corrupting or double-counting;
  *  - [[resolveDirs]] names the consistent (base ++ live-delta) view at
  *    EVERY crash point of that protocol;
  *  - [[scrubFoldedDelta]] keeps appends safe after a crashed compaction
  *    cleanup: a lingering manifest entry must not blacklist a fresh
  *    segment reusing the name (the new rows would be invisible to
  *    searches and deleted as "orphans" by the next compaction).
  */
object DeltaStore {

  /** Name of the manifest a compacted base carries: the delta directories
    * it folded, one per line. The underscore prefix makes the parquet
    * reader skip it (same convention as `_SUCCESS`).
    */
  val FoldedManifest = "_FOLDED_DELTAS"

  def readFoldedManifest(fs: FileSystem, path: String): Set[String] = {
    val p = new Path(path)
    if (!fs.exists(p)) Set.empty
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().map(_.trim).filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  /** The consistent (base ++ live-delta) view of a possibly mid-compaction
    * store:
    *   - `<base>` present → authoritative; live deltas are those NOT named
    *     in its manifest;
    *   - `<base>` absent, deltas present → crash between swap-out and
    *     commit: `<base>_old` plus the deltas;
    *   - `<base>` absent, no deltas → `<base>_compacting` holds the
    *     fully-folded store.
    */
  def resolveDirs(s: SparkSession, indexDir: String, base: String): Seq[String] = {
    val fs = AtomicPublish.fsFor(s, indexDir)
    def deltasUnder(baseDir: String): Seq[String] = {
      val folded = readFoldedManifest(fs, s"$baseDir/$FoldedManifest")
      fs.listStatus(new Path(indexDir)).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("delta"))
        .map(_.getPath.getName).filterNot(folded).sorted
        .map(n => s"$indexDir/$n")
    }
    if (fs.exists(new Path(indexDir, base))) {
      s"$indexDir/$base" +: deltasUnder(s"$indexDir/$base")
    } else {
      val live = deltasUnder(s"$indexDir/${base}_old")
      if (live.nonEmpty) s"$indexDir/${base}_old" +: live
      else Seq(s"$indexDir/${base}_compacting")
    }
  }

  /** Pre-append guard: if a crashed compaction cleanup left `segment` in
    * the folded manifest, scrub the (already-folded) dir and its manifest
    * line before the new segment lands under that name.
    */
  def scrubFoldedDelta(s: SparkSession, indexDir: String, base: String,
                       segment: String): Unit = {
    val fs = AtomicPublish.fsFor(s, indexDir)
    val mfPath = new Path(s"$indexDir/$base/$FoldedManifest")
    val folded = readFoldedManifest(fs, mfPath.toString)
    if (folded(segment)) {
      fs.delete(new Path(s"$indexDir/$segment"), true)
      val rest = folded - segment
      if (rest.isEmpty) fs.delete(mfPath, false)
      else {
        val out = fs.create(mfPath, true)
        try out.write(rest.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
        finally out.close()
      }
    }
  }

  /** Fold every live `delta*` dir into `<base>` and remove the deltas.
    * Rows compose associatively in both stores (per-row cell assignment /
    * per-row postings), so compaction is a pure rewrite: reads return
    * identical results before and after (spec-pinned per store).
    *
    * `preCommit(stageDir, foldedDeltaDirs)` runs after the folded store
    * and its manifest are staged but BEFORE the atomic commit, with the
    * old base and the deltas still intact — the seam for store-specific
    * side-car state that must travel with the fold (the text index merges
    * its per-segment BM25 stats here). A crash inside the hook discards
    * the stage and leaves the old view untouched.
    */
  def compactDeltas(spark: SparkSession, indexDir: String, base: String,
                    partitionCol: String,
                    preCommit: (String, Seq[String]) => Unit = (_, _) => ()): Unit = {
    val fs = AtomicPublish.fsFor(spark, indexDir)
    def p(name: String) = new Path(indexDir, name)
    // recover a crashed prior swap: restore the consistent view under
    // `<base>`, then proceed (or return) from a clean state
    if (!fs.exists(p(base))) {
      val view = resolveDirs(spark, indexDir, base)
      if (view.head.endsWith(s"${base}_old")) {
        fs.delete(p(s"${base}_compacting"), true) // stale, never committed
        AtomicPublish.renameOrThrow(fs, p(s"${base}_old"), p(base))
      } else {
        AtomicPublish.renameOrThrow(fs, p(s"${base}_compacting"), p(base))
        fs.delete(p(s"${base}_old"), true)
      }
    }
    val folded = readFoldedManifest(fs, s"$indexDir/$base/$FoldedManifest")
    val deltas = fs.listStatus(new Path(indexDir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("delta"))
      .map(_.getPath).filterNot(d => folded(d.getName))
    // cleanup debt from a crashed prior run: folded-but-undeleted deltas,
    // the swapped-out base, and the spent manifest (once its dirs are gone
    // it must not linger — a later append reusing a listed name would be
    // silently blacklisted)
    fs.listStatus(new Path(indexDir)).toSeq
      .filter(st => st.isDirectory && folded(st.getPath.getName))
      .foreach(st => fs.delete(st.getPath, true))
    fs.delete(p(s"${base}_old"), true)
    fs.delete(new Path(s"$indexDir/$base/$FoldedManifest"), false)
    if (deltas.isEmpty) return
    val all = (s"$indexDir/$base" +: deltas.map(_.toString))
      .map(q => spark.read.parquet(q)).reduce(_ unionByName _)
    val tmp = p(s"${base}_compacting")
    // cluster on the partition column before the partitioned rewrite:
    // reading base+deltas yields many input splits, and tasks×partitions
    // output files would re-inflate the very store a compaction exists to
    // shrink (the sf10 small-file finding) — one file per partition value
    all.repartition(graft.Tuning.fanout(spark),
        org.apache.spark.sql.functions.col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(tmp.toString)
    val mf = fs.create(new Path(tmp, FoldedManifest), true)
    try mf.write(deltas.map(_.getName).sorted.mkString("\n").getBytes("UTF-8"))
    finally mf.close()
    preCommit(tmp.toString, deltas.map(_.toString))
    AtomicPublish.renameOrThrow(fs, p(base), p(s"${base}_old"))
    AtomicPublish.renameOrThrow(fs, tmp, p(base)) // atomic commit
    deltas.foreach(fs.delete(_, true))            // cleanup: idempotent from here
    fs.delete(p(s"${base}_old"), true)
    fs.delete(new Path(s"$indexDir/$base/$FoldedManifest"), false)
  }

  /** Ratio-triggered auto-compaction: fold iff live-delta bytes exceed
    * `maxRatio` × base bytes. Returns whether a compaction ran.
    *
    * The trigger is sized from the FS LISTING (bytes are proportional to
    * rows at equal schema), so the check itself costs a directory walk,
    * never a Spark job — cheap enough to call after EVERY append. Why a
    * ratio, not a count: each live delta is an extra unpruned listing on
    * every search (the IVF-PQ append_search lane measured 3.2× slope at
    * 10× data vs the compacted store's 2.1×), and the read-amplification
    * a delta causes is proportional to its size relative to the base —
    * a tiny streaming micro-batch shouldn't force a full base rewrite,
    * while a bulk append of 30% of the corpus should fold immediately.
    * At `maxRatio` the steady-state rewrite amortization is ~1/maxRatio
    * bytes written per byte ingested, the classic LSM trade.
    */
  def maybeCompact(spark: SparkSession, indexDir: String, base: String,
                   partitionCol: String, maxRatio: Double = 0.2,
                   preCommit: (String, Seq[String]) => Unit = (_, _) => ()): Boolean = {
    require(maxRatio > 0, s"maxRatio must be positive, got $maxRatio")
    val fs = AtomicPublish.fsFor(spark, indexDir)
    val view = resolveDirs(spark, indexDir, base)
    val (deltaDirs, baseDirs) =
      view.partition(d => new Path(d).getName.startsWith("delta"))
    if (deltaDirs.isEmpty) return false
    def bytes(d: String): Long = {
      val path = new Path(d)
      if (fs.exists(path)) fs.getContentSummary(path).getLength else 0L
    }
    val baseBytes = baseDirs.map(bytes).sum
    val deltaBytes = deltaDirs.map(bytes).sum
    if (deltaBytes.toDouble <= maxRatio * baseBytes) return false
    compactDeltas(spark, indexDir, base, partitionCol, preCommit)
    true
  }
}
