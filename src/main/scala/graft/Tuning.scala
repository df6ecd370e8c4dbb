package graft

import org.apache.spark.sql.SparkSession

/** Shared partitioning heuristics. */
object Tuning {

  /** Fan-out partition count for compute-bound stages — pair loops,
    * band-key passes, broadcast-join fan-out chains: 2× the executor cores
    * with a floor of 8. Used as an EXPLICIT `repartition(n, ...)` count
    * rather than relying on `spark.sql.shuffle.partitions`: these stages
    * are compute-bound, not byte-bound, and AQE (which only sees shuffle
    * bytes) would coalesce a small shuffle onto one core and serialize the
    * downstream loop.
    */
  def fanout(spark: SparkSession): Int =
    math.max(spark.sparkContext.defaultParallelism * 2, 8)

  /** Run independent Spark actions concurrently and return their results
    * in input order — the standard concurrent-actions pattern: the
    * scheduler interleaves the subtrees' tasks across free executor slots,
    * so wall time approaches the slowest subtree instead of the sum. Used
    * by the verification gates whose invariant arms (e.g. four ANN tiers,
    * two CC passes) are independent until the final assembly join: each
    * thunk materializes one deterministic subtree (typically via
    * `localCheckpoint()`), so results are submission-order-independent.
    * On a real cluster the same submission shape fills otherwise-idle
    * executors during each arm's narrow stages. Any thunk failure
    * propagates (no silent partial gates); the pool never outlives the
    * call.
    */
  def concurrently[T](thunks: Seq[() => T]): Seq[T] = {
    if (thunks.lengthCompare(2) < 0) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val fs = thunks.map(t => scala.concurrent.Future(t()))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
  }

  /** Deterministic scratch directory for an entry's persisted artifacts,
    * keyed by a sanitized tag of the data directory. ONE sanitization rule
    * shared by every module (Similarity's IVF index, Bpe's frozen table,
    * ColumnarIo's format round trips, Layout's compaction): a divergence
    * would silently change which scratch dir an entry hits, and two data
    * dirs sanitizing to the same tag would collide.
    */
  def scratchDirFor(prefix: String, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${sys.props("java.io.tmpdir")}/$prefix/$tag"
  }

  /** Memory-aware fan-out for ARRAY-HEAVY rows (shingle-hash sets, exploded
    * band keys, embeddings): the cores-only count above keeps every core
    * busy but says nothing about per-partition bytes — at 2×cores a 1 TB
    * shingle pass would hand each task tens of GB. Given the stage's
    * estimated materialized payload (same caller-supplied estimate style as
    * [[graft.operators.Dedup.blockCount]]: row count × average payload, from
    * a cheap probe or a maintained counter; 0 = unknown), the count is
    * raised until each partition stays under `taskBudgetBytes`. Never
    * returns less than the cores-only fan-out, so small inputs keep the
    * exact previous behavior.
    */
  def fanout(spark: SparkSession, stageBytes: Long,
             taskBudgetBytes: Long = 256L << 20): Int = {
    val byMemory =
      if (stageBytes <= 0) 0L
      else math.ceil(stageBytes.toDouble / taskBudgetBytes).toLong
    // backstop: 2^20 partitions ≈ 256 TB of stage payload at the default
    // budget — past that the caller should be blocking/banding, not fanning
    math.max(fanout(spark).toLong, byMemory).min(1L << 20).toInt
  }

  /** Storage level for loop-invariant pinned relations (the symmetrized
    * edge list an iterative graph operator re-reads every round): DISK_ONLY
    * once the relation is big enough to crowd the unified pool's protected
    * storage region, plain MEMORY_AND_DISK below that. The sf10 probe
    * motivated DISK_ONLY (a ~2 GB deserialized edge pin on a 16 GB heap was
    * half of graph_lpa_converged's UNABLE_TO_ACQUIRE_MEMORY), but pinning a
    * 13 MB sf0.1 edge list to disk taxes every round with a serialize +
    * disk round trip the small case never needed — measured +30-120% on the
    * whole graph family. The cutover is sized from the plan's estimated
    * bytes against a budget derived from the ACTUAL heap
    * (`spark.graft.pin.memBudgetFraction`, default 0.05 — at 16 GB that is
    * ~800 MB, so the sf10 shape still goes to disk and every battery scale
    * stays in memory), not a constant tuned for either environment.
    */
  def pinLevel(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.storage.StorageLevel = {
    val frac = df.sparkSession.conf
      .getOption("spark.graft.pin.memBudgetFraction")
      .map(_.toDouble).getOrElse(0.05)
    val budget = (Runtime.getRuntime.maxMemory * frac).toLong
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est > budget) org.apache.spark.storage.StorageLevel.DISK_ONLY
    else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
  }

  /** Eagerly pin a relation whose PARTITIONING later plans must see — the
    * loop-invariant side of an iterative per-round join, pre-partitioned by
    * the join key so every round reuses the exchange. Under AQE the
    * checkpoint's `LogicalRDD` records `UnknownPartitioning` (the adaptive
    * plan hides the final exchange's partitioning), so the join re-shuffles
    * the pin every round anyway — verified with an executed-plan probe
    * (plans/r16/graph_lpa_round_*.txt). Materializing the checkpoint with
    * AQE off for just this one query keeps the `HashPartitioning` visible;
    * the storage level is still the size-adaptive [[pinLevel]]. The conf
    * flip is scoped to the materialization (the pinned plan executes
    * eagerly inside) and restored in a finally — callers run it before any
    * concurrent arms are launched.
    */
  def pinPartitioned(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.adaptive.enabled"
    val old = conf.get(key, "true")
    conf.set(key, "false")
    try df.localCheckpoint(true, pinLevel(df))
    finally conf.set(key, old)
  }

  /** Release the storage blocks behind a localCheckpoint'd frame that no
    * later computation will read again. Iterative operators (LPA,
    * pagerank, connected components, BFS/SSSP) pin one relation per round;
    * without an explicit release every superseded round's blocks sit in
    * the unified pool until the JVM GCs the DataFrame reference AND the
    * async ContextCleaner drains — at sf10 that latency alone starved
    * execution memory mid-round (UNABLE_TO_ACQUIRE_MEMORY in
    * graph_lpa_converged, 16 GB heap). Resolves the materialized RDD via
    * the checkpointed plan's LogicalRDD node (reflection: the class is
    * private[sql]); silently a no-op on any other plan shape, so a caller
    * cannot free something that was never pinned. NOTE a truncated-lineage
    * frame is unrecomputable once freed — only call on relations the
    * operator provably never touches again (the round it superseded).
    */
  def freeCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    try {
      val plan = df.queryExecution.logical
      if (plan.getClass.getSimpleName == "LogicalRDD")
        plan.getClass.getMethods
          .find(m => m.getName == "rdd" && m.getParameterCount == 0)
          .map(_.invoke(plan))
          .collect { case r: org.apache.spark.rdd.RDD[_] => r }
          .foreach(_.unpersist(blocking = false))
    } catch { case _: Throwable => () } // best-effort: leak, don't break
}
