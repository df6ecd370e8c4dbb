package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  *
  * Execution is `write.format("noop")` — the whole plan runs (scan, shuffle,
  * codegen) with a no-op sink; a bare `count()` would let parquet scans
  * shortcut to footer row counts and measure nothing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // list mode: print every entry name and exit — the seam the chunked
    // isolated-JVM battery driver (tools/bench_isolated.py) enumerates
    // from, so the entry list can never drift from the code
    if (sys.env.get("SPARK_GRAFT_LIST").exists(_.nonEmpty)) {
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      return
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Per-entry SQLMetrics capture: the listener collects EVERY successful
    // action's QueryExecution during a timed run — iterative entries (LPA
    // rounds, k-means training, localCheckpoint pins) execute several jobs
    // before the final noop save, and their shuffles are part of the
    // entry's data-volume story. After the run the plans' accumulated
    // metrics (shuffle/spill/scan bytes) are summed into one record; a
    // checkpointed subplan executes once and is read back as an RDD scan,
    // so summing across the QEs never double-counts a shuffle. The
    // ExecutionListenerBus is ASYNC, so the harness polls until the
    // capture buffer stops growing (timing is already recorded by then —
    // the poll can never contaminate a measurement).
    val capturedQes =
      new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.execution.QueryExecution]
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = { capturedQes.add(qe) }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    })
    def awaitMetrics(): Option[Map[String, Long]] = {
      val deadline = System.nanoTime() + 3L * 1000 * 1000 * 1000
      var size = -1
      while (System.nanoTime() < deadline &&
             (capturedQes.isEmpty || capturedQes.size != size)) {
        size = capturedQes.size
        Thread.sleep(50)
      }
      import scala.jdk.CollectionConverters._
      val all = capturedQes.asScala.toSeq
      if (all.isEmpty) None
      else Some(all.map(PlanMetrics.collect)
        .reduce((a, b) => a.map { case (k, v) => k -> (v + b.getOrElse(k, 0L)) }))
    }

    // Warm the JVM/codegen/FS once so q1 doesn't absorb session startup.
    SparkEntry.queries("q1_agg")(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Optional isolation filter (comma-separated names) for root-causing a
    // single entry without the rest of the suite's JVM interference. A
    // blank value (unset-variable interpolation in a wrapper) is treated as
    // unset, and a filter matching nothing fails loudly — a silent empty
    // run would read as a suspiciously green result.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    require(selected.nonEmpty,
      s"SPARK_GRAFT_ONLY matched no queries: ${only.getOrElse(Set.empty).mkString(",")}")
    // Measurement protocol: rounds 3–5 all recorded phantom regressions from
    // in-suite interference (r5: curate_corpus 17.4 s recorded vs 2.2 s
    // isolated). Two causes, both addressed here: (a) entries that
    // `localCheckpoint()` leave blocks in the block manager that squeeze the
    // next entry's execution memory — unpersist them before every timed run;
    // (b) a single sample inherits whatever GC debt the previous entry left —
    // take the min of SPARK_GRAFT_RUNS (default 2) samples after a GC settle.
    // Default 3 samples: the r6 host shows 4-7% steal and ~13/32 effective
    // cores under load, with identical warm work varying up to 8x run-to-run;
    // min-of-2 can still catch two contended samples, min-of-3 rarely does.
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(3).max(1)
    // A failed entry must NEVER be indistinguishable from a fast one: r7's
    // six analysis-broken queries appeared in BENCH_r07.json as 0.06–0.10 s
    // "improvements" because the catch recorded elapsed-to-fail as a timing.
    // Any failed sample now turns the whole entry into an `errors` record
    // (a query that fails even once has no trustworthy timing).
    val results: Seq[(String, Either[String, EntryTiming])] =
      selected.map { case (name, fn) =>
        var err: Option[String] = None
        var metrics: Option[Map[String, Long]] = None
        val times = (1 to runs).flatMap { _ =>
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
          System.gc()
          Thread.sleep(100)
          capturedQes.clear()
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val dt = (System.nanoTime() - t0) / 1e9
            // metrics from the last successful run: data-volume metrics are
            // a pure function of plan × data, identical across repeat runs
            awaitMetrics().foreach(m => metrics = Some(m))
            Some(dt)
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            err = Some(e.toString)
            None
          }
        }
        // cold/warm split (r15 verdict task #7): under the fresh-JVM
        // protocol an entry's FIRST sample conflates codegen/classload
        // warm-up with operator cost (ann_ivfpq_index_build: 26.9 s cold
        // vs 7.3 s warm) — sample 1 is recorded as `cold`, the regression
        // watch reads `queries` = min of the warm samples
        name -> err.toLeft(EntryTiming(
          coldS = times.head,
          warmMinS = if (times.size > 1) times.tail.min else times.head,
          metrics = metrics))
      }
    val line = renderJson(results, sfDir)
    println(line)
    // The record is the gate — make it durable: two consecutive driver
    // captures (BENCH_r05/r06) truncated the stdout tail, hiding ~34 entries
    // including the slowest. Write the same line to a file so the round
    // artifact survives any stdout capture failure.
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    Option(outPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(outPath,
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }

  /** Per-entry timing record: sample 1 (`coldS` — carries whatever
    * codegen/classload warm-up the JVM hasn't paid yet) vs the min of the
    * remaining samples (`warmMinS` — the operator's repeatable cost).
    * With a single sample the two coincide.
    */
  final case class EntryTiming(coldS: Double, warmMinS: Double,
                               metrics: Option[Map[String, Long]])

  /** One-line bench record: successful entries under `queries` (seconds —
    * the WARM minimum; first-sample times ride under `cold` so build
    * entries' codegen warm-up is visible instead of conflated),
    * per-entry data-volume metrics under `metrics` (shuffle/spill/scan
    * bytes from the executed plan's SQLMetrics — the scale witness that
    * survives a noisy host), failed entries under `errors` (message,
    * truncated) with an explicit `error_count` — pure so a spec can pin
    * that a broken entry can never surface as a timing.
    */
  def renderJson(results: Seq[(String, Either[String, EntryTiming])],
                 sf: String): String = {
    val ok = results.collect { case (k, Right(t)) => k -> t.warmMinS }
    val colds = results.collect { case (k, Right(t)) => k -> t.coldS }
    val ms = results.collect { case (k, Right(EntryTiming(_, _, Some(m)))) => k -> m }
    val errs = results.collect { case (k, Left(m)) => k -> m }
    val qs = ok.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val cs = colds.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val mjs = ms.map { case (k, m) =>
      jsonQuote(k) + ":" + m.toSeq.sortBy(_._1)
        .map { case (mk, mv) => s"${jsonQuote(mk)}:$mv" }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val es = errs.map { case (k, m) => s"${jsonQuote(k)}:${jsonQuote(m.take(400))}" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
      s""""cold":$cs,"metrics":$mjs,"errors":$es,""" +
      s""""error_count":${errs.size},"sf":"$sf"}"""
  }

  /** JSON string literal: escapes backslash, quote, and all control chars —
    * exception messages routinely carry newlines and quoted plan fragments.
    */
  def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
