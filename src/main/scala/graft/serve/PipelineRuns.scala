package graft.serve

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.graph.{Model, ModelGraph}

/** In-engine analog of the reference's pipeline trigger/poll surface
  * (Frontend/app.py:312-374: POST `dagRuns` with a conf payload → a
  * `dag_run_id`, then GET its `state` until `success`/`failed`, with the
  * per-task states the Airflow UI shows). The HTTP transport is
  * out-of-engine by design (zero-egress build; the REST layer is a thin
  * adapter over exactly this registry); the SEMANTICS live here:
  *
  *   - [[trigger]] enqueues an async [[ModelGraph]] run with a conf map and
  *     returns a stable run id immediately;
  *   - [[status]] is the poll: run state (`queued → running →
  *     success|failed`), per-model states (`queued → running → success`),
  *     the conf echoed back, and the failure message on error;
  *   - [[awaitTerminal]] is the reference's polling loop, with a timeout
  *     instead of `while True`.
  *
  * Runs execute on a daemon pool; each wave's models still parallelize
  * inside [[ModelGraph.run]] on the shared SparkSession, so a trigger is
  * "submit and watch", never a blocked caller.
  */
final class PipelineRuns(maxRetainedRuns: Int = 1000) {
  import PipelineRuns._

  private val runs = new ConcurrentHashMap[String, RunStatus]()
  private val counter = new AtomicLong(0)

  /** Evict the oldest TERMINAL runs beyond the retention cap — a long-lived
    * service otherwise grows the registry without bound (the Airflow analog
    * prunes dag-run history the same way). In-flight runs never evict.
    */
  private def evictBeyondCap(): Unit = {
    val terminal = runs.values().toArray(Array.empty[RunStatus])
      .filter(s => Terminal(s.state)).sortBy(seqOf)
    val excess = runs.size() - maxRetainedRuns
    if (excess > 0) terminal.take(excess).foreach(s => runs.remove(s.runId))
  }
  private val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "pipeline-run"); t.setDaemon(true); t
  })

  private def update(runId: String)(f: RunStatus => RunStatus): Unit =
    runs.compute(runId, (_, s) => f(s))

  /** Submit an async run of `graph` over `sources`; returns the run id. */
  def trigger(graph: ModelGraph, sources: Map[String, DataFrame],
              conf: Map[String, String] = Map.empty,
              materialize: (Model, DataFrame) => DataFrame = (_, df) => df)
             (implicit spark: SparkSession): String = {
    val runId = f"run_${counter.incrementAndGet()}%05d"
    runs.put(runId, RunStatus(runId, "queued", conf,
      graph.models.map(_.name -> "queued").toMap, None))
    evictBeyondCap()
    // wrap each model: build marks it running, materialization marks success
    val wrapped = new ModelGraph(graph.models.map { m =>
      m.copy(build = reg => {
        update(runId)(s => s.copy(models = s.models + (m.name -> "running")))
        m.build(reg)
      })
    })
    pool.submit(new Runnable {
      def run(): Unit = {
        update(runId)(_.copy(state = "running"))
        try {
          wrapped.run(sources, (m, df) => {
            val out = materialize(m, df)
            update(runId)(s => s.copy(models = s.models + (m.name -> "success")))
            out
          })(spark)
          update(runId)(_.copy(state = "success"))
        } catch { case e: Throwable =>
          update(runId)(_.copy(state = "failed",
            error = Some(e.getMessage match { case null => e.toString; case m => m })))
        }
      }
    })
    runId
  }

  /** Poll one run; None for an unknown id (the 404 of the REST analog). */
  def status(runId: String): Option[RunStatus] = Option(runs.get(runId))

  /** All runs, newest first — the dagRuns listing. Ordered by the numeric
    * trigger sequence, not the id string: the zero-padding is 5 digits, so a
    * lexicographic sort would misorder run 100000 after run 10000.
    */
  def list(): Seq[RunStatus] =
    runs.values().toArray(Array.empty[RunStatus]).sortBy(seqOf).reverse.toSeq

  /** The reference's polling loop with a deadline: returns the first
    * terminal status, or the latest non-terminal one if the timeout lapses.
    */
  def awaitTerminal(runId: String, timeoutMs: Long = 60000,
                    pollMs: Long = 50): RunStatus = {
    val deadline = System.nanoTime() + TimeUnit.MILLISECONDS.toNanos(timeoutMs)
    var s = status(runId).getOrElse(
      throw new NoSuchElementException(s"unknown run $runId"))
    while (!Terminal(s.state) && System.nanoTime() < deadline) {
      Thread.sleep(pollMs)
      s = status(runId).get
    }
    s
  }
}

object PipelineRuns {
  val Terminal: Set[String] = Set("success", "failed")

  /** Numeric trigger sequence encoded in the run id. */
  private def seqOf(s: RunStatus): Long = s.runId.stripPrefix("run_").toLong

  /** One run's poll answer: overall state, per-model states, conf echo,
    * and the error message when failed.
    */
  final case class RunStatus(runId: String, state: String,
                             conf: Map[String, String],
                             models: Map[String, String],
                             error: Option[String])
}
