package graft

import org.apache.spark.sql.execution.{QueryExecution, SparkPlan, LeafExecNode}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Per-query SQLMetrics extraction for the bench harness.
  *
  * Wall time is a noisy scale witness on a shared host (three rounds of
  * controls files exist only to argue away host-band interference); the
  * bytes a plan MOVES are not — shuffle bytes written, spill, and files/
  * bytes/rows scanned are deterministic functions of plan × data. This
  * walks the EXECUTED plan (post-AQE) and sums the standard SQLMetric
  * keys, so every bench entry carries a machine-checkable "how much data
  * moved" record alongside its seconds, and a sub-linear bytes slope at
  * 10× data is provable without a quiet host.
  *
  * Metric accumulator values are merged by the DAGScheduler before an
  * action returns, so reading them from the plan after the job completes
  * is exact for successful tasks — no listener-bus race. Traversal must
  * pierce three wrappers whose `children` is empty: AdaptiveSparkPlanExec
  * (the final re-planned tree), QueryStageExec (materialized stages), and
  * ReusedExchangeExec (shared subplans — counted ONCE: reuse means the
  * bytes moved once).
  */
object PlanMetrics {

  /** Every node of the executed plan, descending through AQE wrappers and
    * subqueries; ReusedExchange is NOT expanded (its target is reached via
    * the original exchange — expanding would double-count its metrics).
    */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(n: SparkPlan): Seq[SparkPlan] = {
      // identity-dedup: AQE can surface the same stage object along two
      // paths; metrics must count each physical node exactly once.
      // IdentityHashMap-backed set, not identityHashCode values — hash
      // codes can collide, which would silently drop a subtree's metrics
      if (!seen.add(n)) return Nil
      val next: Seq[SparkPlan] = n match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case _: ReusedExchangeExec    => Nil
        case other => other.children ++ other.subqueries
      }
      n +: next.flatMap(walk)
    }
    walk(p)
  }

  /** Sums the named SQLMetric over all nodes; unset size metrics can sit
    * at their -1 init value, which must read as 0, not subtract.
    */
  private def sumKey(nodes: Seq[SparkPlan], key: String): Long =
    nodes.flatMap(_.metrics.get(key)).map(m => math.max(0L, m.value)).sum

  /** The bench record for one executed query: bytes shuffled/spilled and
    * the scan-side files/bytes/rows — the quantities whose growth rate at
    * 10× data IS the scale argument.
    */
  def collect(qe: QueryExecution): Map[String, Long] = {
    val nodes = allNodes(qe.executedPlan)
    val scanRows = nodes.collect {
      case l: LeafExecNode if l.metrics.contains("numOutputRows") =>
        math.max(0L, l.metrics("numOutputRows").value)
    }.sum
    Map(
      "shuffle_bytes"  -> sumKey(nodes, "shuffleBytesWritten"),
      "shuffle_rows"   -> sumKey(nodes, "shuffleRecordsWritten"),
      "spill_bytes"    -> sumKey(nodes, "spillSize"),
      "files_read"     -> sumKey(nodes, "numFiles"),
      "file_bytes"     -> sumKey(nodes, "filesSize"),
      "scan_rows"      -> scanRows
    )
  }
}
