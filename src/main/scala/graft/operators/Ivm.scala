package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for additive rollups — the aggregate twin of
  * `io/Materializer`'s row-level incremental/MERGE strategies: a stored
  * rollup absorbs a delta batch by aggregating ONLY the delta and merging
  * group-wise, never rescanning the base. This is what keeps a 100 TB
  * metrics table fresh: per batch the work is O(delta) + a group-keyed merge
  * of two rollup tables (each bounded by group cardinality, not data size).
  *
  * Only re-aggregatable statistics participate (count/sum/min/max — and
  * anything derivable from them, e.g. avg = sum/count); a non-decomposable
  * stat (exact median, exact distinct) needs its mergeable-sketch
  * counterpart instead ([[graft.operators.Relational]]'s `a16_hll_mergeable`
  * / `a11b_approx_percentiles` rows show that path).
  */
object Ivm {

  /** One partial+final rollup of `valueCol` by `keys`: count, decimal-exact
    * sum, min, max — the mergeable state, one hash-agg shuffle bounded by
    * group cardinality.
    */
  def additiveRollup(df: DataFrame, keys: Seq[Column], valueCol: Column): DataFrame =
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        sum(valueCol.cast("decimal(18,2)")).as("s"),
        min(valueCol).as("mn"),
        max(valueCol).as("mx"))

  /** Group-wise merge of two rollup states: counts and decimal sums add,
    * min/max fold — `mergeRollups(rollup(A), rollup(B)) ≡ rollup(A ∪ B)`
    * exactly (decimal addition is associative), which is the invariant the
    * battery entry hashes against a full recompute.
    */
  def mergeRollups(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  private def finish(d: DataFrame): DataFrame =
    d.select(col("event_type"), col("n"),
      col("s").cast("double").as("sum_value"),
      round(col("s").cast("double") / col("n"), 6).as("avg_value"),
      col("mn").as("min_value"), col("mx").as("max_value"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // base rollup (days < 20) absorbs the day >= 20 delta; the merged state
    // must hash-equal the oracle's FULL-scan aggregation (oracle-gated) —
    // the IVM correctness contract itself is the gate
    "ivm_additive_rollup" -> ((s, dir) => {
      val nsPerDay = graft.Tables.NanosPerDay
      val ev = graft.Tables(s, dir, "events")
        .withColumn("day", expr(s"ts div $nsPerDay"))
      val cut = lit(19735L) // mid-January 2024 in epoch days — any cut
                            // works: the merged state is cut-invariant
      val base = additiveRollup(ev.filter(col("day") < cut),
        Seq(col("event_type")), col("value"))
      val delta = additiveRollup(ev.filter(col("day") >= cut),
        Seq(col("event_type")), col("value"))
      finish(mergeRollups(base, delta, Seq("event_type")))
    })
  )

  def oracles: Map[String, String] = Map(
    "ivm_additive_rollup" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
        |    AS avg_value,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events GROUP BY event_type""".stripMargin
  )
}
