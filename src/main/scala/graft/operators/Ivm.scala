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

  /** Delta of an aggregated JOIN view (the classic join-IVM identity): with
    * inserts ΔA into A and ΔB into B,
    *
    *   Δ(A ⋈ B) = ΔA ⋈ B₀  ∪  A₀ ⋈ ΔB  ∪  ΔA ⋈ ΔB
    *
    * — the three terms partition the NEW join pairs exactly (each pair is
    * new×old, old×new, or new×new precisely once; old×old is already in
    * the stored view), so `mergeRollups(storedView, deltaJoinRollup(...))`
    * ≡ a full recompute of `rollup(A₁ ⋈ B₁)` — the invariant the battery
    * entry hashes against DuckDB's full-scan join.
    *
    * Cost per batch at 100 TB: never a base×base join. ΔA ⋈ B₀ and
    * A₀ ⋈ ΔB shuffle the delta fully but the BASE side only moves if it
    * isn't already partitioned on the join key — with both tables bucketed
    * on `joinKeys` (the layout a maintained view earns), every term is a
    * co-located join and AQE broadcasts the delta sides when small. Each
    * term projects down to `groupKeys ++ value` before the union, so the
    * one hash-agg that follows shuffles group-cardinality-bounded partial
    * states only. Inserts only, like [[additiveRollup]]: deletes need
    * negative-multiplicity counts and min/max re-derivation (auxiliary
    * per-group structures), the documented boundary of this tier.
    */
  def deltaJoinRollup(aOld: DataFrame, aDelta: DataFrame,
                      bOld: DataFrame, bDelta: DataFrame,
                      joinKeys: Seq[String], groupKeys: Seq[Column],
                      valueCol: Column): DataFrame = {
    // group keys renamed positionally (`__g0`, …) at the projection so the
    // rollup can re-reference them whatever expressions the caller passed;
    // output rows carry the positional names — final selects re-alias
    val gk = groupKeys.zipWithIndex.map { case (c, i) => c.as(s"__g$i") }
    def pairs(l: DataFrame, r: DataFrame) =
      l.join(r, joinKeys).select(gk :+ valueCol.as("__v"): _*)
    val deltaPairs = pairs(aDelta, bOld)
      .unionByName(pairs(aOld, bDelta))
      .unionByName(pairs(aDelta, bDelta))
    additiveRollup(deltaPairs, groupKeys.indices.map(i => col(s"__g$i")),
      col("__v"))
  }

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
    }),

    // join-view IVM: revenue by (priority, returnflag) over orders⋈lineitem,
    // maintained through INDEPENDENT late batches on both sides (new orders
    // by o_orderdate; late lineitems by l_shipdate — late lines of old
    // orders land in the A₀⋈ΔB term, lines of new orders in ΔA⋈B₀/ΔA⋈ΔB).
    // stored-view + delta-rollup merge must hash-equal DuckDB's full-scan
    // join — the join-IVM correctness contract IS the gate, cut-invariant
    // like the additive entry.
    "ivm_join_rollup" -> ((s, dir) => {
      val ordCut = lit("1997-06-01").cast("timestamp")
      val liCut = lit("1997-09-01").cast("timestamp")
      val ord = graft.Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
      val li = graft.Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_returnflag"),
          col("l_extendedprice"), col("l_shipdate"))
      val (aOld, aDelta) =
        (ord.filter(col("o_orderdate") < ordCut),
          ord.filter(col("o_orderdate") >= ordCut))
      val (bOld, bDelta) =
        (li.filter(col("l_shipdate") < liCut),
          li.filter(col("l_shipdate") >= liCut))
      val gk = Seq(col("o_orderpriority"), col("l_returnflag"))
      val stored = {
        val j = aOld.join(bOld, Seq("o_orderkey"))
          .select(col("o_orderpriority").as("__g0"),
            col("l_returnflag").as("__g1"),
            col("l_extendedprice").as("__v"))
        additiveRollup(j, Seq(col("__g0"), col("__g1")), col("__v"))
      }
      val delta = deltaJoinRollup(aOld, aDelta, bOld, bDelta,
        Seq("o_orderkey"), gk, col("l_extendedprice"))
      mergeRollups(stored, delta, Seq("__g0", "__g1"))
        .select(col("__g0").as("o_orderpriority"),
          col("__g1").as("l_returnflag"), col("n"),
          col("s").cast("double").as("sum_value"),
          round(col("s").cast("double") / col("n"), 6).as("avg_value"),
          col("mn").as("min_value"), col("mx").as("max_value"))
    })
  )

  def oracles: Map[String, String] = Map(
    "ivm_additive_rollup" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
        |    AS avg_value,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events GROUP BY event_type""".stripMargin,
    "ivm_join_rollup" ->
      """SELECT o_orderpriority, l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |        / COUNT(*), 6) AS avg_value,
        |  MIN(l_extendedprice) AS min_value, MAX(l_extendedprice) AS max_value
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority, l_returnflag""".stripMargin
  )
}
