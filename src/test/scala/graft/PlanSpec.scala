package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical/optimized plan assertions — the plan shapes the engine promises
  * (SURVEY.md §4): predicate pushdown reaching the parquet scan, column
  * pruning, broadcast joins for dims, EliminateOuterJoin, partial
  * aggregation, whole-stage codegen. These guard against regressions that
  * correctness tests can't see but that dominate at 100 TB.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }

  test("constant filter is pushed into the parquet scan (PushedFilters)") {
    val pushed = scans(q("p3_filter_pushdown")).map(_.metadata("PushedFilters")).mkString
    assert(pushed.contains("EqualTo(l_returnflag,R)"), pushed)
  }

  test("dynamic (UI-built) filters push down identically") {
    val pushed = scans(q("p5_dynamic_filters")).map(_.metadata("PushedFilters")).mkString
    assert(pushed.contains("EqualTo(c_mktsegment,BUILDING)"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(c_acctbal,0.0)"), pushed)
  }

  test("projection prunes the scan to referenced columns (ReadSchema)") {
    val read = scans(q("p1_project_rename")).map(_.metadata("ReadSchema")).mkString
    assert(read.contains("c_custkey") && read.contains("c_name") && read.contains("c_acctbal"))
    assert(!read.contains("c_mktsegment"), s"unpruned scan: $read")
  }

  test("small dimension joins broadcast (no shuffle of the fact side)") {
    val plan = q("j4_broadcast_agg").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("q10: returnflag reaches the lineitem scan; nation broadcasts") {
    // the joined plan is AQE-wrapped, so scans hide behind the adaptive
    // node — assert on the printed plan (which includes scan metadata)
    val plan = q("q10_returned_items").queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan.take(1500))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("left join + IS NOT NULL is rewritten to inner (EliminateOuterJoin)") {
    val joins = q("j6_left_null_filter").queryExecution.optimizedPlan.collect {
      case j: Join => j.joinType
    }
    assert(joins.nonEmpty && joins.forall(_ == Inner), joins.mkString(","))
  }

  test("grouped aggregation is partial+final (map-side combine)") {
    val plan = q("q1_agg").queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(500))
  }

  test("hot relational path stays inside whole-stage codegen") {
    for (name <- Seq("q1_agg", "p3_filter_pushdown", "j4_broadcast_agg")) {
      val df = q(name)
      df.collect() // AQE finalizes the physical plan only on execution
      val plan = df.queryExecution.executedPlan.toString
      // codegen stages print as "WholeStageCodegen (n)" or starred "*(n) Op"
      assert(plan.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined,
        s"$name lost codegen:\n${plan.take(1200)}")
    }
  }

  test("fact build broadcasts the submissions side (reference hint J4)") {
    import graft.io.TsvReader
    val raw = TsvReader.readAll(spark, TestSpark.edgarFixtures)
    val models = graft.graph.ModelGraph.edgar(spark).run(raw)(spark)
    val plan = models("fct_balanceSheet").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("flagship entry query returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("driver contract: every oracle key names a registered query, no duplicates") {
    val qKeys = SparkEntry.queries.keySet
    val oKeys = SparkEntry.oracleSql.keySet
    assert(oKeys.subsetOf(qKeys), s"orphan oracles: ${oKeys.diff(qKeys)}")
    // a module accidentally redefining a query name would silently drop one.
    // Iterate SparkEntry's own module registry (not a hand-copied list) so
    // registering a module IS listing it here — r6's 120≠119 drift can't recur.
    val allNames = SparkEntry.queryModules.flatMap(_.keys) :+ "q1_agg"
    assert(allNames.size === allNames.distinct.size,
      s"duplicate query names: ${allNames.diff(allNames.distinct)}")
    assert(qKeys.size === allNames.size)
    val allOracleNames = SparkEntry.oracleModules.flatMap(_.keys) :+ "q1_agg"
    assert(allOracleNames.size === allOracleNames.distinct.size,
      s"duplicate oracle names: ${allOracleNames.diff(allOracleNames.distinct)}")
    assert(oKeys.size === allOracleNames.size)
  }

  test("pairwise similarity ops parallelize the streamed side") {
    // the nested-loop pair joins must not run on one input split
    val n = q("dedup_embedding_cosine").rdd.getNumPartitions
    assert(n >= 8, s"pair join would serialize: $n partitions")
  }

  test("as-of join plans as shuffle+sort+window, never a nested loop") {
    val df = q("asof_last_purchase")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      plan.take(800))
    assert(plan.contains("Window"), plan.take(800))
  }

  test("nearest as-of rides ONE exchange: both window frames share the key partitioning") {
    // direction="nearest" evaluates an ascending AND a descending frame —
    // the second frame must cost a sort, not a second shuffle (both windows
    // hash-partition on the same key). A second Exchange here would double
    // the network cost of every nearest-attribution at 100 TB.
    val df = q("asof_nearest_purchase")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      plan.take(800))
    // under AQE the plan string repeats the tree in an "Initial Plan"
    // section — count exchanges only in the final (executed) section
    val finalSection = plan.split(java.util.regex.Pattern.quote("== Initial Plan =="))(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalSection).size
    assert(exchanges == 1, s"expected 1 key exchange, saw $exchanges:\n${plan.take(1200)}")
  }

  test("range join plans as an equi-join on (key, bucket), never a nested loop") {
    // covers the point-in-interval form, the interval×interval overlap form,
    // and the grid-resample composition — every bucketed temporal shape must
    // stay an equi-join
    for (name <- Seq("range_join_attrib", "interval_overlap_join", "resample_locf")) {
      val df = q(name)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
        s"$name:\n${plan.take(800)}")
    }
  }

  test("top-k-per-group plans partial+final WindowGroupLimit (map-side pruning)") {
    // rank-filter pushdown: each map task keeps only its local top-k before
    // the shuffle — the reason a custom top-k physical operator is NOT
    // needed (SURVEY §7.3: prefer composing built-ins; Catalyst already
    // plans the optimal shape for W1)
    val df = q("w1_topk_per_group")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      plan.take(1200))
  }

  test("token heavy-hitters plan TakeOrderedAndProject, never a global sort") {
    // orderBy(n desc).limit(k) must fuse: per-partition top-k + a k-row
    // merge on the driver side — a Sort + GlobalLimit would shuffle and
    // sort the full term dictionary
    val df = q("text_token_topk")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1200))
  }

  test("stratified sampling is a pure scan+filter — no shuffle, no join") {
    val df = q("sample_stratified")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"stratified sample grew a shuffle:\n${plan.take(1200)}")
  }

  test("epoch-repeat expansion is a pure projection+generate — no shuffle, no join") {
    val df = q("mix_repeat_epochs")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"repeat expansion grew a shuffle:\n${plan.take(1200)}")
    assert(plan.contains("Generate"), plan.take(1200))
  }

  test("PII redaction is a pure projection — no shuffle, no UDF") {
    val df = q("curate_redact")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython") &&
      !plan.contains("ScalaUDF"), s"redaction left codegen:\n${plan.take(1200)}")
  }

  test("bloom dedup never sort-merge-joins: corpus streams under broadcasts") {
    val df = q("dedup_incremental_bloom")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"bloom tier grew a corpus shuffle join:\n${plan.take(1200)}")
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
  }

  test("quantized ANN re-rank broadcasts the candidate set") {
    val df = q("ann_quantized_topk")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"re-rank fell back to a full-corpus shuffle join:\n${plan.take(1200)}")
  }

  test("PQ-ADC search scores through codegen lookups — no UDF, no corpus shuffle") {
    // the ADC scoring join must broadcast the per-query lookup tables and
    // stream the code corpus: a SortMergeJoin would shuffle the stored
    // index per query batch, and a ScalaUDF in the lookup chain would wall
    // off whole-stage codegen on the 100 TB scoring path
    val df = q("ann_pq_topk")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"),
      s"PQ scoring fell out of codegen:\n${plan.take(1200)}")
    // the scoring join's condition (vec_id =!= q_id) is non-equi, so its
    // broadcast spelling is a BroadcastNestedLoopJoin over the tiny query
    // relation (advisor r13 — the BroadcastHashJoin here is exactRerank's
    // candidate equi-join, pinned separately)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"ADC scoring join is not the broadcast nested-loop stream:\n${plan.take(1200)}")
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"PQ search shuffled the corpus:\n${plan.take(1200)}")
  }

  test("PQ-ADC at m=8/ks=256 keeps the native loop table inside codegen") {
    // the production codebook point is exactly where the unrolled Column
    // spelling died ("Code grows beyond 64 KB" → interpreted fallback) —
    // pin that the native PqAdcTable projection runs on the query relation
    // inside a whole-stage-codegen span (`*(n)` star) at this geometry
    val df = q("ann_pq256_topk")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pq_adc_table"),
      s"native ADC table missing from plan:\n${plan.take(1200)}")
    assert("""\*\(\d+\) Project .*pq_adc_table""".r.findFirstIn(plan).isDefined,
      s"ADC table projection fell out of whole-stage codegen:\n${plan.take(1600)}")
    assert(!plan.contains("ScalaUDF"), plan.take(1200))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"PQ-256 search shuffled the corpus:\n${plan.take(1200)}")
  }

  test("proximity-index search partition-prunes the postings store; no non-equi join") {
    // NEAR/w served from the index must keep both scale contracts: the
    // postings scan lists only the terms' hash buckets (the phrase pin's
    // contract), and the window check stays a BANDED equi-join — a
    // BroadcastNestedLoopJoin/CartesianProduct here would mean the |Δ| ≤ w
    // predicate leaked into the join condition as a raw range join
    val df = q("retrieval_proximity_index_search")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-text-index"), "no postings scan found in the plan")
    val pruned = raw"PartitionFilters: \[[^\]]*tokb[^\]]*IN[^\]]*\]".r
    assert(pruned.findFirstIn(plan).isDefined,
      s"postings scan lists every bucket:\n${plan.take(2000)}")
    assert(!plan.contains("documents.parquet"),
      "index-backed proximity search re-read the documents table")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"window check degenerated to a non-equi join:\n${plan.take(1600)}")
  }

  test("IVF-PQ search streams the code corpus against broadcast probe tables") {
    // residual IVFADC's scoring scan: the cell-partitioned code segments
    // stream while the (q_id, cell, qc, dlut) probe relation broadcasts —
    // the cell equi-join must be a BroadcastHashJoin (contrast pqTopK's
    // nested loop: full-corpus PQ has no cell key to hash on), with the
    // native ADC table and reconstruction norm in the plan and no
    // UDF/shuffle-join/cartesian anywhere on the scoring path
    val df = q("ann_ivfpq_topk")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pq_adc_table"),
      s"native ADC table missing from plan:\n${plan.take(1200)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"cell probe join is not broadcast-hash:\n${plan.take(1200)}")
    assert(!plan.contains("ScalaUDF"), plan.take(1200))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"IVF-PQ search shuffled the corpus:\n${plan.take(1200)}")
  }

  test("phrase-index search partition-prunes the postings store to the terms' buckets") {
    val df = q("retrieval_phrase_index_search")
    df.collect()
    // the scans that read the persisted postings store must carry a `tokb`
    // partition filter: the directory listing is pruned to the phrase
    // terms' hash buckets BEFORE any parquet bytes are read — at 100 TB
    // the search touches ~|phrase terms|/buckets of the store and zero
    // document bytes
    // string-based: the joins make this plan adaptive, and AQE's wrapper
    // hides FileSourceScanExec nodes from the scans() helper — the final
    // plan text still carries every scan's Location/PartitionFilters
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-text-index"), "no postings scan found in the plan")
    val pruned = raw"PartitionFilters: \[[^\]]*tokb[^\]]*IN[^\]]*\]".r
    assert(pruned.findFirstIn(plan).isDefined,
      s"postings scan lists every bucket:\n${plan.take(2000)}")
    assert(!plan.contains("documents.parquet"),
      "index-backed search re-read the documents table")
  }

  test("index-backed BM25 prunes to the query vocabulary's buckets, reads no documents") {
    val df = q("retrieval_bm25_index_search")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-text-index"), "no postings scan in the BM25 plan")
    val pruned = raw"PartitionFilters: \[[^\]]*tokb[^\]]*IN[^\]]*\]".r
    assert(pruned.findFirstIn(plan).isDefined,
      s"BM25 postings scan lists every bucket:\n${plan.take(2000)}")
    assert(!plan.contains("documents.parquet"),
      "index-backed BM25 re-read the documents table")
  }

  test("importance sampling is a pure scan+filter — no shuffle, no join") {
    val df = q("sample_importance")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"importance sample grew a shuffle:\n${plan.take(1200)}")
  }

  test("embed outliers broadcast the centroid frame, never shuffle-join it") {
    val df = q("curate_embed_outliers")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(!plan.contains("SortMergeJoin"),
      s"groups×dims centroid frame shuffled the corpus:\n${plan.take(1200)}")
  }

  test("e2e training shards: bench shingles broadcast, never a cartesian") {
    // the five-stage composition must keep each stage's scale shape when
    // Catalyst plans them jointly — in particular the decontamination
    // anti-join probes a BROADCAST bench-shingle set (the corpus never
    // shuffles on the shingle key)
    val df = q("e2e_training_shards")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      plan.take(800))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
  }

  test("span dedup and curation funnel never nested-loop or cartesian") {
    // the survivor/contamination joins are id-to-id (legitimately shuffled
    // at scale — AQE broadcasts them at gate scale); what must NEVER appear
    // is a nested-loop fallback from a missing equi-condition
    for (name <- Seq("span_dedup", "curate_funnel")) {
      val df = q(name)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"$name grew a non-equi join:\n${plan.take(1200)}")
    }
  }

  test("fact dim fan-out chain does not inherit scan partitioning") {
    // every dim join in buildFact is a broadcast join, so without an
    // explicit repartition the whole many-to-many expansion would run on
    // the source scan's 1-2 splits (measured 9.9 s -> 1.7 s at sf0.1)
    val plan = q("edgar_fact_composed").queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(ADSH"), plan.take(1200))
  }

  test("BM25 never shuffles the corpus on a token key") {
    // the scale contract of Retrieval.bm25TopK: tf for the query vocabulary
    // is a map-side array scan against BROADCAST terms, and every join back
    // (df table, global stats, query expansion) is a broadcast — the plan
    // may show a term-keyed exchange ONLY under a partial HashAggregate
    // (which ships ≤|vocab| rows per task), never as a join shuffle
    val df = q("retrieval_bm25_topk")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(1200))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus shuffled for a join:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("RRF dense fusion: one broadcast-query corpus pass, no cartesian") {
    val df = q("retrieval_rrf_fuse")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("blocked ER pairs join on the block key, never a cartesian") {
    val df = q("er_blocked_matches")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"pair enumeration lost its equi-join block key:\n${plan.take(1200)}")
  }

  test("funnel and cohort join user-bounded frames broadcast, never sort-merge") {
    // the scale contract of Analytics: the corpus reduces to per-user
    // first-touch/distinct-day frames, and every join back is a broadcast —
    // a SortMergeJoin would mean the event corpus itself is being shuffled
    // for a join
    for (name <- Seq("funnel_conversion", "cohort_retention")) {
      val df = q(name)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$name:\n${plan.take(1200)}")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
        s"$name shuffled the corpus for a join:\n${plan.take(1200)}")
    }
  }

  test("Q17's correlated scalar subquery is decorrelated into one aggregate join") {
    // the per-row `(SELECT 0.2*AVG(..) WHERE l2.l_partkey = p_partkey)`
    // must leave NO subquery node in the physical plan — Catalyst's
    // decorrelation rewrites it to a partkey-grained aggregate joined back
    // to the fact. A surviving scalar-subquery node would mean per-row
    // re-execution: O(rows × group) at 100 TB.
    val df = q("q17_small_quantity_revenue")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Subquery") && !plan.contains("scalar-subquery"),
      s"correlated subquery survived to execution:\n${plan.take(1200)}")
    // the rewrite's signature: an avg aggregate over lineitem joined back
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
    assert(aggs.exists(_.aggregateExpressions.map(_.sql).mkString.contains("avg")),
      s"no decorrelated avg aggregate in optimized plan:\n${df.queryExecution.optimizedPlan.toString.take(1200)}")
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.size >= 2, // part⋈lineitem + the decorrelated avg join
      s"expected the decorrelated aggregate join:\n${df.queryExecution.optimizedPlan.toString.take(1200)}")
  }

  test("Q22's correlated NOT EXISTS is decorrelated into a left-anti join") {
    // the existential lane: `NOT EXISTS (SELECT .. WHERE o_custkey =
    // c_custkey ..)` must become one LeftAnti join — a surviving
    // existential subquery would probe orders once per customer row
    val df = q("q22_churned_balances")
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("LeftAnti"),
      s"no anti join in Q22's physical plan:\n${physical.take(1200)}")
    assert(!physical.contains("exists-subquery") && !physical.contains("in-subquery"),
      s"existential subquery survived to execution:\n${physical.take(1200)}")
    // the date bound must reach the orders scan as a pushed filter — the
    // anti join's build side is the THINNED recent-orders slice, not the
    // whole orders table. (String pin, not scans(): the join sits inside
    // AQE query stages, which the SparkPlan tree collect doesn't descend.)
    assert(physical.contains("GreaterThanOrEqual(o_orderdate"),
      s"window not pushed into the orders scan:\n${physical.take(2000)}")
  }

  test("Q21's twin existentials decorrelate into one semi and one anti join") {
    // the double-existential lane: a correlated EXISTS and a correlated
    // NOT EXISTS over the same CTE, each with the non-equi
    // `l_suppkey <> l_suppkey` term. Both must be planned as joins —
    // surviving existential subqueries would probe the lineitem⋈orders
    // relation once per fact row, twice.
    val df = q("q21_waiting_suppliers")
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("LeftSemi"),
      s"no semi join in Q21's physical plan:\n${physical.take(1600)}")
    assert(physical.contains("LeftAnti"),
      s"no anti join in Q21's physical plan:\n${physical.take(1600)}")
    assert(!physical.contains("exists-subquery") && !physical.contains("in-subquery"),
      s"existential subquery survived to execution:\n${physical.take(1600)}")
    // the CTE's own filter must reach the orders scan in every expansion
    assert(physical.contains("EqualTo(o_orderstatus,F)"),
      s"status filter not pushed into the orders scan:\n${physical.take(2400)}")
  }

  test("Q20 decorrelates the nested IN + two-level scalar agg: semi joins, no subquery") {
    val df = q("q20_promotable_suppliers")
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    // both INs become semi joins (supplier IN shipments; shipment part IN
    // name-filtered parts)
    assert("LeftSemi".r.findAllIn(physical).size >= 2,
      s"expected two semi joins in Q20's plan:\n${physical.take(1600)}")
    // the two-levels-deep correlated scalar agg is decorrelated into a
    // (partkey, suppkey)-grained aggregate — no per-row subquery survives
    assert(!physical.contains("scalar-subquery") && !physical.contains("in-subquery"),
      s"subquery survived to execution:\n${physical.take(1600)}")
    assert(physical.contains("avg(l_quantity"),
      s"decorrelated per-(part,supplier) aggregate missing:\n${physical.take(2400)}")
    // the uncorrelated IN's name filter reaches the part scan
    assert(physical.contains("StringStartsWith(p_name,small)"),
      s"part-name filter not pushed into the scan:\n${physical.take(2400)}")
  }

  test("Q16's NOT IN plans as a null-aware anti join; IN-list pushed to the part scan") {
    // NOT IN with a subquery is semantically stricter than NOT EXISTS (one
    // null in the subquery empties the result), so Catalyst must plan the
    // NULL-aware anti-join variant — and it must still be a broadcast, not
    // a per-row re-scan of supplier
    val df = q("q16_supplier_counts")
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("in-subquery"),
      s"NOT IN subquery survived to execution:\n${physical.take(1600)}")
    assert(physical.contains("LeftAnti"),
      s"no anti join in Q16's plan:\n${physical.take(1600)}")
    assert(physical.toLowerCase.contains("null"),
      s"anti join is not the null-aware variant:\n${physical.take(1600)}")
    // string pin, not scans(): the aggregate puts the join inside AQE query
    // stages, which the SparkPlan tree collect doesn't descend — the final
    // plan text still carries every scan's PushedFilters
    assert(physical.contains("In(p_size"),
      s"IN-list not pushed into the part scan:\n${physical.take(2400)}")
  }

  test("Q19's cross-table disjunction keeps the equi-join; no nested-loop fallback") {
    // the OR references both sides, so no disjunct can be pushed wholesale
    // — what must hold is that the p_partkey equi-join stays a hash join
    // (a planner that folds the OR into the join condition would degrade
    // to BroadcastNestedLoopJoin and re-scan lineitem per part row)
    val df = q("q19_disjunctive_revenue")
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin") ||
      physical.contains("SortMergeJoin"),
      s"Q19 lost its equi-join:\n${physical.take(1600)}")
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"),
      s"disjunction degraded the join:\n${physical.take(1600)}")
  }

  test("Q13's ON-clause filter stays outer: join not eliminated, filter pushed right") {
    // the non-key predicate lives in the ON clause, so it filters the
    // RIGHT side BEFORE the join and order-less customers survive with
    // c_count = 0 — EliminateOuterJoin must NOT fire (contrast
    // j6_left_null_filter, where a null-rejecting WHERE makes it fire),
    // and the priority filter must still reach the orders scan
    val df = q("q13_order_distribution")
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("LeftOuter"),
      s"outer join eliminated despite ON-clause-only filter:\n${physical.take(1600)}")
    // string pin for the same AQE-wrapper reason as Q16
    assert(physical.contains("Not(EqualTo(o_orderpriority,1-URGENT))"),
      s"ON-clause filter not pushed into the orders scan:\n${physical.take(2400)}")
  }

  test("Q2's correlated MIN-over-join decorrelates; region filter pushed to both nation scans") {
    // the join-subquery lane: the correlated scalar MIN's body is itself a
    // 3-table join — Catalyst must decorrelate the WHOLE join into one
    // partkey-grained min aggregate, never re-run it per outer row
    val df = q("q2_min_cost_supplier")
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("scalar-subquery") && !physical.contains("Subquery"),
      s"correlated join-subquery survived to execution:\n${physical.take(1600)}")
    assert(physical.contains("min(l_extendedprice"),
      s"decorrelated min aggregate missing:\n${physical.take(2400)}")
    // the region bound reaches the nation scan in BOTH expansions (outer
    // join chain + the decorrelated aggregate's own nation join)
    assert("EqualTo\\(n_regionkey,1\\)".r.findAllIn(physical).size >= 2,
      s"region filter not pushed into both nation scans:\n${physical.take(2400)}")
  }

  test("Q15's view-maximum bar plans as one uncorrelated scalar over the aggregated CTE") {
    // the revenue CTE is referenced twice (join + MAX bar); the bar must be
    // an uncorrelated ReusedSubquery/Subquery over the AGGREGATED view —
    // what must never appear is a per-row correlated probe (no exists/in
    // rewrites) or a shipdate-unfiltered lineitem scan
    val df = q("q15_top_supplier")
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("exists-subquery") && !physical.contains("in-subquery"),
      s"existential rewrite appeared in Q15:\n${physical.take(1600)}")
    // the quarter window reaches the lineitem scan as pushed filters
    assert(physical.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate window not pushed into the lineitem scan:\n${physical.take(2400)}")
    // the revenue view's fold appears as a decimal sum aggregate
    assert(physical.contains("sum(") && physical.contains("total_revenue"),
      s"revenue aggregate missing:\n${physical.take(2400)}")
  }

  test("Q4's single EXISTS with a non-equi correlation plans as one semi join") {
    // the canonical existential lane: `EXISTS (.. l_orderkey = o_orderkey
    // AND l_shipdate > o_orderdate + 45d)` must become ONE LeftSemi whose
    // condition carries the range term — a surviving exists-subquery would
    // probe lineitem once per order row
    val df = q("q4_priority_late_orders")
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("LeftSemi"),
      s"no semi join in Q4's plan:\n${physical.take(1600)}")
    assert(!physical.contains("exists-subquery") && !physical.contains("in-subquery"),
      s"existential subquery survived to execution:\n${physical.take(1600)}")
    // the quarter window reaches the orders scan — the semi join's probe
    // side is the THINNED quarter slice, not the whole orders table
    assert(physical.contains("GreaterThanOrEqual(o_orderdate"),
      s"date window not pushed into the orders scan:\n${physical.take(2400)}")
  }

  test("Q6 is scan-only: every predicate pushed, no join, schema pruned to 4 columns") {
    // the pure-pushdown lane — at 100 TB this query IS its scan, so all
    // three band predicates must reach the parquet reader and the read
    // schema must carry only the touched columns
    val df = q("q6_forecast_revenue")
    df.collect()
    // the final aggregate makes the plan adaptive, which hides the scan
    // from the SparkPlan tree collect (AdaptiveSparkPlan AND each
    // QueryStage wrap their subtrees as non-children) and truncates
    // PushedFilters in the printed plan — recurse through both wrappers
    // and read the scan metadata untruncated
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case s: QueryStageExec => allScans(s.plan)
    }.flatten
    val finalized = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val sc = allScans(df.queryExecution.executedPlan)
    val pushed = sc.map(_.metadata("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") &&
      pushed.contains("LessThan(l_shipdate"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(l_discount,0.05)") &&
      pushed.contains("LessThanOrEqual(l_discount,0.07)"), pushed)
    assert(pushed.contains("LessThan(l_quantity,24.0)"), pushed)
    val read = sc.map(_.metadata("ReadSchema")).mkString
    assert(read.contains("l_extendedprice") && !read.contains("l_orderkey") &&
      !read.contains("l_returnflag"), s"unpruned scan: $read")
    assert(!finalized.toString.contains("Join"),
      s"Q6 grew a join:\n${finalized.toString.take(800)}")
  }

  test("Q8's market share is ONE fact pass: conditional agg, no second lineitem scan") {
    // share = Σ(vol|nation)/Σ(vol) spelled as a CASE fold — the plan must
    // scan lineitem ONCE (a numerator/denominator self-join would double
    // the dominant cost at any scale)
    val df = q("q8_market_share")
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    // count in the FINAL plan only — AdaptiveSparkPlan's toString repeats
    // the whole tree under "== Initial Plan ==", which would double-count
    val finalPlan = physical.split("== Initial Plan ==").head
    assert("lineitem\\.parquet".r.findAllIn(finalPlan).size <= 1,
      s"Q8 scans the fact more than once:\n${finalPlan.take(2400)}")
    // region/type gates reach their dimension scans
    assert(physical.contains("EqualTo(r_name,EUROPE)") &&
      physical.contains("EqualTo(p_type,STANDARD)"),
      s"dimension gates not pushed:\n${physical.take(2400)}")
  }

  test("Q11's HAVING bar is an uncorrelated one-shot subquery; nation IN is a join") {
    // the bar must appear as a Subquery executed ONCE (uncorrelated — the
    // legitimate scalar-subquery form, unlike Q17's per-row correlated one
    // which must vanish), and the uncorrelated nation IN must plan as a
    // broadcast semi/hash join, never a per-row in-subquery probe
    val df = q("q11_important_stock")
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("in-subquery"),
      s"nation IN survived as a per-row probe:\n${physical.take(1600)}")
    assert(physical.contains("Subquery") || physical.contains("subquery"),
      s"HAVING bar lost its one-shot subquery form:\n${physical.take(1600)}")
    assert(physical.contains("LeftSemi") || physical.contains("BroadcastHashJoin"),
      s"nation membership is not a join:\n${physical.take(1600)}")
  }

  test("skyline is windows + equi-joins: never a dominance cartesian") {
    // the 2-D decomposition's whole point — the oracle runs the quadratic
    // NOT EXISTS scan, the engine must not
    val physical = q("pareto_skyline").queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct") &&
      !physical.contains("BroadcastNestedLoopJoin"),
      s"skyline fell back to a dominance scan:\n${physical.take(1600)}")
    assert(physical.contains("Window"),
      s"prefix-min window missing:\n${physical.take(1600)}")
  }

  test("containment join candidates come from the posting equi-join, never all-pairs") {
    val physical = q("dedup_containment").queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct") &&
      !physical.contains("BroadcastNestedLoopJoin"),
      s"containment went all-pairs:\n${physical.take(1600)}")
  }

  test("dp releases range-join a BROADCAST threshold table on the aggregated relation") {
    // the ~150-row noise table must broadcast (a nested-loop probe per
    // GROUP is O(1) work); the corpus side must be aggregated BEFORE the
    // join — no per-row noise lookups
    val df = q("privacy_dp_counts")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastNestedLoopJoin"),
      s"threshold table not broadcast:\n${physical.take(1600)}")
    assert(physical.indexOf("HashAggregate") >= 0, physical.take(1600))
    // the aggregate sits BELOW the join input (stream side is post-agg):
    // rows reaching the join are GROUPS, bounded by the 5×25 quasi domain
    // (93 occupied at sf0.001), never corpus rows (150 customers here)
    val n = df.count()
    assert(n > 0 && n <= 125L, s"per-row noise lookups? $n rows")
  }

  test("link prediction joins stay equi-keyed; the floor prunes before the degree join") {
    val physical = q("graph_link_prediction").queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"),
      s"all-pairs fallback:\n${physical.take(1600)}")
    // the common-count floor is a Filter on the aggregate, not post-join
    val optimized = q("graph_link_prediction").queryExecution.optimizedPlan.toString
    assert(optimized.contains("common"), optimized.take(800))
  }
}
