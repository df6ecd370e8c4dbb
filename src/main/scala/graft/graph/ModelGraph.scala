package graft.graph

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}

/** dbt-style model DAG: named models with declared `ref()` dependencies,
  * topologically ordered, independent models built concurrently.
  *
  * Mirrors the reference's orchestration (Airflow/dags/rdbms_transformation
  * .py:202-211: staging → dimensions → [three facts in parallel] → tests) with
  * dbt `--threads 8` parallelism (`:50-58`) mapped to concurrent job
  * submission on a shared SparkSession — Spark's scheduler interleaves the
  * jobs across the cluster, which is the idiomatic Spark analog of dbt
  * threads.
  */
final case class Model(
    name: String,
    deps: Seq[String],
    build: Map[String, DataFrame] => DataFrame,
    materialization: Materialization = View)

sealed trait Materialization
/** dbt `materialized='view'` → lazy DataFrame (plan only, recomputed per use). */
case object View extends Materialization
/** dbt `materialized='table'` → persisted columnar table, optionally
  * cluster-sorted; `format` ∈ {parquet, orc} (both native columnar sources
  * with pushdown + vectorized read).
  */
final case class Table(clusterBy: Seq[String] = Nil,
                       format: String = "parquet") extends Materialization
/** Hive-style directory partitioning (`partitionBy` write): equality/IN
  * filters on the partition columns prune entire directories at PLANNING
  * time — the coarse pruning tier above file-level min/max clustering, and
  * the standard warehouse layout for date-partitioned facts.
  */
final case class Partitioned(partitionBy: Seq[String],
                             format: String = "parquet") extends Materialization
/** dbt incremental: append rows where `column >= max(column)` in the sink
  * (reference: json_transform/macros/incremental_filter.sql:1-5).
  */
final case class Incremental(watermarkColumn: String) extends Materialization
/** Hash-bucketed + sorted catalog table: joins/aggregations on the bucket
  * keys become shuffle-free (the Spark analog of co-located clustering —
  * SURVEY.md §4 `cluster_by` taken to its scale conclusion).
  */
final case class Bucketed(bucketBy: Seq[String], numBuckets: Int = 32)
  extends Materialization
/** dbt incremental `merge` strategy (Snowflake's default): each batch
  * upserts by `keys` — matched rows replaced, new rows inserted, source
  * tombstone rows deleted ([[graft.operators.Scd.mergeUpsert]] semantics).
  * With `partitionBy`, the target is hive-partitioned and a merge batch
  * rewrites ONLY the partitions its feed touches — the 100 TB shape: merge
  * cost scales with the change set's partition footprint, never the table.
  * Keys must then be partition-stable (a key never moves partitions), the
  * standard hive-merge precondition.
  */
final case class MergeInc(keys: Seq[String],
                          partitionBy: Option[String] = None,
                          deleteColumn: Option[String] = None)
  extends Materialization

final class ModelGraph(val models: Seq[Model]) {
  private val byName = models.map(m => m.name -> m).toMap
  require(byName.size == models.size, "duplicate model names")

  /** Kahn topological order; fails fast on cycles. Deps that are not model
    * names are external sources — they must be present in the registry passed
    * to [[run]], which checks them up front (a typo'd `ref()` then fails with
    * the model name instead of a bare NoSuchElementException inside a Future).
    */
  val topoOrder: Seq[String] = {
    val internal = models.map(m => m.name -> m.deps.filter(byName.contains)).toMap
    var remaining = internal
    val order = Seq.newBuilder[String]
    while (remaining.nonEmpty) {
      val ready = remaining.collect {
        case (n, ds) if ds.forall(d => !remaining.contains(d)) => n
      }.toSeq.sorted
      require(ready.nonEmpty, s"cycle among ${remaining.keys.mkString(",")}")
      order ++= ready
      remaining = remaining -- ready
    }
    order.result()
  }

  /** Build every model against a registry seeded with the source tables.
    * Models at the same topological depth run concurrently (Futures sharing
    * the SparkSession), like dbt threads. Materialization is applied by
    * `materialize` (injected so tests can run fully lazy).
    */
  def run(sources: Map[String, DataFrame],
          materialize: (Model, DataFrame) => DataFrame = (_, df) => df,
          parallelism: Int = 8)(implicit spark: SparkSession): Map[String, DataFrame] = {
    val external = models.flatMap(m => m.deps.filterNot(byName.contains)).distinct
    val missing = external.filterNot(sources.contains)
    require(missing.isEmpty,
      s"deps not found among models or sources: ${missing.mkString(", ")}")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // group topo order into waves of mutually independent models
      var registry = sources
      var remaining = topoOrder
      while (remaining.nonEmpty) {
        val wave = remaining.takeWhile(n =>
          byName(n).deps.forall(d => registry.contains(d) || !byName.contains(d)))
        require(wave.nonEmpty, s"unresolvable deps for ${remaining.head}")
        val reg = registry
        val built = Await.result(
          Future.sequence(wave.map { n =>
            val m = byName(n)
            Future(n -> materialize(m, m.build(reg)))
          }), Duration.Inf)
        registry = registry ++ built
        remaining = remaining.drop(wave.size)
      }
      registry
    } finally pool.shutdown()
  }
}

object ModelGraph {
  /** The reference's full star-schema + document-model graph
    * (SURVEY.md §3.2, §7.1). Sources: raw `sub`, `tag`, `num`, `pre`.
    */
  def edgar(spark: SparkSession, rowCap: Option[Int] = Some(100000)): ModelGraph = {
    import graft.models._
    new ModelGraph(Seq(
      Model("stg_sub", Seq("sub"), r => Staging.stgSub(r("sub"))),
      Model("stg_num", Seq("num"), r => Staging.stgNum(r("num")),
        Table(clusterBy = Seq("ADSH", "TAG", "VERSION_TAG"))),
      Model("stg_tag", Seq("tag"), r => Staging.stgTag(r("tag"))),
      Model("stg_pre", Seq("pre"), r => Staging.stgPre(r("pre"))),
      Model("dim_address", Seq("stg_sub"), r => Dims.dimAddress(r("stg_sub"))),
      Model("dim_company", Seq("dim_address", "stg_sub"),
        r => Dims.dimCompany(r("dim_address"), r("stg_sub"))),
      Model("dim_filings", Seq("stg_pre", "stg_tag", "stg_num", "stg_sub"),
        r => Dims.dimFilings(r("stg_pre"), r("stg_tag"), r("stg_num"), r("stg_sub"))),
      Model("dim_date", Nil, _ => Dims.dimDate(spark)),
      Model("fct_balanceSheet",
        Seq("stg_num", "stg_pre", "stg_sub", "dim_company", "dim_filings", "dim_date"),
        r => Facts.fctBalanceSheet(r, rowCap), Table(clusterBy = Seq("COMPANY_NAME"))),
      Model("fct_IncomeStatement",
        Seq("stg_num", "stg_pre", "stg_sub", "dim_company", "dim_filings", "dim_date"),
        r => Facts.fctIncomeStatement(r, rowCap), Table(clusterBy = Seq("COMPANY_NAME"))),
      Model("fct_Cashflows",
        Seq("stg_num", "stg_pre", "stg_sub", "dim_company", "dim_filings", "dim_date"),
        r => Facts.fctCashflows(r, rowCap), Table(clusterBy = Seq("COMPANY_NAME"))),
      Model("raw_stg_sub_modified", Seq("sub"),
        r => JsonModels.rawStgSubModified(r("sub"))),
      Model("stg_financial_data", Seq("raw_stg_sub_modified", "num", "tag", "pre"),
        r => JsonModels.stgFinancialData(r("raw_stg_sub_modified"), r("num"), r("tag"), r("pre"))),
      Model("financial_statements_json", Seq("stg_financial_data"),
        r => JsonModels.financialStatementsJson(r("stg_financial_data")))
    ))
  }
}
