package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fn.Keys

/** Slowly-changing-dimension history (dbt `snapshot`, `check` strategy) and
  * MERGE upsert (dbt incremental `merge` strategy) — the two dbt
  * materialization behaviors the reference's tooling provides beyond what
  * its models use (reference: Airflow/masterfindata/dbt_project.yml:26-45
  * declares only view/table; json_transform/macros/incremental_filter.sql
  * is the append-only incremental). A user switching from the reference's
  * dbt stack expects both; they are re-expressed here as pure
  * DataFrame→DataFrame operators so any host (the [[graft.io.Materializer]],
  * a streaming foreachBatch, the battery) can apply them.
  *
  * Scale shape, both operators: ONE equi-shuffle on the natural key per
  * merge batch, and only the OPEN slice of the snapshot (resp. the touched
  * partitions of the target) participates — closed history rows never move.
  * When the change batch is small (the steady state), AQE broadcasts it and
  * the big side never shuffles at all.
  */
object Scd {

  private val MetaCols = Seq("valid_from", "valid_to", "is_current", "scd_id")

  /** Seed an SCD2 snapshot from a source's current state: every row open
    * (`valid_to` null, `is_current` true) as of `asOf`, with a
    * dbt-convention surrogate `scd_id = md5(key '-' valid_from)`.
    */
  def scd2Init(source: DataFrame, key: String, asOf: Column): DataFrame = {
    val dataCols = source.columns.toSeq
    source.select(
      dataCols.map(col) ++ Seq(
        asOf.cast("date").as("valid_from"),
        lit(null).cast("date").as("valid_to"),
        lit(true).as("is_current")): _*)
      .withColumn("scd_id", Keys.surrogateKey(col(key), col("valid_from")))
  }

  /** One SCD2 merge batch (dbt snapshot, `check` strategy over `tracked`):
    *
    *  - a key whose tracked columns changed closes its open row
    *    (`valid_to = asOf`, `is_current = false`) and opens a new version
    *    (`valid_from = asOf`);
    *  - a key new to the snapshot opens its first version;
    *  - an unchanged key keeps its open row, and a key ABSENT from the
    *    source keeps its open row too (dbt's default: deletions are not
    *    invalidated — pass the deleted keys as a tracked tombstone column
    *    if hard-delete tracking is needed);
    *  - closed history rows pass through untouched — they are filtered out
    *    BEFORE the join, so a snapshot with years of versions still joins
    *    only its current slice.
    *
    * Column comparison is null-safe (`IS DISTINCT FROM`): a tracked value
    * becoming (or leaving) null is a change. Exactly one shuffle: the open
    * slice ⋈ source full-outer on the key; both output row families project
    * from that one join.
    */
  def scd2Merge(snapshot: DataFrame, source: DataFrame, key: String,
                tracked: Seq[String], asOf: Column): DataFrame = {
    require(tracked.nonEmpty, "scd2Merge needs at least one tracked column")
    val dataCols = snapshot.columns.toSeq.filterNot(MetaCols.contains)
    val open = snapshot.filter(col("is_current"))
    val closedHist = snapshot.filter(!col("is_current"))

    val t = open.select(
      col(key).as("_k") +:
        dataCols.filterNot(_ == key).map(c => col(c).as(s"_t_$c")) :+
        col("valid_from").as("_t_valid_from") :+ lit(true).as("_in_tgt"): _*)
    val s = source.select(
      col(key).as("_k") +:
        dataCols.filterNot(_ == key).map(c => col(c).as(s"_s_$c")) :+
        lit(true).as("_in_src"): _*)
    val j = t.join(s, Seq("_k"), "full_outer")
    val changed = col("_in_tgt").isNotNull && col("_in_src").isNotNull &&
      tracked.map(c => !(col(s"_t_$c") <=> col(s"_s_$c"))).reduce(_ || _)

    // family 1: prior open rows — closed if changed, still open otherwise
    val priorRows = j.filter(col("_in_tgt").isNotNull).select(
      col("_k").as(key) +:
        dataCols.filterNot(_ == key).map(c => col(s"_t_$c").as(c)) :+
        col("_t_valid_from").as("valid_from") :+
        when(changed, asOf.cast("date")).otherwise(lit(null).cast("date")).as("valid_to") :+
        (!changed).as("is_current"): _*)
    // family 2: new versions — changed keys and first-seen keys
    val newRows = j.filter(col("_in_src").isNotNull &&
        (col("_in_tgt").isNull || changed)).select(
      col("_k").as(key) +:
        dataCols.filterNot(_ == key).map(c => col(s"_s_$c").as(c)) :+
        asOf.cast("date").as("valid_from") :+
        lit(null).cast("date").as("valid_to") :+
        lit(true).as("is_current"): _*)

    closedHist.drop("scd_id")
      .unionByName(priorRows)
      .unionByName(newRows)
      .withColumn("scd_id", Keys.surrogateKey(col(key), col("valid_from")))
  }

  /** MERGE upsert with whole-row update semantics — the dbt incremental
    * `merge` strategy (and Snowflake/Delta `MERGE INTO` with
    * update-all / insert-all clauses):
    *
    *  - matched target rows are REPLACED by their source row
    *    (`WHEN MATCHED THEN UPDATE SET *`) — partial-column updates are the
    *    caller pre-joining old and new into the source row;
    *  - matched rows whose source satisfies `deleteWhen` are dropped
    *    (`WHEN MATCHED AND cond THEN DELETE`); the predicate sees SOURCE
    *    columns (a tombstone flag in the change feed, CDC-style);
    *  - unmatched source rows insert (`WHEN NOT MATCHED THEN INSERT *`);
    *  - unmatched target rows are kept, or dropped when
    *    `deleteUnmatchedTarget` (`WHEN NOT MATCHED BY SOURCE THEN DELETE` —
    *    full-refresh-by-merge semantics).
    *
    * Because matched rows take the source row wholesale, the plan needs NO
    * full-outer join: target anti-joins (or semi-joins) the source key set
    * — broadcast under AQE when the change batch is small, so the target
    * never shuffles — and surviving source rows union in. Source keys must
    * be unique (standard MERGE precondition; violations would silently
    * duplicate, so dedup upstream).
    */
  def mergeUpsert(target: DataFrame, source: DataFrame, keys: Seq[String],
                  deleteWhen: Option[Column] = None,
                  deleteUnmatchedTarget: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "mergeUpsert needs at least one key column")
    // matched target rows are replaced by their source row either way, so
    // the target contributes only its UNMATCHED rows (anti-join) — and with
    // `deleteUnmatchedTarget` not even those: every surviving row then comes
    // from the source, making the merge a keyed full refresh
    val kept =
      if (deleteUnmatchedTarget) target.limit(0)
      else target.join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val incoming = deleteWhen
      .map(c => source.filter(!coalesce(c, lit(false))))
      .getOrElse(source)
    kept.unionByName(incoming.select(target.columns.toSeq.map(col): _*))
  }

  /** Ordered CDC apply — a Debezium/DMS-style change feed folded into table
    * state in ONE pass. Where [[mergeUpsert]] applies one pre-deduplicated
    * batch, this resolves a feed that may carry SEVERAL versions of the
    * same key, out of arrival order: each change row is a full row image
    * plus `opCol` (`I`/`U` upsert, `D` delete) and a monotonic per-key
    * `versionCol` (LSN / binlog position / commit ts); the per-key row with
    * the HIGHEST version wins (last-writer-wins), and a winning delete
    * removes the key. Base rows participate as version-0 images, so a key
    * untouched by the feed survives unchanged and a key with any change
    * history resolves against its base row by the same rule.
    *
    * Preconditions (standard CDC-log guarantees, not re-checked per row):
    * feed versions are > 0 and unique per key — a duplicated (key, version)
    * would make the winner nondeterministic, exactly as it would in the
    * source log.
    *
    * Scale shape: ONE equi-shuffle of base ∪ feed on the key, then a
    * rank-1-per-key filter that Catalyst executes as WindowGroupLimit
    * (spec-pinned): each partition keeps one candidate row per key while
    * scanning, O(1) state per key, no full per-key sort materialization.
    * With the base bucketed on the key (the layout a maintained table
    * earns) the base side never moves and only the feed shuffles.
    */
  def applyCdc(base: DataFrame, changes: DataFrame, key: String,
               opCol: String = "cdc_op",
               versionCol: String = "cdc_version"): DataFrame = {
    val dataCols = base.columns.toSeq
    val all = base
      .withColumn(opCol, lit("I")).withColumn(versionCol, lit(0L))
      .unionByName(changes.select(
        (dataCols.map(col) :+ col(opCol) :+ col(versionCol).cast("long")): _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(versionCol).desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .select(dataCols.map(col): _*)
  }

  // ---------------------------------------------------------------- battery

  /** Battery shapes, derived deterministically from the tables so the DuckDB
    * oracle reconstructs both sides bit-for-bit.
    *
    * `scd2_snapshot`: seed the customer dim as of 2020-01-01, then merge a
    * source where %7==0 keys changed segment+balance, %19==5 keys vanished
    * (stay open), and negated %13==1 keys are brand new — one batch
    * exercising changed/unchanged/absent/new in a single hash-gated result.
    *
    * `merge_upsert`: orders merged with a change feed of updates
    * (%5==0, +1000.0 price, status U), tombstones (%7==2 → delete), and
    * inserts (negated %97==3 keys, status N).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd2_snapshot" -> ((sp, dir) => {
      val c = graft.Tables(sp, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val init = scd2Init(c, "c_custkey", to_date(lit("2020-01-01")))
      val src = c.filter(col("c_custkey") % 19 =!= 5).select(
        col("c_custkey"),
        when(col("c_custkey") % 7 === 0,
          concat(lit("SEG_"), (col("c_custkey") % 5).cast("string")))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"),
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + lit(100.0))
          .otherwise(col("c_acctbal")).as("c_acctbal"))
        .unionByName(c.filter(col("c_custkey") % 13 === 1).select(
          (-col("c_custkey")).as("c_custkey"),
          lit("NEWSEG").as("c_mktsegment"),
          lit(0.0).as("c_acctbal")))
      scd2Merge(init, src, "c_custkey", Seq("c_mktsegment", "c_acctbal"),
        to_date(lit("2026-01-01")))
        // gate normalization only: DATE nulls stringify differently in the
        // two engines' pandas paths (None vs NaT); values are unchanged
        .withColumn("valid_from", col("valid_from").cast("string"))
        .withColumn("valid_to", col("valid_to").cast("string"))
    }),

    "merge_upsert" -> ((sp, dir) => {
      val o = graft.Tables(sp, dir, "orders")
      val updates = o.filter(col("o_orderkey") % 5 === 0 && col("o_orderkey") % 7 =!= 2)
        .select(col("o_orderkey"), col("o_custkey"),
          lit("U").as("o_orderstatus"),
          (col("o_totalprice") + lit(1000.0)).as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"),
          lit(false).as("_delete"))
      val tombstones = o.filter(col("o_orderkey") % 7 === 2)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"),
          lit(true).as("_delete"))
      val inserts = o.filter(col("o_orderkey") % 97 === 3)
        .select((-col("o_orderkey")).as("o_orderkey"), col("o_custkey"),
          lit("N").as("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"),
          lit(false).as("_delete"))
      val feed = updates.unionByName(tombstones).unionByName(inserts)
      mergeUpsert(o, feed, Seq("o_orderkey"), deleteWhen = Some(col("_delete")))
    }),

    // ordered CDC feed with OUT-OF-ORDER versions: v1 updates %5 keys
    // (+1000), v2 updates %15 keys (+2000 — must beat its own key's v1),
    // v3 deletes %7 keys (must beat any update), v1 inserts ghost keys.
    // The feed is unioned in a deliberately shuffled order; version
    // resolution, not arrival order, decides every key.
    "cdc_apply" -> ((sp, dir) => {
      val o = graft.Tables(sp, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      def img(rows: DataFrame, price: Column, op: String, v: Long) =
        rows.select(col("o_orderkey"), price.as("o_totalprice"),
          col("o_orderpriority"),
          lit(op).as("cdc_op"), lit(v).as("cdc_version"))
      val feed =
        img(o.filter(col("o_orderkey") % 7 === 0), col("o_totalprice"), "D", 3L)
          .unionByName(img(o.filter(col("o_orderkey") % 15 === 0),
            col("o_totalprice") + 2000.0, "U", 2L))
          .unionByName(img(o.filter(col("o_orderkey") % 5 === 0),
            col("o_totalprice") + 1000.0, "U", 1L))
          .unionByName(img(
            o.filter(col("o_orderkey") % 11 === 0)
              .withColumn("o_orderkey", col("o_orderkey") + 1000000000L),
            lit(1.0), "I", 1L))
      applyCdc(o, feed, "o_orderkey")
    }))

  def oracles: Map[String, String] = Map(
    "scd2_snapshot" ->
      """WITH src AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'SEG_' || CAST(c_custkey % 5 AS VARCHAR)
        |         ELSE c_mktsegment END AS c_mktsegment,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
        |         ELSE c_acctbal END AS c_acctbal
        |  FROM customer WHERE c_custkey % 19 <> 5
        |  UNION ALL
        |  SELECT -c_custkey, 'NEWSEG', 0.0 FROM customer WHERE c_custkey % 13 = 1),
        |j AS (
        |  SELECT i.c_custkey AS tk, s.c_custkey AS sk,
        |    i.c_mktsegment AS t_seg, i.c_acctbal AS t_bal,
        |    s.c_mktsegment AS s_seg, s.c_acctbal AS s_bal,
        |    (i.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL AND
        |     (i.c_mktsegment IS DISTINCT FROM s.c_mktsegment OR
        |      i.c_acctbal IS DISTINCT FROM s.c_acctbal)) AS changed
        |  FROM customer i FULL OUTER JOIN src s ON i.c_custkey = s.c_custkey),
        |out AS (
        |  SELECT tk AS c_custkey, t_seg AS c_mktsegment, t_bal AS c_acctbal,
        |    DATE '2020-01-01' AS valid_from,
        |    CASE WHEN changed THEN DATE '2026-01-01' ELSE NULL END AS valid_to,
        |    NOT changed AS is_current
        |  FROM j WHERE tk IS NOT NULL
        |  UNION ALL
        |  SELECT sk, s_seg, s_bal, DATE '2026-01-01', NULL, TRUE
        |  FROM j WHERE sk IS NOT NULL AND (tk IS NULL OR changed))
        |SELECT c_custkey, c_mktsegment, c_acctbal,
        |  CAST(valid_from AS VARCHAR) AS valid_from,
        |  CAST(valid_to AS VARCHAR) AS valid_to, is_current,
        |  MD5(CAST(c_custkey AS VARCHAR) || '-' || CAST(valid_from AS VARCHAR)) AS scd_id
        |FROM out""".stripMargin,

    "merge_upsert" ->
      """WITH feed AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority,
        |    FALSE AS _delete
        |  FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 2
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |    o_orderpriority, TRUE
        |  FROM orders WHERE o_orderkey % 7 = 2
        |  UNION ALL
        |  SELECT -o_orderkey, o_custkey, 'N', o_totalprice, o_orderdate,
        |    o_orderpriority, FALSE
        |  FROM orders WHERE o_orderkey % 97 = 3)
        |SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
        |  o.o_orderdate, o.o_orderpriority
        |FROM orders o ANTI JOIN feed f ON o.o_orderkey = f.o_orderkey
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |  o_orderpriority
        |FROM feed WHERE NOT _delete""".stripMargin,
    "cdc_apply" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority,
        |    'I' AS cdc_op, 0 AS v
        |  FROM orders),
        |feed AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority, 'D' AS cdc_op, 3 AS v
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice + 2000.0, o_orderpriority, 'U', 2
        |  FROM orders WHERE o_orderkey % 15 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice + 1000.0, o_orderpriority, 'U', 1
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, 1.0, o_orderpriority, 'I', 1
        |  FROM orders WHERE o_orderkey % 11 = 0),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY v DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM feed))
        |SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM ranked WHERE rn = 1 AND cdc_op <> 'D'""".stripMargin)
}
