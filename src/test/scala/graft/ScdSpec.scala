package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd

/** SCD2 snapshot + MERGE upsert semantics across multiple merge batches —
  * the shapes one hash-gated battery batch can't pin: closed history
  * passing through later merges, a key changing twice, null-safe change
  * detection, and the not-matched-by-source delete variant.
  */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snapRows(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "seg", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1),
        String.valueOf(r.get(2)), String.valueOf(r.get(3)), r.getBoolean(4)))
      .toSet

  test("scd2 across three batches: versions accrue, history is immutable") {
    val d = (ts: String) => to_date(lit(ts))
    val v1 = Seq((1L, "A"), (2L, "B")).toDF("id", "seg")
    val snap0 = Scd.scd2Init(v1, "id", d("2024-01-01"))

    // batch 1: id=1 changes, id=2 unchanged, id=3 appears
    val src1 = Seq((1L, "A2"), (2L, "B"), (3L, "C")).toDF("id", "seg")
    val snap1 = Scd.scd2Merge(snap0, src1, "id", Seq("seg"), d("2024-02-01"))
    assert(snapRows(snap1) === Set(
      (1L, "A", "2024-01-01", "2024-02-01", false),
      (1L, "A2", "2024-02-01", "null", true),
      (2L, "B", "2024-01-01", "null", true),
      (3L, "C", "2024-02-01", "null", true)))

    // batch 2: id=1 changes AGAIN (third version), id=3 vanishes (stays
    // open — dbt default), id=2 still unchanged
    val src2 = Seq((1L, "A3"), (2L, "B")).toDF("id", "seg")
    val snap2 = Scd.scd2Merge(snap1, src2, "id", Seq("seg"), d("2024-03-01"))
    assert(snapRows(snap2) === Set(
      (1L, "A", "2024-01-01", "2024-02-01", false),
      (1L, "A2", "2024-02-01", "2024-03-01", false),
      (1L, "A3", "2024-03-01", "null", true),
      (2L, "B", "2024-01-01", "null", true),
      (3L, "C", "2024-02-01", "null", true)))

    // scd_id is version identity: distinct per (key, valid_from), stable
    // for untouched rows between batches
    val ids1 = snap1.select("id", "valid_from", "scd_id").as[(Long, java.sql.Date, String)]
      .collect().map(t => (t._1, t._2.toString) -> t._3).toMap
    val ids2 = snap2.select("id", "valid_from", "scd_id").as[(Long, java.sql.Date, String)]
      .collect().map(t => (t._1, t._2.toString) -> t._3).toMap
    assert(ids2.size === 5 && ids2.values.toSet.size === 5)
    ids1.foreach { case (k, v) => assert(ids2(k) === v, s"scd_id drifted for $k") }
  }

  test("scd2 change detection is null-safe in both directions") {
    val d = (ts: String) => to_date(lit(ts))
    val init = Scd.scd2Init(
      Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("id", "seg"),
      "id", d("2024-01-01"))
    val src = Seq((1L, Option.empty[String]), (2L, Option("y"))).toDF("id", "seg")
    val out = Scd.scd2Merge(init, src, "id", Seq("seg"), d("2024-02-01"))
    // both keys changed: value→null and null→value each close + reopen
    assert(out.filter(!col("is_current")).count() === 2)
    assert(out.filter(col("is_current")).count() === 2)
  }

  test("mergeUpsert variants: whole-row update, tombstone delete, not-matched-by-source delete") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    val feed = Seq((2L, "b2", 22.0, false), (3L, "c", 30.0, true), (4L, "d", 40.0, false))
      .toDF("id", "name", "v", "_del")

    val merged = Scd.mergeUpsert(target, feed, Seq("id"),
      deleteWhen = Some(col("_del")))
      .as[(Long, String, Double)].collect().toSet
    assert(merged === Set((1L, "a", 10.0), (2L, "b2", 22.0), (4L, "d", 40.0)))

    // full-refresh-by-merge: rows absent from the feed (id=1) are dropped
    val refreshed = Scd.mergeUpsert(target, feed, Seq("id"),
      deleteWhen = Some(col("_del")), deleteUnmatchedTarget = true)
      .as[(Long, String, Double)].collect().toSet
    assert(refreshed === Set((2L, "b2", 22.0), (4L, "d", 40.0)))
  }

  test("mergeUpsert at scale shape: the target side joins without shuffling its rows") {
    // the change feed is tiny → its key set must broadcast; the target's
    // contribution to the anti-join is a scan, not an exchange
    val target = spark.range(0, 10000).select(col("id"), (col("id") * 2).as("v"))
    val feed = spark.range(0, 10).select(col("id"), lit(-1L).as("v"))
    val plan = Scd.mergeUpsert(target, feed, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast anti-join, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"target shuffled for a 10-row feed:\n$plan")
  }

  test("MergeInc materialization rewrites only the partitions its feed touches") {
    import graft.graph.MergeInc
    val wh = java.nio.file.Files.createTempDirectory("merge-wh").toString
    val m = new graft.io.Materializer(spark, wh, clusterPartitions = 2)
    val mat = MergeInc(Seq("id"), partitionBy = Some("part"), deleteColumn = Some("_del"))

    val init = Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"), (4L, "d", "p3"))
      .toDF("id", "name", "part").withColumn("_del", lit(false))
    m.materialize("t_merge", init, mat)

    def files(part: String): Set[String] = {
      val d = new java.io.File(s"$wh/t_merge/part=$part")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    }
    val p1Before = files("p1")
    assert(p1Before.nonEmpty)

    // feed touches p2 (update + insert) and p3 (tombstone empties it); p1
    // partitions must pass through with their files physically untouched
    val feed = Seq((3L, "c2", "p2", false), (5L, "e", "p2", false), (4L, "d", "p3", true))
      .toDF("id", "name", "part", "_del")
    val out = m.materialize("t_merge", feed, mat)
      .select("id", "name", "part").as[(Long, String, String)].collect().toSet
    assert(out === Set((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c2", "p2"), (5L, "e", "p2")))
    assert(files("p1") === p1Before, "untouched partition was rewritten")
    assert(files("p3").isEmpty, "fully-deleted partition directory survived")
  }

  test("applyCdc: last-writer-wins across shuffled versions; WindowGroupLimit plan") {
    // one key per lifecycle: untouched, single update, update-then-update
    // (v2 beats v1), update-then-delete (delete wins), delete-then-revive
    // (higher-version upsert beats an earlier delete), pure insert
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("k", "v")
    // feed deliberately in scrambled arrival order
    val feed = Seq(
      (3L, "c2", "U", 2L), (4L, "dX", "U", 1L), (2L, "b1", "U", 1L),
      (4L, "d-gone", "D", 2L), (5L, "e-gone", "D", 1L), (3L, "c1", "U", 1L),
      (5L, "e-back", "U", 2L), (6L, "f", "I", 1L)
    ).toDF("k", "v", "cdc_op", "cdc_version")
    val out = Scd.applyCdc(base, feed, "k")
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "a"), (2L, "b1"), (3L, "c2"), (5L, "e-back"), (6L, "f")))
    // the rank-1 filter must execute as WindowGroupLimit (O(1) per-key
    // state during the scan), not a full window materialization
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }
}
