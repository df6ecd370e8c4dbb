package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference engine lacks (SURVEY.md §2 "beyond"
  * tier): as-of join and interval (range) join — both expressed as shapes
  * Catalyst can execute scalably, NOT as inequality nested-loop joins.
  *
  * Scale design:
  *  - [[asOfJoin]] is the union + sorted-window formulation: tag both inputs,
  *    union, one shuffle on the key, one per-partition sort on (time, side),
  *    carry the right side forward with `last(_, ignoreNulls)`. That is one
  *    exchange + one sort TOTAL — the naive `l.ts >= r.ts` join is a
  *    BroadcastNestedLoop in Spark (quadratic per key) and even a point-in-
  *    interval merge join re-sorts both sides. This is how a 100 TB event
  *    stream attributes to its most recent preceding fact.
  *  - [[rangeJoinBucketed]] maps intervals to fixed-width time buckets
  *    (explode to covered buckets ⇒ equi-join on (key, bucket) ⇒ exact
  *    range refilter). The equi-join shuffles hash-partitioned like any
  *    other join; bucket width trades replication (interval_len/width + 1
  *    copies) against per-bucket fan-in. With width = interval length at
  *    most 2 copies per interval.
  */
object Temporal {

  private def events(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "events")

  /** The shared click/purchase attribution inputs at the µs grain (same
    * truncate-before-compare and projection notes as `asof_last_purchase`).
    */
  private def clickPurchaseUs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"))
    (clicks, purchases)
  }

  /** As-of join, pandas-`merge_asof`/kdb-complete: for each left row, the
    * single nearest right row on the same key in the requested `direction`
    * — `"backward"` (most recent `right.time <= left.time`, the default),
    * `"forward"` (earliest `right.time >= left.time`), or `"nearest"`
    * (closer of the two; ties go backward, like pandas). A right row AT the
    * left timestamp matches in every direction (DuckDB/kdb ASOF ties).
    * `tolerance` (same units as `time`) bounds the match distance — a
    * candidate farther than the tolerance yields null, exactly like a
    * missing match.
    *
    * `carry` = right columns to surface (values at the matched row); output
    * = left columns + carried columns (null when no qualifying right row).
    *
    * Implementation: right rows sort BEFORE left rows at equal time via the
    * side tag (right=0, left=1), and ALL carried columns — plus the matched
    * row's own time, needed for tolerance/nearest decisions — travel in one
    * struct that is non-null exactly on right rows; `last(struct,
    * ignoreNulls)` then picks the nearest right ROW atomically. (Carrying
    * each column with its own `last(_, ignoreNulls)` would skip genuinely
    * null values on the matched row and fill them from OTHER right rows —
    * mixed-row output no ASOF semantics allows.) The forward scan is the
    * same window over descending time; `"nearest"` evaluates both window
    * frames over ONE shuffle (two sorts, same hash partitioning on the
    * key) — still never a nested-loop join, still one exchange total at
    * any scale.
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
               key: String, time: String,
               carry: Map[String, String],
               direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame =
    asOfJoinKeys(left, right, Seq(key), time, carry, direction, tolerance)

  /** Multi-key as-of join (pandas `merge_asof(by=[...])`): identical
    * semantics with a composite equality key — the shuffle partitions on
    * all key columns, everything else is unchanged.
    */
  def asOfJoinKeys(left: DataFrame, right: DataFrame,
                   keys: Seq[String], time: String,
                   carry: Map[String, String],
                   direction: String = "backward",
                   tolerance: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"asOfJoin direction must be backward|forward|nearest, got '$direction'")
    require(keys.nonEmpty, "asOfJoin needs at least one equality key")
    val leftCols = left.columns.toSeq
    val nullOf: String => Column = c => lit(null).cast(left.schema(c).dataType)
    val carrySrc = carry.keys.toSeq
    val timeType = right.schema(time).dataType
    val rowStruct = struct(col("__c___t").as("__t") +:
      carrySrc.map(c => col(s"__c_$c").as(c)): _*)
    val nullRow = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__t", timeType) +:
          carrySrc.map(c =>
            org.apache.spark.sql.types.StructField(c, right.schema(c).dataType))))
    // union-aligned projections: left keeps its columns, right contributes
    // only the carried sources (renamed), each side nulls the other's slots
    val lTagged = left.select(
      (leftCols.map(col) :+ lit(1).as("__side")) ++
        (lit(null).cast(timeType).as("__c___t") +:
          carrySrc.map(c => lit(null).cast(right.schema(c).dataType).as(s"__c_$c"))): _*)
    // SQL equality semantics for NULL keys: a null-keyed right row can never
    // match anything, so drop it BEFORE the union — the window's
    // partitionBy would otherwise group null keys together and hand a
    // null-keyed left row a null-keyed right row's carry (DuckDB's ASOF
    // `ON l.k = r.k`, pandas merge_asof, and any SQL join all disagree).
    // Null-keyed LEFT rows need no special path: with no null-keyed right
    // rows in their window partition the carry is null, which is exactly
    // the no-match result. NULL TIMES get the same treatment: `l.ts >= r.ts`
    // is null-valued in SQL, so a null-timed right row matches nothing —
    // but ascending-nulls-first ordering would sort it to the partition
    // front where an un-filtered `last` carry could adopt it for a key
    // with no other purchases. One filter, zero extra scans.
    val rTagged = right
      .filter((keys :+ time).map(col(_).isNotNull).reduce(_ && _))
      .select(
      (leftCols.map(c =>
        (if (keys.contains(c) || c == time) col(c) else nullOf(c)).as(c)) :+
        lit(0).as("__side")) ++
        (col(time).as("__c___t") +: carrySrc.map(c => col(c).as(s"__c_$c"))): _*)
    def carried(ord: Column*): Column =
      last(when(col("__side") === 0, rowStruct).otherwise(nullRow),
        ignoreNulls = true).over(
        Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    // only materialize the window frame(s) the direction needs — backward/
    // forward pay one sort; nearest pays two over the same exchange
    val carriedCols =
      (if (direction != "forward")
        Seq(carried(col(time), col("__side")).as("__b")) else Nil) ++
      (if (direction != "backward")
        Seq(carried(col(time).desc, col("__side")).as("__f")) else Nil)
    val stepped = lTagged.unionByName(rTagged)
      .select((leftCols.map(col) :+ col("__side")) ++ carriedCols: _*)
      .filter(col("__side") === 1)
    val lt = col(time)
    def gate(c: Column, dist: Column => Column): Column = tolerance match {
      case Some(tol) => when(dist(c.getField("__t")) <= tol, c)
      case None => c
    }
    val chosen = direction match {
      case "backward" => gate(col("__b"), lt - _)
      case "forward"  => gate(col("__f"), _ - lt)
      case "nearest"  =>
        val b = gate(col("__b"), lt - _)
        val f = gate(col("__f"), _ - lt)
        when(b.isNotNull &&
          (f.isNull || (lt - b.getField("__t")) <= (f.getField("__t") - lt)), b)
          .otherwise(f)
    }
    // a null-timed LEFT row matches nothing either (same SQL null
    // comparison): backward ordering already yields null for it (nulls
    // sort first, before every right row of the key), but the forward
    // frame's DESCENDING sort puts nulls last — after every right row —
    // so an ungated carry would hand it the key's earliest purchase
    val guarded = when(lt.isNotNull, chosen)
    stepped.select(leftCols.map(col) ++ carry.toSeq.map { case (src, out) =>
      guarded.getField(src).as(out)
    }: _*)
  }

  /** Interval join via time bucketing: events ⋈ intervals on
    * `event.time ∈ (start, end]` and a shared key, as an EQUI-join.
    *
    * Each interval explodes to the buckets it covers; each event has exactly
    * one bucket, so a matching (interval, event) pair meets in exactly one
    * bucket — no post-join dedup needed. The exact range predicate refilters
    * after the equi-join.
    */
  def rangeJoinBucketed(intervals: DataFrame, points: DataFrame,
                        key: String, startCol: String, endCol: String,
                        timeCol: String, bucketWidth: Long): DataFrame = {
    // integer `div`, NOT `/`: double division on nano-epoch longs (~2^60,
    // beyond double's 53-bit mantissa) can misplace a boundary-adjacent row
    // by one bucket. Truncation == floor for the positive-epoch corpus
    // contract (same note as EventStreams.withEventTime).
    val iv = intervals.withColumn("__b",
      explode(sequence(expr(s"`$startCol` div $bucketWidth"),
        expr(s"`$endCol` div $bucketWidth"))))
    val pt = points.withColumn("__b", expr(s"`$timeCol` div $bucketWidth"))
    iv.join(pt, Seq(key, "__b"))
      .filter(col(timeCol) > col(startCol) && col(timeCol) <= col(endCol))
      .drop("__b")
  }

  /** Interval-OVERLAP join (both sides intervals — the shape rangeJoinBucketed
    * can't express): pairs with `a.start < b.end AND b.start < a.end` on a
    * shared key, as an EQUI-join on (key, bucket). Both sides explode to the
    * buckets they cover; an overlapping pair shares every bucket between
    * `max(a.start, b.start) div w` and the earlier end, so the join keeps a
    * pair only in its OWNER bucket — `greatest(a.start div w, b.start div w)`
    * — which both sides provably cover (the later-starting side covers its
    * own start bucket; the earlier side covers it because its end exceeds
    * the later start). Exact, with NO post-join distinct shuffle; the
    * replication factor is interval_len/width + 1 per side, and the exact
    * predicate refilters after the equi-join.
    */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame, key: String,
                          aStart: String, aEnd: String,
                          bStart: String, bEnd: String,
                          bucketWidth: Long): DataFrame = {
    val ae = a.withColumn("__b",
      explode(sequence(expr(s"`$aStart` div $bucketWidth"),
        expr(s"`$aEnd` div $bucketWidth"))))
    val be = b.withColumn("__b",
      explode(sequence(expr(s"`$bStart` div $bucketWidth"),
        expr(s"`$bEnd` div $bucketWidth"))))
    ae.join(be, Seq(key, "__b"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("__b") ===
        greatest(expr(s"`$aStart` div $bucketWidth"),
          expr(s"`$bStart` div $bucketWidth")))
      .drop("__b")
  }

  /** Gap-filled resample — the time-series regularization step (pandas
    * `resample().ffill()`, InfluxDB `fill(previous)`): per key, an
    * evenly-spaced bucket grid over the observed range where each bucket
    * carries its own aggregate when observations exist and the most recent
    * prior bucket's aggregate otherwise (step-function carry; buckets
    * before a key's first observation stay null — there is nothing to
    * carry). `is_gap` marks filled buckets so downstream stats can weight
    * real and carried points differently. Complements `resample_locf`
    * below: LOCF aligns RAW observations onto a grid (as-of join, no
    * aggregation); this operator AGGREGATES per bucket first and carries
    * the bucket aggregate — the `resample().sum().ffill()` shape.
    *
    * Scale shape: ONE hash aggregation bounded by keys×buckets (map-side
    * partial combine — the corpus never shuffles raw), a grid built
    * lazily from `sequence(min,max)` × distinct keys (metadata-sized, no
    * driver collect), and one per-key ordered window for the carry. The
    * aggregate folds in DECIMAL so the carried values hash identically in
    * any engine.
    */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: Column, bucketWidth: Long): DataFrame = {
    val bucket = expr(s"`$tsCol` div $bucketWidth")
    val obs = df.groupBy(col(keyCol), bucket.as("bucket"))
      .agg(sum(valueCol.cast("decimal(18,2)")).as("v"))
    val bounds = df.agg(min(bucket).as("mn"), max(bucket).as("mx"))
    val grid = df.select(col(keyCol)).distinct()
      .crossJoin(bounds.select(explode(sequence(col("mn"), col("mx"))).as("bucket")))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        last(col("v"), ignoreNulls = true).over(w)
          .cast("double").as("value_ffill"),
        col("v").isNull.as("is_gap"))
  }

  /** Exponentially-weighted moving average per entity — the smoothing
    * primitive of a metrics/feature pipeline: ordered by (ts, id), each
    * entity's series folds y₀ = x₀, yₜ = α·xₜ + (1−α)·yₜ₋₁.
    *
    * Spelling: ONE fold per entity — `collect_list` + `array_sort` + the
    * `aggregate` HOF building the whole smoothed series in a single O(n)
    * pass (a per-row prefix fold would be O(n²); a window function cannot
    * express the recursion at all — yₜ needs yₜ₋₁, not a frame aggregate).
    * Scale contract: per-entity SEQUENTIAL recursion is inherently ordered,
    * so the unit of parallelism is the entity — key cardinality gives the
    * cluster its fan-out and one entity's history must fit in task memory,
    * the same per-group-bounded contract as the packing/session operators.
    *
    * Cross-engine exact UNROUNDED: the fold is sequential IEEE doubles in
    * a deterministic order — both engines evaluate (α·x) + ((1−α)·acc)
    * left-to-right over the identically-sorted series (ties on ts broken
    * by id), so every intermediate is bit-identical, the [[VectorFns]]
    * sequential-double contract.
    */
  def ewmaSmooth(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
                 valCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val a = lit(alpha)
    val b = lit(1.0 - alpha)
    val evs = array_sort(collect_list(struct(col(tsCol).as("ts"),
      col(idCol).as("id"), col(valCol).cast("double").as("v"))))
    val first = element_at(col("evs"), 1).getField("v")
    val rest = slice(col("evs"), lit(2), greatest(size(col("evs")) - 1, lit(0)))
    val ys = aggregate(rest,
      struct(first.as("acc"), array(first).as("out")),
      (acc, e) => {
        val y = a * e.getField("v") + b * acc.getField("acc")
        struct(y.as("acc"), concat(acc.getField("out"), array(y)).as("out"))
      },
      acc => acc.getField("out"))
    df.groupBy(col(keyCol)).agg(evs.as("evs"))
      .withColumn("ys", ys)
      .select(col(keyCol), explode(arrays_zip(col("evs"), col("ys"))).as("z"))
      .select(col(keyCol), col("z.evs.id").as(idCol), col("z.ys").as("ewma"))
  }

  /** Holt double-exponential smoothing (level + linear trend) per entity —
    * [[ewmaSmooth]]'s big sibling for drifting series: EWMA lags a trending
    * signal by design, Holt tracks it. Ordered by (ts, id):
    *   l₀ = x₀, b₀ = 0
    *   lₜ = α·xₜ + (1−α)·(lₜ₋₁ + bₜ₋₁)
    *   bₜ = β·(lₜ − lₜ₋₁) + (1−β)·bₜ₋₁
    * emitting the level series (the one-step fit). Same single-fold
    * spelling, same per-entity-bounded scale contract, and the same
    * cross-engine EXACT UNROUNDED guarantee as [[ewmaSmooth]]: a coupled
    * recursion is still a deterministic sequential chain of IEEE +,−,×
    * over the identically-sorted series, and the oracle carries the SAME
    * literal complements (interpolated from these Scala doubles, not
    * re-derived in SQL — 1−β re-rounded independently could differ by an
    * ulp and snowball through the fold).
    */
  def holtSmooth(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
                 valCol: String, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0, 1], got $beta")
    val a = lit(alpha)
    val ac = lit(1.0 - alpha)
    val bb = lit(beta)
    val bc = lit(1.0 - beta)
    val evs = array_sort(collect_list(struct(col(tsCol).as("ts"),
      col(idCol).as("id"), col(valCol).cast("double").as("v"))))
    val first = element_at(col("evs"), 1).getField("v")
    val rest = slice(col("evs"), lit(2), greatest(size(col("evs")) - 1, lit(0)))
    val ys = aggregate(rest,
      struct(first.as("l"), lit(0.0).as("b"), array(first).as("out")),
      (acc, e) => {
        val lnew = a * e.getField("v") +
          ac * (acc.getField("l") + acc.getField("b"))
        val bnew = bb * (lnew - acc.getField("l")) + bc * acc.getField("b")
        struct(lnew.as("l"), bnew.as("b"),
          concat(acc.getField("out"), array(lnew)).as("out"))
      },
      acc => acc.getField("out"))
    df.groupBy(col(keyCol)).agg(evs.as("evs"))
      .withColumn("ys", ys)
      .select(col(keyCol), explode(arrays_zip(col("evs"), col("ys"))).as("z"))
      .select(col(keyCol), col("z.evs.id").as(idCol), col("z.ys").as("holt_level"))
  }

  /** Exact median of a SORTED numeric array column: middle element (odd
    * count) or the IEEE mean of the two middles (even) — spelled
    * explicitly so the engine and the DuckDB oracle share one definition
    * instead of trusting two engines' `median()` interpolation rules to
    * agree.
    */
  private def medianOfSorted(arr: Column): Column = {
    val n = size(arr)
    // Column `/` is double division; the quotients here are exact small
    // integers, so the int cast is lossless index arithmetic
    val mid = ((n + 1) / 2).cast("int")
    val lo = (n / 2).cast("int")
    when(n % 2 === 1, element_at(arr, mid))
      .otherwise((element_at(arr, lo) + element_at(arr, lo + 1)) / 2.0)
  }

  /** Robust rolling anomaly flags — median absolute deviation over a
    * trailing row window (Hampel-style): per entity ordered by (ts, id),
    * each row's flag is |x − med| > cut·MAD where med and MAD are the
    * EXACT median / median-absolute-deviation of the last `lookback`+1
    * values. Median-based (not mean/stddev) because one spike inflates a
    * stddev enough to mask the next one — the robustness property every
    * production metrics monitor wants.
    *
    * Scale shape: the frame is a ROWS window of bounded width, so the
    * collected window array is O(lookback) per row — one shuffle on the
    * entity key, no per-entity unbounded state (contrast [[ewmaSmooth]],
    * whose recursion is inherently whole-series). Exactness: medians are
    * order statistics of stored doubles (even case = one IEEE mean), MAD
    * likewise over |x − med| — every output is deterministic arithmetic
    * on stored values, oracle-compared unrounded.
    */
  def rollingMadAnomaly(df: DataFrame, keyCol: String, tsCol: String,
                        idCol: String, valCol: String, lookback: Int = 4,
                        cut: Double = 3.0): DataFrame = {
    require(lookback >= 1, s"lookback must be ≥ 1, got $lookback")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-lookback, Window.currentRow)
    val v = col(valCol).cast("double")
    df.withColumn("win", sort_array(collect_list(v).over(w)))
      .withColumn("med", medianOfSorted(col("win")))
      .withColumn("mad", medianOfSorted(
        sort_array(transform(col("win"), x => abs(x - col("med"))))))
      .select(col(keyCol), col(idCol), v.as("value"),
        col("med"), col("mad"),
        (abs(v - col("med")) > lit(cut) * col("mad")).as("is_anomaly"))
  }

  /** Gap-based batch sessionization — the batch twin of the streaming
    * `stream_sessionize` state machine: per entity ordered by (ts, id), a
    * new session starts wherever the gap to the previous event exceeds
    * `gapUs`; `session_seq` is the 0-based running count of those breaks
    * (one ordered-window prefix sum) and `event_seq` numbers events within
    * the session. Two windows over ONE entity-keyed sort — no self-join,
    * no per-entity collected state (contrast [[ewmaSmooth]]); all outputs
    * are exact integer arithmetic on the µs timeline, so the oracle is a
    * verbatim SQL window replay.
    */
  def sessionize(df: DataFrame, keyCol: String, tsUsCol: String,
                 idCol: String, gapUs: Long): DataFrame = {
    require(gapUs > 0, s"gap must be positive, got $gapUs")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(idCol))
    val break = when(
      col(tsUsCol) - lag(col(tsUsCol), 1).over(w) > gapUs, 1L).otherwise(0L)
    val withSess = df
      .withColumn("session_seq",
        sum(break).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val wSess = Window.partitionBy(col(keyCol), col("session_seq"))
      .orderBy(col(tsUsCol), col(idCol))
    withSess.select(col(keyCol), col(idCol), col("session_seq"),
      row_number().over(wSess).cast("long").as("event_seq"))
  }

  /** Interval coalescing (the classic gaps-and-islands): per key, merge
    * overlapping-or-touching `[start, end]` intervals into maximal
    * disjoint spans. An island starts where `start` exceeds the running
    * maximum of all PRIOR ends (running max, not `lag(end)` — an interval
    * fully contained in an earlier long one must not split the island);
    * islands number by prefix sum and reduce to (span, merged count).
    *
    * Two windows + one aggregate over a single key-partitioned sort —
    * no self-join (the naive overlap-join spelling is O(n²) per key and
    * loses transitive merges). Exact integer arithmetic end to end, so
    * the oracle is a verbatim window-SQL replay.
    */
  def coalesceIntervals(df: DataFrame, keyCol: String, startCol: String,
                        endCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val break = when(prevMax.isNull || col(startCol) > prevMax, 1L)
      .otherwise(0L)
    df.withColumn("island",
        sum(break).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_merged"))
      .select(col(keyCol), (col("island") - 1).as("span_seq"),
        col("span_start"), col("span_end"), col("n_merged"))
  }

  /** 30 minutes in nanoseconds (events.ts is a nano-epoch long). */
  private val AttribWindowNs = 30L * 60 * 1000 * 1000 * 1000

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // as-of join: each click attributed to the user's most recent
    // at-or-before purchase (null when none) — one shuffle + one sort.
    // µs grain BEFORE the join: DuckDB reads parquet TIMESTAMP(NANOS) at µs
    // precision, so the join itself must compare the truncated values or a
    // sub-µs-apart (click, purchase) pair could order differently in the two
    // engines (`div` truncation == floor for the positive-epoch corpus).
    // -1 sentinel instead of NULL for "no preceding purchase": a nullable
    // int64 round-trips through the compare as float64, which cannot
    // represent a µs-epoch exactly.
    "asof_last_purchase" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts div 1000").as("ts_us"))
      asOfJoin(clicks, purchases, key = "user_id", time = "ts_us",
          carry = Map("ts_us" -> "purchase_us"))
        .select(col("event_id"), col("user_id"),
          col("ts_us").as("click_us"),
          coalesce(col("purchase_us"), lit(-1L)).as("purchase_us"))
    }),

    // multi-key as-of (merge_asof by=[user, day]): most recent purchase
    // at-or-before the click WITHIN the same UTC day — a composite
    // equality key, one shuffle on both columns
    "asof_same_day_purchase" -> ((s, dir) => {
      val ev = events(s, dir)
      val dayUs = 86400L * 1000 * 1000
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          expr(s"(ts div 1000) div $dayUs").as("day_idx"),
          expr("ts div 1000").as("ts_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"),
          expr(s"(ts div 1000) div $dayUs").as("day_idx"),
          expr("ts div 1000").as("ts_us"))
      asOfJoinKeys(clicks, purchases, keys = Seq("user_id", "day_idx"),
          time = "ts_us", carry = Map("ts_us" -> "purchase_us"))
        .select(col("event_id"), col("user_id"), col("day_idx"),
          col("ts_us").as("click_us"),
          coalesce(col("purchase_us"), lit(-1L)).as("purchase_us"))
    }),

    // forward as-of: each click attributed to the user's NEXT purchase at
    // or after it — the "time-to-conversion" shape (same µs-grain and -1
    // sentinel notes as asof_last_purchase)
    "asof_next_purchase" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts div 1000").as("ts_us"))
      asOfJoin(clicks, purchases, key = "user_id", time = "ts_us",
          carry = Map("ts_us" -> "purchase_us"), direction = "forward")
        .select(col("event_id"), col("user_id"),
          col("ts_us").as("click_us"),
          coalesce(col("purchase_us"), lit(-1L)).as("purchase_us"))
    }),

    // bounded-lookback as-of: most recent purchase within 30 minutes before
    // the click; a staler match nulls out exactly like no match (pandas
    // merge_asof tolerance semantics)
    "asof_tolerance_attrib" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts div 1000").as("ts_us"))
      asOfJoin(clicks, purchases, key = "user_id", time = "ts_us",
          carry = Map("ts_us" -> "purchase_us"),
          tolerance = Some(AttribWindowNs / 1000))
        .select(col("event_id"), col("user_id"),
          col("ts_us").as("click_us"),
          coalesce(col("purchase_us"), lit(-1L)).as("purchase_us"))
    }),

    // nearest as-of: the purchase closest to each click in either
    // direction, ties to the preceding one (pandas direction='nearest') —
    // both window frames ride ONE shuffle
    "asof_nearest_purchase" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts div 1000").as("ts_us"))
      asOfJoin(clicks, purchases, key = "user_id", time = "ts_us",
          carry = Map("ts_us" -> "purchase_us"), direction = "nearest")
        .select(col("event_id"), col("user_id"),
          col("ts_us").as("click_us"),
          coalesce(col("purchase_us"), lit(-1L)).as("purchase_us"))
    }),

    // ---- native as-of tier: the SAME four attribution queries on the
    // whole-operator Catalyst extension (GraftAsOfJoin logical node →
    // AsOfJoinStrategy → streaming-merge exec; see plans/AsOfJoinPlan).
    // Each shares its declarative twin's DuckDB oracle verbatim, so the
    // two formulations are hash-pinned against the SAME ground truth —
    // any semantic drift between the tiers breaks a gate, not a spec.
    "asof_native_backward" -> ((s, dir) => {
      val (clicks, purchases) = clickPurchaseUs(s, dir)
      graft.plans.AsOfJoinNative.asOfJoinKeys(clicks, purchases,
          keys = Seq("user_id"), time = "ts_us",
          carry = Map("ts_us" -> "purchase_us"))
        .select(col("event_id"), col("user_id"),
          col("ts_us").as("click_us"),
          coalesce(col("purchase_us"), lit(-1L)).as("purchase_us"))
    }),
    "asof_native_forward" -> ((s, dir) => {
      val (clicks, purchases) = clickPurchaseUs(s, dir)
      graft.plans.AsOfJoinNative.asOfJoinKeys(clicks, purchases,
          keys = Seq("user_id"), time = "ts_us",
          carry = Map("ts_us" -> "purchase_us"), direction = "forward")
        .select(col("event_id"), col("user_id"),
          col("ts_us").as("click_us"),
          coalesce(col("purchase_us"), lit(-1L)).as("purchase_us"))
    }),
    "asof_native_nearest" -> ((s, dir) => {
      val (clicks, purchases) = clickPurchaseUs(s, dir)
      graft.plans.AsOfJoinNative.asOfJoinKeys(clicks, purchases,
          keys = Seq("user_id"), time = "ts_us",
          carry = Map("ts_us" -> "purchase_us"), direction = "nearest")
        .select(col("event_id"), col("user_id"),
          col("ts_us").as("click_us"),
          coalesce(col("purchase_us"), lit(-1L)).as("purchase_us"))
    }),
    "asof_native_tolerance" -> ((s, dir) => {
      val (clicks, purchases) = clickPurchaseUs(s, dir)
      graft.plans.AsOfJoinNative.asOfJoinKeys(clicks, purchases,
          keys = Seq("user_id"), time = "ts_us",
          carry = Map("ts_us" -> "purchase_us"),
          tolerance = Some(AttribWindowNs / 1000))
        .select(col("event_id"), col("user_id"),
          col("ts_us").as("click_us"),
          coalesce(col("purchase_us"), lit(-1L)).as("purchase_us"))
    }),
    // composite-key native as-of (merge_asof by=[user, day])
    "asof_native_same_day" -> ((s, dir) => {
      val ev = events(s, dir)
      val dayUs = 86400L * 1000 * 1000
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          expr(s"(ts div 1000) div $dayUs").as("day_idx"),
          expr("ts div 1000").as("ts_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"),
          expr(s"(ts div 1000) div $dayUs").as("day_idx"),
          expr("ts div 1000").as("ts_us"))
      graft.plans.AsOfJoinNative.asOfJoinKeys(clicks, purchases,
          keys = Seq("user_id", "day_idx"), time = "ts_us",
          carry = Map("ts_us" -> "purchase_us"))
        .select(col("event_id"), col("user_id"), col("day_idx"),
          col("ts_us").as("click_us"),
          coalesce(col("purchase_us"), lit(-1L)).as("purchase_us"))
    }),

    // interval-overlap join: purchase attribution windows [ts, ts+30min)
    // overlapping click engagement windows [ts, ts+5min) per user — both
    // sides are intervals, bucketed equi-join, owner-bucket dedup-free
    "interval_overlap_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val pw = AttribWindowNs / 1000          // 30 min in µs
      val cw = 5L * 60 * 1000 * 1000          // 5 min in µs
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          expr("ts div 1000").as("p_start"),
          (expr("ts div 1000") + pw).as("p_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          expr("ts div 1000").as("c_start"),
          (expr("ts div 1000") + cw).as("c_end"))
      intervalOverlapJoin(purchases, clicks, key = "user_id",
          aStart = "p_start", aEnd = "p_end",
          bStart = "c_start", bEnd = "c_end", bucketWidth = pw)
        .select(col("purchase_id"), col("click_id"))
    }),

    // time-grid resample with LOCF gap-fill: each user's value series
    // downsampled to a 6-hour grid, every grid point carrying the most
    // recent at-or-before observation — the composition asOfJoin exists
    // for (grid = explode(sequence(...)), so generation is parallel per
    // user, then ONE shuffle for the as-of). Events at an identical µs
    // pre-reduce to max(value): asOfJoin's "latest right row" is otherwise
    // tie-ambiguous between engines at equal time.
    // interval coalescing over ±3 h event windows (gaps-and-islands —
    // merged availability spans per user); exact integers, verbatim oracle
    "ts_interval_coalesce" -> ((s, dir) =>
      coalesceIntervals(events(s, dir)
          .select(col("user_id"),
            (expr("ts div 1000") - 10800000000L).as("iv_start"),
            (expr("ts div 1000") + 10800000000L).as("iv_end")),
        "user_id", "iv_start", "iv_end")),

    // gap-based batch sessionization (12 h µs gap — the corpus's median
    // inter-event gap is ~7 h, so sessions split non-trivially); exact
    // integer outputs, verbatim window-SQL oracle
    "ts_sessionize" -> ((s, dir) =>
      sessionize(events(s, dir)
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id")),
        "user_id", "ts_us", "event_id", gapUs = 43200000000L)),

    // rolling-MAD (Hampel) anomaly flags over each user's value series —
    // exact order-statistic medians, bounded 5-row frames, unrounded
    "ts_rolling_mad_anomaly" -> ((s, dir) =>
      rollingMadAnomaly(events(s, dir), "user_id", "ts", "event_id",
        "value", lookback = 4, cut = 3.0)),

    // per-user EWMA (α=0.3) over the event value series — one O(n) fold
    // per entity; exact unrounded cross-engine (sequential IEEE fold over
    // the identically-sorted series — see ewmaSmooth)
    "ts_ewma_smooth" -> ((s, dir) =>
      ewmaSmooth(events(s, dir), "user_id", "ts", "event_id", "value",
        alpha = 0.3)),

    // Holt level+trend smoothing, bit-exact unrounded (oracle replays the
    // same coupled fold with the same interpolated literal complements)
    "ts_holt_linear" -> ((s, dir) =>
      holtSmooth(events(s, dir), "user_id", "ts", "event_id", "value",
        alpha = 0.5, beta = 0.3)),

    "resample_locf" -> ((s, dir) => {
      val stepUs = 6L * 3600 * 1000 * 1000
      val ev = events(s, dir)
        .select(col("user_id"), expr("ts div 1000").as("g_us"), col("value"))
      val pts = ev.groupBy(col("user_id"), col("g_us"))
        .agg(max(col("value")).as("value"))
      val grid = ev.groupBy(col("user_id"))
        .agg(min(col("g_us")).as("mn"), max(col("g_us")).as("mx"))
        .filter(expr(s"(mn + ${stepUs - 1}) div $stepUs") <= expr(s"mx div $stepUs"))
        .select(col("user_id"),
          explode(sequence(expr(s"(mn + ${stepUs - 1}) div $stepUs"),
            expr(s"mx div $stepUs"))).as("g"))
        .select(col("user_id"), (col("g") * stepUs).as("g_us"))
      asOfJoin(grid, pts, key = "user_id", time = "g_us",
          carry = Map("value" -> "value"))
        .select(col("user_id"), col("g_us"), col("value"))
    }),

    // range join: clicks landing in (purchase, purchase + 30min] per user,
    // aggregated per purchase — bucketed equi-join, exact-decimal value sum.
    // µs grain on both engines (same truncate-before-compare note as asof).
    "range_join_attrib" -> ((s, dir) => {
      val ev = events(s, dir)
      val windowUs = AttribWindowNs / 1000
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          expr("ts div 1000").as("start_us"),
          (expr("ts div 1000") + windowUs).as("end_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), expr("ts div 1000").as("t_us"),
          col("value").cast("decimal(18,2)").as("v"))
      val joined = rangeJoinBucketed(purchases, clicks, key = "user_id",
        startCol = "start_us", endCol = "end_us", timeCol = "t_us",
        bucketWidth = windowUs)
      val agg = joined.groupBy(col("purchase_id"))
        .agg(count(lit(1)).as("n_clicks"),
          sum(col("v")).cast("double").as("click_value"))
      // left join back so zero-click purchases surface with (0, 0.0)
      purchases.select(col("purchase_id"))
        .join(agg, Seq("purchase_id"), "left")
        .select(col("purchase_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("click_value"), lit(0.0)).as("click_value"))
    }),

    // gap-filled hourly resample of per-type event value sums: the grid is
    // keys × observed-range buckets, empty hours carry the previous hour's
    // sum (is_gap marks them), hours before a type's first observation
    // stay null. Decimal-folded sums so both engines carry identical values.
    "ts_resample_ffill" -> ((s, dir) =>
      resampleFfill(events(s, dir), keyCol = "event_type", tsCol = "ts",
        valueCol = col("value"), bucketWidth = 3600L * 1000 * 1000 * 1000))
  )

  /** The native tier shares its declarative twin's oracle SQL verbatim —
    * one ground truth, two engines pinned to it.
    */
  private def nativeOracles: Map[String, String] = Map(
    "asof_native_backward" -> "asof_last_purchase",
    "asof_native_forward" -> "asof_next_purchase",
    "asof_native_nearest" -> "asof_nearest_purchase",
    "asof_native_tolerance" -> "asof_tolerance_attrib",
    "asof_native_same_day" -> "asof_same_day_purchase")

  def oracles: Map[String, String] = baseOracles ++
    nativeOracles.map { case (k, twin) => k -> baseOracles(twin) }

  private def baseOracles: Map[String, String] = Map(
    "asof_last_purchase" ->
      """SELECT l.event_id, l.user_id, epoch_us(l.ts) AS click_us,
        |       COALESCE(epoch_us(r.ts), -1) AS purchase_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,
    "asof_same_day_purchase" ->
      """SELECT l.event_id, l.user_id,
        |  epoch_us(l.ts) // 86400000000 AS day_idx,
        |  epoch_us(l.ts) AS click_us,
        |  COALESCE(epoch_us(r.ts), -1) AS purchase_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id
        | AND epoch_us(l.ts) // 86400000000 = epoch_us(r.ts) // 86400000000
        | AND l.ts >= r.ts""".stripMargin,
    "asof_next_purchase" ->
      """SELECT l.event_id, l.user_id, epoch_us(l.ts) AS click_us,
        |       COALESCE(epoch_us(r.ts), -1) AS purchase_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND l.ts <= r.ts""".stripMargin,
    "asof_tolerance_attrib" ->
      """SELECT l.event_id, l.user_id, epoch_us(l.ts) AS click_us,
        |  COALESCE(CASE WHEN epoch_us(l.ts) - epoch_us(r.ts) <= 1800000000
        |    THEN epoch_us(r.ts) END, -1) AS purchase_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,
    "asof_nearest_purchase" ->
      """WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
        |p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT c.event_id, epoch_us(r.ts) AS bt FROM c
        |      ASOF LEFT JOIN p r ON c.user_id = r.user_id AND c.ts >= r.ts),
        |f AS (SELECT c.event_id, epoch_us(r.ts) AS ft FROM c
        |      ASOF LEFT JOIN p r ON c.user_id = r.user_id AND c.ts <= r.ts)
        |SELECT c.event_id, c.user_id, epoch_us(c.ts) AS click_us,
        |  COALESCE(CASE WHEN b.bt IS NOT NULL AND (f.ft IS NULL
        |      OR epoch_us(c.ts) - b.bt <= f.ft - epoch_us(c.ts))
        |    THEN b.bt ELSE f.ft END, -1) AS purchase_us
        |FROM c JOIN b USING (event_id) JOIN f USING (event_id)""".stripMargin,
    "interval_overlap_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND epoch_us(p.ts) < epoch_us(c.ts) + 300000000
        | AND epoch_us(c.ts) < epoch_us(p.ts) + 1800000000""".stripMargin,
    // interval coalescing replayed verbatim: running-max island breaks
    "ts_interval_coalesce" ->
      """WITH e AS (SELECT user_id,
        |    epoch_us(ts) - 10800000000 AS iv_start,
        |    epoch_us(ts) + 10800000000 AS iv_end
        |  FROM events),
        |b AS (SELECT user_id, iv_start, iv_end,
        |    CASE WHEN MAX(iv_end) OVER (PARTITION BY user_id
        |        ORDER BY iv_start, iv_end
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |        IS NULL THEN 1
        |      WHEN iv_start > MAX(iv_end) OVER (PARTITION BY user_id
        |        ORDER BY iv_start, iv_end
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |        THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (SELECT user_id, iv_start, iv_end,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY iv_start, iv_end
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM b)
        |SELECT user_id, CAST(island - 1 AS BIGINT) AS span_seq,
        |  MIN(iv_start) AS span_start, MAX(iv_end) AS span_end,
        |  COUNT(*) AS n_merged
        |FROM s GROUP BY user_id, island""".stripMargin,
    // sessionization replayed verbatim: the same break/prefix-sum windows
    "ts_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events),
        |b AS (SELECT user_id, event_id, ts_us,
        |    CASE WHEN ts_us - lag(ts_us) OVER
        |      (PARTITION BY user_id ORDER BY ts_us, event_id)
        |      > 43200000000 THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (SELECT user_id, event_id, ts_us,
        |    CAST(SUM(brk) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_seq
        |  FROM b)
        |SELECT user_id, event_id, session_seq,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
        |    ORDER BY ts_us, event_id) AS BIGINT) AS event_seq
        |FROM s""".stripMargin,
    // rolling MAD replayed with the SAME explicit sorted-middle median
    // definition (never DuckDB's own median() — two engines' even-count
    // interpolation rules are not a contract); list() as a framed window
    // aggregate mirrors collect_list over the rows frame
    "ts_rolling_mad_anomaly" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |    CAST(value AS DOUBLE) AS v FROM events),
        |w AS (SELECT user_id, event_id, v,
        |    list_sort(list(v) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS win
        |  FROM e),
        |m AS (SELECT *,
        |    CASE WHEN len(win) % 2 = 1 THEN win[(len(win)+1)//2]
        |         ELSE (win[len(win)//2] + win[len(win)//2 + 1])
        |              / CAST(2 AS DOUBLE) END AS med
        |  FROM w),
        |d AS (SELECT *,
        |    list_sort(list_transform(win, x -> abs(x - med))) AS devs
        |  FROM m),
        |md AS (SELECT *,
        |    CASE WHEN len(devs) % 2 = 1 THEN devs[(len(devs)+1)//2]
        |         ELSE (devs[len(devs)//2] + devs[len(devs)//2 + 1])
        |              / CAST(2 AS DOUBLE) END AS mad
        |  FROM d)
        |SELECT user_id, event_id, v AS value, med, mad,
        |  abs(v - med) > CAST(3 AS DOUBLE) * mad AS is_anomaly
        |FROM md""".stripMargin,
    // EWMA replayed as a per-row prefix fold (list_reduce folds left with
    // the first element as init — exactly the y₀ = x₀ convention); the
    // oracle kernel is O(n²)/entity, the engine path is the one-pass fold —
    // the documented oracle-kernel/production-path split. CAST(.. AS
    // DOUBLE) on the α literals: DuckDB parses 0.3 as DECIMAL and would
    // fold in decimal arithmetic otherwise.
    "ts_ewma_smooth" ->
      """WITH s AS (
        |  SELECT user_id,
        |    list_sort(list({'ts': ts, 'id': event_id,
        |                    'v': CAST(value AS DOUBLE)})) AS evs
        |  FROM events GROUP BY user_id),
        |u AS (
        |  SELECT user_id, evs,
        |    generate_subscripts(evs, 1) AS t, UNNEST(evs) AS ev
        |  FROM s)
        |SELECT user_id, ev.id AS event_id,
        |  list_reduce(list_transform(evs[1:t], e -> e.v),
        |    (acc, x) -> CAST(0.3 AS DOUBLE)*x + CAST(0.7 AS DOUBLE)*acc)
        |    AS ewma
        |FROM u""".stripMargin,
    // the same coupled recursion as a RECURSIVE CTE stepping t → t+1 —
    // NOT the ewma oracle's list_reduce: DuckDB's list_reduce evaluates a
    // struct accumulator's later fields against a PARTIALLY-UPDATED acc
    // (the 'b' lambda field sees the new 'l'), which silently corrupts any
    // coupled recursion (observed: b₂ off by exactly the new-l
    // substitution). Complements INTERPOLATED from the Scala doubles (a
    // re-derived 1−β could differ by an ulp and snowball through the fold).
    "ts_holt_linear" -> {
      val (a, ac, b, bc) = (0.5, 1.0 - 0.5, 0.3, 1.0 - 0.3)
      s"""WITH RECURSIVE s AS (
        |  SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
        |  FROM events),
        |h(user_id, event_id, t, l, b) AS (
        |  SELECT user_id, event_id, t, v, CAST(0 AS DOUBLE) FROM s WHERE t = 1
        |  UNION ALL
        |  SELECT s.user_id, s.event_id, s.t,
        |    CAST($a AS DOUBLE)*s.v + CAST($ac AS DOUBLE)*(h.l + h.b),
        |    CAST($b AS DOUBLE)*((CAST($a AS DOUBLE)*s.v + CAST($ac AS DOUBLE)*(h.l + h.b)) - h.l)
        |      + CAST($bc AS DOUBLE)*h.b
        |  FROM h JOIN s ON s.user_id = h.user_id AND s.t = h.t + 1)
        |SELECT user_id, event_id, l AS holt_level FROM h""".stripMargin
    },
    "resample_locf" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
        |p AS (SELECT user_id, ts_us, MAX(value) AS value FROM e GROUP BY 1, 2),
        |b AS (SELECT user_id, MIN(ts_us) AS mn, MAX(ts_us) AS mx FROM e GROUP BY 1),
        |g AS (SELECT user_id,
        |    UNNEST(range((mn + 21599999999) // 21600000000,
        |                 mx // 21600000000 + 1)) * 21600000000 AS g_us
        |  FROM b
        |  WHERE (mn + 21599999999) // 21600000000 <= mx // 21600000000)
        |SELECT g.user_id, g.g_us, p.value
        |FROM g ASOF JOIN p ON g.user_id = p.user_id AND g.g_us >= p.ts_us""".stripMargin,
    "range_join_attrib" ->
      """SELECT p.event_id AS purchase_id,
        |  COUNT(c.user_id) AS n_clicks,
        |  CAST(COALESCE(SUM(CAST(c.value AS DECIMAL(18,2))), 0) AS DOUBLE) AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        | AND epoch_us(c.ts) > epoch_us(p.ts)
        | AND epoch_us(c.ts) <= epoch_us(p.ts) + 1800000000
        |GROUP BY p.event_id""".stripMargin,
    // same grid + carry re-derived: hourly buckets of epoch time, window
    // carry via IGNORE NULLS last_value over the bucket order
    "ts_resample_ffill" ->
      """WITH obs AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS bucket,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS v
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT MIN(epoch_us(ts) // 3600000000) AS mn,
        |             MAX(epoch_us(ts) // 3600000000) AS mx FROM events),
        |grid AS (
        |  SELECT k.event_type, UNNEST(generate_series(b.mn, b.mx)) AS bucket
        |  FROM (SELECT DISTINCT event_type FROM events) k, b)
        |SELECT g.event_type, g.bucket,
        |  CAST(last_value(o.v IGNORE NULLS) OVER (PARTITION BY g.event_type
        |    ORDER BY g.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS value_ffill,
        |  o.v IS NULL AS is_gap
        |FROM grid g LEFT JOIN obs o
        |  ON o.event_type = g.event_type AND o.bucket = g.bucket""".stripMargin
  )
}
