package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the `events` table shape — the engine's stream
  * path (the reference is batch-only; SURVEY.md §1.1 notes its only
  * "incremental" notion is a watermark filter, which Structured Streaming
  * generalizes).
  *
  * All transforms are defined on a DataFrame so the same code runs on a
  * batch frame (for the DuckDB oracle) and on `readStream` (tested with a
  * MemoryStream in `StreamingSpec`). `ts` arrives as a nano-epoch long (see
  * [[graft.Tables]]); [[withEventTime]] converts to a proper timestamp for
  * watermarking.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Long, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionSummary(user_id: Long, n_events: Long,
                                  start_ts: Long, end_ts: Long)

  /** Nano-epoch long → TimestampType column (microsecond precision).
    * Integer division (`div`), not `/`: double division on ~2^60 longs
    * (ulp 256 ns) can round the quotient up across the truncation boundary —
    * a 1 µs error that flips an hour bucket for boundary-adjacent events.
    * `div` truncates toward zero, which equals floor only for ts >= 0 — the
    * corpus contract here (TESTDATA events are positive nano-epochs); a
    * pre-1970 timestamp would need explicit `floor(ts / 1000)` semantics.
    */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Tumbling-window aggregation: counts + exact decimal sums per
    * (hour-window, event_type). Works identically on batch and stream; on a
    * stream add `.withWatermark("event_time", ...)` upstream (the spec does).
    *
    * Output uses the hour index (epoch-hours) rather than a timestamp so the
    * batch oracle compares exactly.
    */
  def hourlyTypeCounts(df: DataFrame): DataFrame =
    withEventTime(df)
      .groupBy(
        window(col("event_time"), "1 hour").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
      .select(
        (unix_timestamp(col("w.start")) / 3600).cast("long").as("hour_idx"),
        col("event_type"), col("n"), col("sum_value"))

  final case class SessionState(pending: List[Event], tailRev: List[Event])

  /** Stateful sessionization: events of a user belong to one session while
    * gaps stay under `gap` (nanoseconds, like `ts`); a session's summary is
    * emitted exactly once, when no future event can extend it.
    *
    * Same watermark protocol as [[funnelStream]]/[[asOfAttributionStream]]
    * (Append + EventTimeTimeout): events BUFFER until the watermark
    * strictly passes them, then fold through the gap rule in (ts, event_id)
    * order — so an out-of-order event landing in a later micro-batch still
    * sessionizes exactly like the batch form ([[sessionizeBatch]]), instead
    * of being folded against a tail that already moved past it. The open
    * tail closes when (a) a matured event exceeds the gap, or (b) the
    * watermark passes `end + gap` — at that point any future non-late event
    * necessarily starts a new session, so the flush can never be
    * contradicted. (b) fires through the event-time timeout, so a QUIET
    * user's last session flushes as soon as other traffic advances the
    * watermark — no sentinel event needed.
    *
    * State hygiene: pending and tail are each capped at `maxBuffer` — an
    * unbounded per-user buffer is a slow-motion OOM at 100 TB of events
    * (one pathological bot user is enough). Pending overflow force-matures
    * the oldest events; tail overflow force-flushes the session (events
    * that would have extended it start a new one) — the documented
    * bounded-state trade. The tail is stored NEWEST-FIRST so the per-event
    * step is O(1) prepend + head read, not an O(n) List append/last.
    */
  def sessionize(events: DataFrame, gap: Long, watermark: String = "1 hour",
                 maxBuffer: Int = 100000)
                (implicit spark: SparkSession): Dataset[SessionSummary] = {
    import spark.implicits._
    val typed = withEventTime(events)
      .withWatermark("event_time", watermark)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("event_time"))
      .as[EventT]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[EventT], state: GroupState[SessionState]) =>
          val wmNs = state.getCurrentWatermarkMs() * 1000000L
          val st = state.getOption.getOrElse(SessionState(Nil, Nil))
          val incoming = it.toList
            .map(e => Event(e.event_id, e.ts, e.user_id, e.event_type, e.value))
          val buf = (st.pending ++ incoming).sortBy(e => (e.ts, e.event_id))
          val (maturedNow, pendingAll) = buf.partition(_.ts < wmNs)
          val overflow = math.max(0, pendingAll.size - maxBuffer)
          val (forced, pending) = pendingAll.splitAt(overflow)
          val closed = scala.collection.mutable.ListBuffer.empty[List[Event]]
          var tailRev = st.tailRev
          for (e <- maturedNow ++ forced) { // both sorted; forced ≥ matured
            tailRev match {
              case newest :: _ if e.ts - newest.ts <= gap => tailRev = e :: tailRev
              case Nil => tailRev = e :: Nil
              case _ => closed += tailRev.reverse; tailRev = e :: Nil
            }
          }
          // the tail is unreachable once the watermark passes end + gap
          if (tailRev.nonEmpty &&
              (tailRev.head.ts + gap < wmNs || tailRev.size > maxBuffer)) {
            closed += tailRev.reverse
            tailRev = Nil
          }
          if (pending.isEmpty && tailRev.isEmpty) state.remove()
          else {
            state.update(SessionState(pending, tailRev))
            // wake when the next pending event matures or the tail becomes
            // flushable, whichever comes first
            val next = (pending.headOption.map(_.ts) ++
              tailRev.headOption.map(_.ts + gap)).min
            state.setTimeoutTimestamp(next / 1000000L + 1)
          }
          closed.iterator.map(s =>
            SessionSummary(userId, s.size.toLong, s.head.ts, s.last.ts))
      }
  }

  /** Force-close all open sessions (batch-mode drain for deterministic runs). */
  def sessionizeBatch(events: Dataset[Event], gap: Long)
                     (implicit spark: SparkSession): Dataset[SessionSummary] = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.toDF()
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gap, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
      .select(col("user_id"), col("n_events"), col("start_ts"), col("end_ts"))
      .as[SessionSummary]
  }

  /** Streaming ingest dedup — the exactly-once guard a training pipeline
    * puts in front of its document store. On a stream:
    * `dropDuplicatesWithinWatermark` keeps state only inside the watermark
    * horizon (bounded state — a plain `dropDuplicates` on a stream grows
    * state forever). The batch form below is the oracle-able equivalent:
    * survivor = min event_id per key, deterministic regardless of arrival
    * order (a stream keeps the FIRST arrival; in event-time-ordered replay
    * the two coincide — pinned in StreamingSpec).
    */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  watermark: String = "1 hour"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Batch-equivalent duplicate suppression: min-id survivor per key +
    * duplicate count (shuffles once on the key hash, partial-agg combined).
    */
  def dedupBatch(events: DataFrame, keys: Seq[String]): DataFrame =
    events.groupBy(keys.map(col): _*)
      .agg(min(col("event_id")).as("event_id"), count(lit(1)).as("n_copies"))

  /** Stream-stream interval join: each click joins the purchases of the
    * same user in the trailing `windowSpec` (e.g. "30 minutes") — the
    * streaming twin of [[graft.operators.Temporal.rangeJoinBucketed]].
    *
    * Both inputs carry watermarks, and the join condition bounds click time
    * AGAINST purchase time from both sides — that pair of constraints is
    * what lets Structured Streaming expire buffered rows (an unbounded
    * stream-stream join would hold both streams in state forever). On a
    * batch frame the same code degenerates to a plain range join, which is
    * how the spec cross-checks it.
    */
  def attributionJoin(purchases: DataFrame, clicks: DataFrame,
                      windowSpec: String = "30 minutes",
                      watermark: String = "1 hour"): DataFrame = {
    val p = withEventTime(purchases)
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("event_time").as("p_time"))
      .withWatermark("p_time", watermark)
    val c = withEventTime(clicks)
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("event_time").as("c_time"))
      .withWatermark("c_time", watermark)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_time") > col("p_time") &&
        col("c_time") <= col("p_time") + expr(s"INTERVAL $windowSpec"))
      .select(col("purchase_id"), col("click_id"))
  }

  final case class EventT(event_id: Long, ts: Long, user_id: Long,
                          event_type: String, value: Double,
                          event_time: java.sql.Timestamp)
  final case class AsOfState(clicks: List[Event], purchaseTs: List[Long])
  final case class Attribution(event_id: Long, user_id: Long,
                               click_ts: Long, purchase_ts: Long)

  /** Streaming as-of attribution — the streaming twin of
    * [[graft.operators.Temporal.asOfJoin]] (backward direction): each click
    * attributes to the user's most recent purchase at-or-before it,
    * tolerating out-of-order arrival up to the watermark delay. The
    * stream-stream interval join above can't express this ("most recent",
    * not "all within a window"), and Spark has no built-in streaming as-of
    * join — this is the flatMapGroupsWithState custom-state path.
    *
    * Protocol, per user key:
    *   - clicks buffer until the watermark passes their event time
    *     STRICTLY (only then can no on-time purchase at-or-before them
    *     still arrive — a purchase AT the click timestamp ties and must be
    *     waited for), then emit exactly once, in (ts, event_id) order;
    *   - purchases fold into a sorted ts list pruned by dominance: every
    *     purchase at-or-after the watermark survives, plus ONLY the latest
    *     one before it (older past purchases can never win an as-of match
    *     for any future-matured click — same pruning a 100 TB deployment
    *     needs to keep state horizon-bounded);
    *   - an event-time timeout at the earliest pending click (+1 ms for
    *     the ms-grain timeout clock) drains matured clicks for users whose
    *     groups receive no further input;
    *   - state is capped at `maxBuffer` pending clicks / retained
    *     purchases: overflow clicks force-emit with current knowledge and
    *     the oldest surplus purchases drop — the documented bounded-state
    *     tradeoff, same as [[sessionize]].
    *
    * Unmatched clicks emit `purchase_ts = -1` (the battery's sentinel
    * convention). Other event types pass through the state machine as
    * no-ops but still advance the watermark.
    */
  def asOfAttributionStream(events: DataFrame, watermark: String = "1 hour",
                            maxBuffer: Int = 100000)
                           (implicit spark: SparkSession): Dataset[Attribution] = {
    import spark.implicits._
    val typed = withEventTime(events)
      .withWatermark("event_time", watermark)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("event_time"))
      .as[EventT]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, Attribution](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[EventT], state: GroupState[AsOfState]) =>
          val wmNs = state.getCurrentWatermarkMs() * 1000000L
          val st = state.getOption.getOrElse(AsOfState(Nil, Nil))
          val incoming = it.toList
          val clicks = st.clicks ++ incoming
            .filter(_.event_type == "click")
            .map(e => Event(e.event_id, e.ts, e.user_id, e.event_type, e.value))
          val purchases = (st.purchaseTs ++
            incoming.filter(_.event_type == "purchase").map(_.ts)).sorted
          val (matured, pendingAll) = clicks.partition(_.ts < wmNs)
          val pendingSorted = pendingAll.sortBy(e => (e.ts, e.event_id))
          val overflow = math.max(0, pendingSorted.size - maxBuffer)
          val (forced, pending) = pendingSorted.splitAt(overflow)
          val out = (matured ++ forced).sortBy(e => (e.ts, e.event_id)).map { c =>
            val atOrBefore = purchases.takeWhile(_ <= c.ts)
            Attribution(c.event_id, userId, c.ts,
              if (atOrBefore.nonEmpty) atOrBefore.last else -1L)
          }
          val (past, future) = purchases.partition(_ < wmNs)
          val keptPurchases = (past.lastOption.toList ++ future).takeRight(maxBuffer)
          if (pending.isEmpty && keptPurchases.isEmpty) state.remove()
          else {
            state.update(AsOfState(pending, keptPurchases))
            pending.headOption.foreach(c =>
              state.setTimeoutTimestamp(c.ts / 1000000L + 1))
          }
          out.iterator
      }
  }

  final case class FunnelProgress(entered: List[Long], emitted: Int,
                                  pending: List[Event])
  final case class FunnelEntry(user_id: Long, stage_idx: Int, t_in: Long)

  /** Streaming ordered-funnel conversion — the streaming twin of
    * [[graft.operators.Analytics.funnel]]: per user, stage i enters at the
    * EARLIEST event of stage i's type strictly after the stage-(i-1) entry
    * and within `tolerance` of it, tolerating out-of-order arrival up to
    * the watermark delay. Spark has no built-in sequential-pattern
    * operator; this is the flatMapGroupsWithState custom-state path, same
    * protocol family as [[asOfAttributionStream]]:
    *
    *   - relevant events buffer until the watermark passes them, then fold
    *     through the stage machine in (ts, event_id) order — matured
    *     events are permanent, so each stage entry is emitted exactly once
    *     and matches the batch operator on any arrival order;
    *   - state is `entered` (≤ |stages| timestamps) + `emitted` + the
    *     immature buffer: per-user state stays stage-bounded forever (a
    *     completed funnel must RETAIN its marker — removing it would let a
    *     later event restart stage 1 and double-emit);
    *   - an event-time timeout at the earliest pending event (+1 ms for
    *     the ms-grain timeout clock) drains quiet users; `maxBuffer`
    *     overflow force-folds the oldest surplus with current knowledge —
    *     the same documented bounded-state trade as [[sessionize]];
    *   - events arriving later than the watermark allows are outside the
    *     correctness contract (standard Structured Streaming semantics).
    *
    * Emits one row per (user, stage entered): `(user_id, stage_idx 1-based,
    * t_in)`. Stage counts aggregate downstream exactly like the batch
    * operator's output (StreamingSpec pins the equivalence on shuffled
    * arrival).
    */
  def funnelStream(events: DataFrame, stages: Seq[String], tolerance: Long,
                   watermark: String = "1 hour", maxBuffer: Int = 100000)
                  (implicit spark: SparkSession): Dataset[FunnelEntry] = {
    import spark.implicits._
    require(stages.nonEmpty)
    // zipWithIndex.toMap keeps only the LAST index of a repeated stage
    // type, which would silently stall the state machine (an event for a
    // repeated type never matches `entered.length`); the batch
    // Analytics.funnel iterates stages positionally and handles repeats, so
    // reject the input loudly here rather than diverge from the twin
    require(stages.distinct.size == stages.size,
      s"funnelStream requires distinct stage types, got $stages")
    val stageIdx = stages.zipWithIndex.toMap
    val typed = withEventTime(events)
      .withWatermark("event_time", watermark)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("event_time"))
      .as[EventT]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelEntry](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[EventT], state: GroupState[FunnelProgress]) =>
          val wmNs = state.getCurrentWatermarkMs() * 1000000L
          val st = state.getOption.getOrElse(FunnelProgress(Nil, 0, Nil))
          val incoming = it.toList
            .filter(e => stageIdx.contains(e.event_type))
            .map(e => Event(e.event_id, e.ts, e.user_id, e.event_type, e.value))
          val buf = (st.pending ++ incoming).sortBy(e => (e.ts, e.event_id))
          val (maturedNow, pendingAll) = buf.partition(_.ts < wmNs)
          val overflow = math.max(0, pendingAll.size - maxBuffer)
          val (forced, pending) = pendingAll.splitAt(overflow)
          var entered = st.entered
          for (e <- maturedNow ++ forced) { // both sorted; forced ≥ matured
            val i = stageIdx(e.event_type)
            if (i == entered.length &&
                (i == 0 || (e.ts > entered(i - 1) &&
                  e.ts <= entered(i - 1) + tolerance)))
              entered = entered :+ e.ts
          }
          val out = (st.emitted until entered.length)
            .map(i => FunnelEntry(userId, i + 1, entered(i)))
          state.update(FunnelProgress(entered, entered.length, pending))
          pending.headOption.foreach(e =>
            state.setTimeoutTimestamp(e.ts / 1000000L + 1))
          out.iterator
      }
  }

  /** Windowed per-source document-quality monitor — the live gauge a
    * streaming ingest runs beside [[DocIngest]]: per (hour-window, source),
    * document count and exact-decimal quality mass (sum of the round4
    * quality scores — average derives as sum/n downstream; emitting the
    * decimal SUM keeps the aggregate exact and engine-portable where a
    * double `avg` would depend on merge order) plus min/max. Same
    * batch/stream duality as [[hourlyTypeCounts]]: identical code runs on a
    * batch frame for the oracle and under a watermark on a stream
    * (StreamingSpec pins stream ≡ batch on the same rows).
    */
  def docQualityStats(d: DataFrame): DataFrame =
    // score once in a projection, then aggregate the scored column — three
    // independent qualityScore trees inside the agg would re-tokenize every
    // document up to 3x per row unless codegen happens to dedupe them
    d.withColumn("q", graft.operators.TextAnalysis.qualityScore(col("text")))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("q").cast("decimal(10,4)")).cast("double").as("sum_quality"),
        min(col("q")).as("min_quality"),
        max(col("q")).as("max_quality"))
      .select((unix_timestamp(col("w.start")) / 3600).cast("long").as("hour_idx"),
        col("source"), col("n_docs"), col("sum_quality"),
        col("min_quality"), col("max_quality"))

  /** Streaming form: 2-hour watermark bounds window state; late documents
    * beyond it are dropped (counted upstream by the ingest's sink metrics).
    */
  def docQualityMonitor(stream: DataFrame): DataFrame =
    docQualityStats(stream.withWatermark("ts", "2 hours"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // batch-equivalent of docQualityMonitor; ts derives deterministically
    // from doc_id (one doc per minute from a fixed epoch) so the window
    // math is exercised AND oracle-checkable on the static table
    "stream_quality_monitor" -> ((s, dir) =>
      docQualityStats(
        graft.Tables(s, dir, "documents")
          .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("doc_id") * 60)))),

    // windowed aggregation (batch-equivalent of the streaming query)
    "stream_hourly_counts" -> ((s, dir) =>
      hourlyTypeCounts(graft.Tables(s, dir, "events"))),

    // ingest dedup (batch form of dedupStream; same key set)
    "stream_dedup" -> ((s, dir) =>
      dedupBatch(graft.Tables(s, dir, "events"),
          Seq("user_id", "event_type", "value"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("n_copies"))),

    // stream-stream interval join, batch form (same code path; the
    // streaming execution with watermarked state is pinned in StreamingSpec)
    "stream_attrib_join" -> ((s, dir) => {
      val ev = graft.Tables(s, dir, "events")
      attributionJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "click"))
    }),

    // gap-based sessionization (batch window form; the streaming form is the
    // flatMapGroupsWithState path tested in StreamingSpec). Sessionizes on
    // microseconds — DuckDB's epoch_ns truncates ns timestamps to µs, so the
    // oracle can only see µs resolution.
    "stream_sessionize" -> ((s, dir) => {
      import s.implicits._
      sessionizeBatch(
        graft.Tables(s, dir, "events")
          .select(col("event_id"), expr("ts div 1000").as("ts"), col("user_id"),
            col("event_type"), col("value")).as[Event],
        gap = 30L * 60 * 1000 * 1000)(s)
        .toDF()
        .select(col("user_id"), col("n_events"),
          col("start_ts").as("start_us"), col("end_ts").as("end_us"))
    })
  )

  def oracles: Map[String, String] = Map(
    "stream_quality_monitor" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    (1704067200 + doc_id * 60) // 3600 AS hour_idx,
        |    ROUND(LEAST(1.0, len(string_split_regex(trim(text), '\s+')) / 50.0) *
        |      (1.0 - 0.5 * (CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |          x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x))) AS DOUBLE)
        |        / len(string_split_regex(trim(text), '\s+')))), 4) AS q
        |  FROM documents)
        |SELECT CAST(hour_idx AS BIGINT) AS hour_idx, source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(CAST(q AS DECIMAL(10,4))) AS DOUBLE) AS sum_quality,
        |  MIN(q) AS min_quality, MAX(q) AS max_quality
        |FROM t GROUP BY 1, 2""".stripMargin,
    "stream_attrib_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        | AND epoch_us(c.ts) > epoch_us(p.ts)
        | AND epoch_us(c.ts) <= epoch_us(p.ts) + 1800000000""".stripMargin,
    "stream_dedup" ->
      """SELECT MIN(event_id) AS event_id, user_id, event_type, value,
        |  COUNT(*) AS n_copies
        |FROM events GROUP BY user_id, event_type, value""".stripMargin,
    "stream_hourly_counts" ->
      """SELECT CAST(FLOOR(epoch_ns(ts) / 3600000000000) AS BIGINT) AS hour_idx,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "stream_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS tus, event_id,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
        |         OR LAG(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, tus, event_id,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g)
        |SELECT user_id, COUNT(*) AS n_events, MIN(tus) AS start_us, MAX(tus) AS end_us
        |FROM s GROUP BY user_id, session_id""".stripMargin
  )
}
