package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Custom stateful streaming: gap-based sessionization per user via
  * `flatMapGroupsWithState` (the KeyValueGroupedDataset custom-state path).
  * A session closes when >30 minutes pass with no event; closed sessions are
  * emitted with their span and aggregate.
  *
  * State per key is one open session (constant size); event-time timeout via
  * the watermark evicts idle users' state — this is the bounded-state design
  * that survives unbounded streams, unlike a window-function batch
  * sessionization which needs the whole history per user.
  */
object Sessionize {

  /** Event time rides as epoch millis (`ts_ms`) through the typed path —
    * one primitive long per row instead of a Timestamp object; only emitted
    * sessions pay the Timestamp materialization. `ts` stays on the Dataset
    * (untouched by the encoder projection below) as the watermark column. */
  final case class Event(user_id: Long, ts_ms: Long, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  val gapMs: Long = 30 * 60 * 1000L

  /** Events sorted per chunk before interval-merging. Memory per (key, batch)
    * is one chunk plus the accumulated session list — never the whole batch
    * slice. */
  private[graft] val ChunkSize = 4096

  /** Fold one time-sorted chunk of events into gap-valid sessions. */
  private[graft] def chunkSessions(buf: Array[Event], n: Int): List[SessionState] = {
    java.util.Arrays.sort(buf, 0, n,
      (a: Event, b: Event) => java.lang.Long.compare(a.ts_ms, b.ts_ms))
    var out = List.empty[SessionState] // built newest-first, reversed at end
    var i = 0
    while (i < n) {
      val e = buf(i)
      out = out match {
        case h :: t if e.ts_ms - h.lastTs <= gapMs =>
          SessionState(h.start, e.ts_ms, h.n + 1, h.sum + e.value) :: t
        case _ => SessionState(e.ts_ms, e.ts_ms, 1, e.value) :: out
      }
      i += 1
    }
    out.reverse
  }

  /** Merge two start-sorted, internally gap-valid session lists, joining
    * sessions within `gapMs` of each other. Sessionization is exactly
    * connected components over the "within gap on the time line" relation,
    * and a gap-valid interval is a connected chain of its own events — so a
    * sweep that joins interval B into interval A iff `B.start ≤ A.end + gap`
    * (B's first event is then within gap of one of A's chain events; A's
    * consecutive events are ≤ gap apart) reproduces the event-level fold
    * exactly. This is what makes the chunked formulation correct: chunks
    * partition the events arbitrarily, each chunk's fold yields gap-valid
    * intervals, and merging is associative. */
  private[graft] def mergeSessions(
      a: List[SessionState], b: List[SessionState]): List[SessionState] = {
    val merged = (a ++ b).sortBy(_.start)
    merged.foldLeft(List.empty[SessionState]) {
      case (h :: t, s) if s.start - h.lastTs <= gapMs =>
        SessionState(math.min(h.start, s.start), math.max(h.lastTs, s.lastTs),
          h.n + s.n, h.sum + s.sum) :: t
      case (acc, s) => s :: acc
    }.reverse
  }

  private def step(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Session(userId, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.lastTs), s.n, s.sum))
    } else {
      // Events within a micro-batch are unordered, but a full
      // `toSeq.sortBy` materializes a hot key's whole batch slice (an
      // AvailableNow replay puts a user's entire history in one batch; bot
      // traffic OOMs the task). Instead: sort fixed-size chunks, fold each
      // into gap-valid sessions, and interval-merge into an accumulator —
      // memory ∝ resulting sessions + one chunk, not events.
      var acc: List[SessionState] = state.getOption.toList
      val buf = new Array[Event](ChunkSize)
      var n = 0
      while (events.hasNext) {
        buf(n) = events.next()
        n += 1
        if (n == ChunkSize) { acc = mergeSessions(acc, chunkSessions(buf, n)); n = 0 }
      }
      if (n > 0) acc = mergeSessions(acc, chunkSessions(buf, n))
      acc match {
        case Nil => Iterator.empty
        case _ =>
          val closed = acc.init // all but the latest are followed by a gap
          val open = acc.last
          state.update(open)
          state.setTimeoutTimestamp(open.lastTs + gapMs)
          closed.iterator.map(s => Session(userId, new java.sql.Timestamp(s.start),
            new java.sql.Timestamp(s.lastTs), s.n, s.sum))
      }
    }
  }

  /** Run gap-sessionization over the events fixture as an AvailableNow
    * stream. Emits only sessions *closed* by the watermark advancing past
    * their gap: on a finite replay that is every batch session except ones
    * still open at end-of-stream (session_end + gap ≥ max event time) —
    * those genuinely haven't ended yet and stay in state, exactly as they
    * would on an unbounded stream. */
  def sessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val src = StreamOps.eventStreamPublic(spark, sfDir)
      .select(col("user_id"), col("ts"), unix_millis(col("ts")).as("ts_ms"), col("value"))
      .withWatermark("ts", "0 seconds") // ts stays as the watermark column
      .as[Event]
    val sessions: Dataset[Session] = src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
    StreamOps.runToCompletion(spark, sessions.toDF(),
        s"graft_sessions_${System.nanoTime()}", outputMode = "append",
        inputBytes = StreamOps.eventsBytes(sfDir))
      .orderBy(col("user_id"), col("session_start"))
  }
}
