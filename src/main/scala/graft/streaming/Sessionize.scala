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
      var cur = state.getOption
      val out = Iterator.newBuilder[Session]
      // events within a micro-batch are not ordered: sort this user's slice
      events.toSeq.sortBy(_.ts_ms).foreach { e =>
        val t = e.ts_ms
        cur match {
          case Some(s) if t - s.lastTs <= gapMs =>
            cur = Some(SessionState(s.start, math.max(s.lastTs, t), s.n + 1, s.sum + e.value))
          case Some(s) => // gap exceeded: close previous, open new
            out += Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.lastTs), s.n, s.sum)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastTs + gapMs)
      }
      out.result()
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
        s"graft_sessions_${System.nanoTime()}", outputMode = "append")
      .orderBy(col("user_id"), col("session_start"))
  }
}
