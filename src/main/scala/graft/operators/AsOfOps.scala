package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.AsOfJoin

/** As-of join query: each event matched to the user's latest order at event
  * time (the "state as of T" lookup the reference's running-P&L use-case
  * implies). Oracle: DuckDB's native ASOF LEFT JOIN.
  */
object AsOfOps {
  type Q = (SparkSession, String) => DataFrame

  val joinAsof: Q = (s, d) => {
    val events = Tables.load(s, d, "events")
    val orders = Tables.load(s, d, "orders")
    AsOfJoin.asOf(
      left = events.select(col("event_id"), col("user_id"), col("ts")),
      right = orders,
      leftKey = col("user_id"), rightKey = col("o_custkey"),
      leftTime = col("ts"), rightTime = col("o_orderdate"),
      payload = Seq(col("o_orderdate") -> "matched_orderdate"))
      .select(col("event_id"), col("user_id"), col("matched_orderdate"))
      .orderBy(col("event_id"))
  }

  /** Forward as-of: each event matched to the user's NEXT order at-or-after
    * event time ("what did this activity lead to") — same union+window
    * plan walked in descending time. */
  val joinAsofForward: Q = (s, d) => {
    val events = Tables.load(s, d, "events")
    val orders = Tables.load(s, d, "orders")
    AsOfJoin.asOf(
      left = events.select(col("event_id"), col("user_id"), col("ts")),
      right = orders,
      leftKey = col("user_id"), rightKey = col("o_custkey"),
      leftTime = col("ts"), rightTime = col("o_orderdate"),
      payload = Seq(col("o_orderdate") -> "matched_orderdate"),
      direction = "forward")
      .select(col("event_id"), col("user_id"), col("matched_orderdate"))
      .orderBy(col("event_id"))
  }

  /** Backward as-of with a 1-hour tolerance (pandas merge_asof
    * `tolerance`): each click attributed to the user's latest PRIOR
    * purchase, but only if it happened within the hour — a stale "latest
    * state" nulls out rather than silently matching an arbitrarily old
    * row. Self-join shape: both sides are slices of the same events
    * table. */
  val joinAsofTolerance: Q = (s, d) => {
    val events = Tables.load(s, d, "events")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"))
    AsOfJoin.asOf(
      left = clicks,
      right = purchases,
      leftKey = col("user_id"), rightKey = col("p_user"),
      leftTime = col("ts"), rightTime = col("pts"),
      payload = Seq(col("pts") -> "matched_purchase_ts"),
      toleranceUs = Some(3600L * 1000000))
      .select(col("event_id"), col("user_id"), col("matched_purchase_ts"))
      .orderBy(col("event_id"))
  }

  /** Nearest as-of (pandas merge_asof direction='nearest', completing the
    * direction parity): each event matched to the user's CLOSEST order in
    * time, either side, ties to the earlier (backward) match. Composed as
    * the backward and forward walks over the same union+window plan — two
    * window passes, still |left| output rows, no candidate-pair
    * materialization — with the winner chosen per row by absolute gap. */
  val joinAsofNearest: Q = (s, d) => {
    val events = Tables.load(s, d, "events")
    val orders = Tables.load(s, d, "orders")
    val left = events.select(col("event_id"), col("user_id"), col("ts"))
    def side(direction: String, name: String) = AsOfJoin.asOf(
      left = left, right = orders,
      leftKey = col("user_id"), rightKey = col("o_custkey"),
      leftTime = col("ts"), rightTime = col("o_orderdate"),
      payload = Seq(col("o_orderdate") -> name),
      direction = direction)
      .select(col("event_id"), col("user_id"), col("ts"), col(name))
    val bwd = side("backward", "bwd_date")
    val fwd = side("forward", "fwd_date").select(col("event_id"), col("fwd_date"))
    bwd.join(fwd, "event_id")
      .select(col("event_id"), col("user_id"),
        when(col("bwd_date").isNull, col("fwd_date"))
          .when(col("fwd_date").isNull, col("bwd_date"))
          .when(unix_micros(col("ts")) - unix_micros(col("bwd_date").cast("timestamp"))
            <= unix_micros(col("fwd_date").cast("timestamp")) - unix_micros(col("ts")),
            col("bwd_date"))
          .otherwise(col("fwd_date")).as("matched_orderdate"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, Q] = Map(
    "join_asof" -> joinAsof,
    "join_asof_forward" -> joinAsofForward,
    "join_asof_tolerance" -> joinAsofTolerance,
    "join_asof_nearest" -> joinAsofNearest)

  val oracle: Map[String, String] = Map(
    "join_asof" ->
      """SELECT e.event_id, e.user_id, CAST(o.o_orderdate AS TIMESTAMP) AS matched_orderdate
         FROM events e ASOF LEFT JOIN orders o
           ON e.user_id = o.o_custkey
          AND CAST(date_trunc('microseconds', e.ts) AS TIMESTAMP) >= o.o_orderdate
         ORDER BY e.event_id""",
    "join_asof_forward" ->
      """SELECT e.event_id, e.user_id, CAST(o.o_orderdate AS TIMESTAMP) AS matched_orderdate
         FROM events e ASOF LEFT JOIN orders o
           ON e.user_id = o.o_custkey
          AND CAST(date_trunc('microseconds', e.ts) AS TIMESTAMP) <= o.o_orderdate
         ORDER BY e.event_id""",
    "join_asof_nearest" ->
      """WITH ev AS (
           SELECT event_id, user_id,
             CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
           FROM events),
         bwd AS (
           SELECT e.event_id, o.o_orderdate AS bwd_date
           FROM ev e ASOF LEFT JOIN orders o
             ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate),
         fwd AS (
           SELECT e.event_id, o.o_orderdate AS fwd_date
           FROM ev e ASOF LEFT JOIN orders o
             ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate)
         SELECT e.event_id, e.user_id,
           CAST(CASE
             WHEN b.bwd_date IS NULL THEN f.fwd_date
             WHEN f.fwd_date IS NULL THEN b.bwd_date
             WHEN epoch_us(e.ts) - epoch_us(CAST(b.bwd_date AS TIMESTAMP))
                  <= epoch_us(CAST(f.fwd_date AS TIMESTAMP)) - epoch_us(e.ts)
               THEN b.bwd_date
             ELSE f.fwd_date END AS TIMESTAMP) AS matched_orderdate
         FROM ev e JOIN bwd b USING (event_id) JOIN fwd f USING (event_id)
         ORDER BY e.event_id""",
    "join_asof_tolerance" ->
      """WITH ev AS (
           SELECT event_id, user_id, event_type,
             CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
           FROM events)
         SELECT event_id, user_id,
           CASE WHEN matched_purchase_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(matched_purchase_ts)
                     <= 3600 * 1000000::BIGINT
                THEN matched_purchase_ts END AS matched_purchase_ts
         FROM (
           SELECT c.event_id, c.user_id, c.ts, p.ts AS matched_purchase_ts
           FROM (SELECT * FROM ev WHERE event_type = 'click') c
           ASOF LEFT JOIN (SELECT * FROM ev WHERE event_type = 'purchase') p
             ON c.user_id = p.user_id AND c.ts >= p.ts)
         ORDER BY event_id""",
  )
}
