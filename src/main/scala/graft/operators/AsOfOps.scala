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

  val queries: Map[String, Q] = Map("join_asof" -> joinAsof)

  val oracle: Map[String, String] = Map(
    "join_asof" ->
      """SELECT e.event_id, e.user_id, CAST(o.o_orderdate AS TIMESTAMP) AS matched_orderdate
         FROM events e ASOF LEFT JOIN orders o
           ON e.user_id = o.o_custkey
          AND CAST(date_trunc('microseconds', e.ts) AS TIMESTAMP) >= o.o_orderdate
         ORDER BY e.event_id""",
  )
}
