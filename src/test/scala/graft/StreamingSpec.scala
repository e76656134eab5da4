package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{Sessionize, StreamOps}

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream_tumbling equals the batch aggregation (exactly-once contract)") {
    val streamed = StreamOps.streamTumbling(spark, TestSpark.sf0001)
    val batch = Tables.load(spark, TestSpark.sf0001, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))
    assert(streamed.collect().sameElements(batch.collect()))
  }

  test("concurrent stream replays leave the session's shuffle partitions intact") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val fs = Seq(
      Future(StreamOps.streamTumbling(spark, TestSpark.sf0001).count()),
      Future(StreamOps.streamDedup(spark, TestSpark.sf0001).count()),
      Future(StreamOps.streamSliding(spark, TestSpark.sf0001).count()))
    val counts = Await.result(Future.sequence(fs), 300.seconds)
    assert(counts.forall(_ > 0))
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "stream runner must restore the session's shuffle partitions")
  }

  test("sessionization: streaming flatMapGroupsWithState equals batch sessions") {
    val streamed = Sessionize.sessions(spark, TestSpark.sf0001)
      .select("user_id", "session_start", "session_end", "n_events")

    // batch reference: classic lag/cumsum gap sessionization. The streaming
    // side works in epoch millis (unix_millis(ts) → Event.ts_ms), so truncate
    // to millis here too for identical boundary arithmetic.
    val gap = Sessionize.gapMs
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val batch = Tables.load(spark, TestSpark.sf0001, "events")
      .select(col("user_id"),
        expr("timestamp_millis(unix_millis(ts))").as("ts"), col("value"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev"))) > gap, 1)
          .otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")

    // the stream only emits *closed* sessions: drop batch sessions still open
    // at end-of-stream (watermark never advanced past their gap)
    val maxTs = Tables.load(spark, TestSpark.sf0001, "events")
      .agg(max(unix_millis(col("ts")))).head.getLong(0)
    val closed = batch
      .filter(unix_millis(col("session_end")) + gap < maxTs)
      .orderBy(col("user_id"), col("session_start"))

    val a = streamed.collect()
    val b = closed.collect()
    assert(a.length == b.length, s"session count: streaming=${a.length} batch=${b.length}")
    assert(a.sameElements(b))
  }
}
