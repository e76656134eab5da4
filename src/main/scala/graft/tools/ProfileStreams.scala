package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.plans.Checkpoints.SweepSyntax

/** Dev-only stage profiler for stream_funnel and stream_sessionize — the
  * [[ProfileSj]] decomposition extended to the two most expensive remaining
  * streams (round-9 verdict directive #7). Separates, per query:
  *
  *   - the batch schema-derivation read `eventStream` makes,
  *   - the BATCH equivalent of the streamed computation (everything the
  *     micro-batch machinery adds is the difference),
  *   - the streaming replay with per-micro-batch progress durations,
  *   - the downstream batch post-pass,
  *
  * plus, for sessionize, a no-data-batch-disabled replay whose ROW COUNT is
  * printed — demonstrating (not proving; the spec does that) that the final
  * watermark advance carries real emissions, i.e. `skipNoDataBatch` is NOT
  * eligible there. Usage:
  * `SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileStreams [reps]`. */
object ProfileStreams {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalDirs.shuffleDir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def progress(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
      q.recentProgress.foreach { p =>
        println(s"    batch=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${p.durationMs.get("triggerExecution")}ms " +
          s"addBatch=${p.durationMs.get("addBatch")}ms " +
          s"walCommit=${p.durationMs.get("walCommit")}ms")
      }

    for (i <- 1 to reps) {
      println(s"--- rep $i")
      System.gc()

      // ---------------------------------------------------- stream_funnel
      t("f_schema_derive") {
        spark.read.parquet(s"$sfDir/events.parquet").schema
      }
      t("f_batch_equivalent") {
        val ev = graft.Tables.load(spark, sfDir, "events")
          .filter(col("event_type").isin("view", "click", "purchase"))
          .groupBy(col("user_id"), col("event_type"))
          .agg(min(col("ts")).as("t"))
        ev.groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "view", col("t"))).as("tv"))
          .count()
      }
      // inline replica of the funnel's streamed leg with progress
      val firsts = t("f_stream_replay") {
        val agg = graft.streaming.StreamOps.eventStreamPublic(spark, sfDir)
          .filter(col("event_type").isin("view", "click", "purchase"))
          .groupBy(col("user_id"), col("event_type"))
          .agg(min(col("ts")).as("t"))
        val name = s"pf_funnel_$i"
        val q = agg.writeStream.outputMode("complete").format("memory")
          .queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        progress(q)
        spark.table(name).sweepCheckpoint()
      }
      t("f_post_pass") {
        val pv = firsts.groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "view", col("t"))).as("tv"),
            min(when(col("event_type") === "click", col("t"))).as("tc"),
            min(when(col("event_type") === "purchase", col("t"))).as("tp"))
        pv.agg(
          count(when(col("tv").isNotNull, 1)).as("n1"),
          count(when(col("tv").isNotNull && col("tc").isNotNull &&
            col("tv") < col("tc"), 1)).as("n2"),
          count(when(col("tv").isNotNull && col("tc").isNotNull &&
            col("tp").isNotNull && col("tv") < col("tc") &&
            col("tc") < col("tp"), 1)).as("n3")).collect()
      }
      t("f_full_query") {
        graft.streaming.StreamOps.queries("stream_funnel")(spark, sfDir).count()
      }

      // ------------------------------------------------ stream_sessionize
      t("s_batch_equivalent") {
        // the window-function batch sessionization over the same gap
        val ev = graft.Tables.load(spark, sfDir, "events")
          .select(col("user_id"), col("ts"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"))
        ev.withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("brk",
            when(col("prev").isNull ||
              unix_millis(col("ts")) - unix_millis(col("prev")) >
                graft.streaming.Sessionize.gapMs, 1L).otherwise(0L))
          .withColumn("sid", sum(col("brk")).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("sid"))
          .agg(count(lit(1)).as("n_events"))
          .count()
      }
      val nDefault = t("s_full_query") {
        graft.streaming.StreamOps.queries("stream_sessionize")(spark, sfDir).count()
      }
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      val nNoFinal = t("s_full_no_nodata") {
        graft.streaming.StreamOps.queries("stream_sessionize")(spark, sfDir).count()
      }
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      println(s"    sessionize rows: default=$nDefault no_nodata=$nNoFinal " +
        s"(difference = sessions only the final watermark advance closes)")
    }
    spark.stop()
  }
}
