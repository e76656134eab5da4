package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for stream_join: separates the TWO batch
  * schema-derivation reads that eventStream makes (one per stream leg),
  * the streaming interval join itself (AvailableNow replay through the
  * parquet append sink), and the downstream batch rollup, several reps
  * each — attribution for the r7→r8 2.32 → 2.96 s regression flagged in
  * VERDICT r8. Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileSj [reps]`. */
object ProfileSj {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(4)
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
      println(f"STAGE $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    for (i <- 1 to reps) {
      println(s"--- rep $i")
      System.gc()
      // the batch schema/unit-derivation read eventStream makes per leg
      t("schema_derive_x2") {
        spark.read.parquet(s"$sfDir/events.parquet").schema
        spark.read.parquet(s"$sfDir/events.parquet").schema
      }
      // the SAME interval join as a pure batch query: everything the
      // streaming machinery (micro-batch planning, state stores, sink
      // commits) adds is the difference
      t("batch_equivalent") {
        val ev = graft.Tables.load(spark, sfDir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
        clicks.join(purchases,
            expr("""c_user = p_user AND purchase_ts >= click_ts AND
                    purchase_ts <= click_ts + interval 1 hour"""))
          .groupBy(col("c_user")).agg(count(lit(1)).as("n"))
          .count()
      }
      for (stores <- Seq(1, 4, 8)) {
        spark.conf.set(graft.GraftConfig.StateStoresConfKey, stores.toString)
        val n = t(s"stream_stores_$stores") {
          graft.streaming.StreamOps.queries("stream_join")(spark, sfDir).count()
        }
        println(s"    rows=$n")
      }
      spark.conf.unset(graft.GraftConfig.StateStoresConfKey)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      val n2 = t("stream_no_nodata") {
        graft.streaming.StreamOps.queries("stream_join")(spark, sfDir).count()
      }
      println(s"    rows=$n2")
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
      // inline replica with per-micro-batch progress: where do the seconds go?
      t("inline_with_progress") {
        val clicks = graft.streaming.StreamOps.eventStreamPublic(spark, sfDir)
          .filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
          .withWatermark("click_ts", "1 hour")
        val purchases = graft.streaming.StreamOps.eventStreamPublic(spark, sfDir)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
          .withWatermark("purchase_ts", "1 hour")
        val joined = clicks.join(purchases,
          expr("""c_user = p_user AND purchase_ts >= click_ts AND
                  purchase_ts <= click_ts + interval 1 hour"""))
        val out = java.nio.file.Files.createTempDirectory("sjprof").toFile
        val old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        try {
          val q = joined.writeStream.outputMode("append").format("parquet")
            .option("path", out.getPath + "/data")
            .option("checkpointLocation", out.getPath + "/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          q.recentProgress.foreach { p =>
            println(s"    batch=${p.batchId} rows=${p.numInputRows} " +
              s"trigger=${p.durationMs.get("triggerExecution")}ms " +
              s"addBatch=${p.durationMs.get("addBatch")}ms " +
              s"getBatch=${p.durationMs.get("getBatch")}ms " +
              s"planning=${p.durationMs.get("queryPlanning")}ms " +
              s"walCommit=${p.durationMs.get("walCommit")}ms " +
              s"stateCommit=${p.durationMs.get("commitOffsets")}ms")
          }
        } finally {
          spark.conf.set("spark.sql.shuffle.partitions", old)
          graft.FsUtil.deleteRecursive(out)
        }
      }
    }
  }
}
