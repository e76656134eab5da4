package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only one-variant-per-JVM A/B for stream micro-batch floor knobs
  * (round-16 verdict #3). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32
  *     runMain graft.tools.ProfileStreamKnobs <set> [reps]
  *
  * where <set> is one of
  *   base    — the session exactly as Bench builds it
  *   rawfs   — FileSystem-based checkpoint file manager over
  *             RawLocalFileSystem (no client-side CRC for offset/commit/
  *             state metadata writes)
  *   retain  — minBatchesToRetain=2 (less log bookkeeping)
  *   all     — every knob above
  *
  * Prints best/median wall seconds per stream query; compare across JVMs
  * run back-to-back on a quiet box (the r15 interleaved methodology). */
object ProfileStreamKnobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val set = args.headOption.getOrElse("base")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalDirs.shuffleDir())
    if (set == "rawfs" || set == "fsonly" || set == "all") {
      b = b.config("spark.sql.streaming.checkpointFileManagerClass",
          "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
    }
    if (set == "rawfs" || set == "all") {
      b = b.config("spark.hadoop.fs.file.impl",
          "org.apache.hadoop.fs.RawLocalFileSystem")
        .config("spark.hadoop.fs.file.impl.disable.cache", "false")
    }
    if (set == "retain" || set == "all")
      b = b.config("spark.sql.streaming.minBatchesToRetain", "2")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    // the Bench warm-stream so the first timed query skips machinery init
    val regionSchema = spark.read.parquet(s"$sfDir/region.parquet").schema
    val warm = spark.readStream.schema(regionSchema)
      .option("pathGlobFilter", "region.parquet").parquet(sfDir)
      .groupBy().count()
      .writeStream.outputMode("complete").format("memory").queryName("knob_warm")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    warm.awaitTermination()

    val names = graft.streaming.StreamOps.queries.keys.toSeq.sorted
      .filterNot(_ == "watermark_audit")
    val results = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      (name, times.min, times.sorted.apply((reps - 1) / 2))
    }
    println(s"SET=$set")
    results.foreach { case (n, best, med) =>
      println(f"$n%-22s best=$best%7.3f med=$med%7.3f")
    }
    println(f"SET=$set sum_best=${results.map(_._2).sum}%7.3f " +
      f"sum_med=${results.map(_._3).sum}%7.3f")
    spark.stop()
  }
}
