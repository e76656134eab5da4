package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only A/B for the trailing NO-DATA micro-batch on the watermarked
  * stream_* replays that do not opt into `skipNoDataBatch` yet.
  *
  * Spark runs one final no-data batch after an AvailableNow replay when a
  * watermark advanced and a stateful operator reports it would evict or
  * emit on it. For COMPLETE-mode aggregations (tumbling/topk/sliding/
  * anomaly) the watermark never evicts (complete mode retains all state)
  * and output re-emits identically each batch; for `dropDuplicates` whose
  * key excludes the event-time column (stream_dedup) eviction never
  * applies either. If the engine runs the trailing batch anyway, it is
  * pure commit overhead on a finite replay — this tool measures both
  * modes and asserts the results are IDENTICAL (collected and compared),
  * which is the precondition for opting those queries into
  * `skipNoDataBatch` (stream_join's existing posture; stream_sessionize
  * is NOT eligible — its final emissions ride the last watermark advance,
  * demonstrated by ProfileStreams).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileNoData [reps]`.
  */
object ProfileNoData {
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
    val qs = Seq("stream_tumbling", "stream_topk", "stream_sliding",
      "stream_anomaly", "stream_dedup")
    val fns = graft.streaming.StreamOps.queries
    def run(q: String): (Double, Seq[String]) = {
      val t0 = System.nanoTime()
      val rows = fns(q)(spark, sfDir).collect().map(_.toString).toSeq
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    for (rep <- 1 to reps) {
      println(s"--- rep $rep")
      for (q <- qs) {
        System.gc()
        // 'on' arm: force the trailing no-data batch even for queries that
        // already opted into skipNoDataBatch (the ForceNoDataKey test hook —
        // without it both arms skip and identical=true is vacuous)
        spark.conf.set(graft.streaming.StreamOps.ForceNoDataKey, "true")
        val (tOn, rOn) = run(q)
        spark.conf.unset(graft.streaming.StreamOps.ForceNoDataKey)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        System.gc()
        val (tOff, rOff) = run(q)
        spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
        val same = rOn == rOff
        println(f"$q%-18s noData_on=$tOn%7.3f s  off=$tOff%7.3f s  " +
          f"delta=${tOn - tOff}%+7.3f  rows=${rOn.size}%5d  identical=$same")
        if (!same) println(s"  !!! RESULT DIVERGENCE for $q — not eligible")
      }
    }
    spark.stop()
  }
}
