package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev-only decomposition of the streaming micro-batch FLOOR (round-16
  * verdict #3): for each stream query, one warm run then one measured run
  * with a session-wide [[StreamingQueryListener]] capturing every progress
  * event, reporting
  *
  *   - wall seconds of the whole query (stream replay + batch post-pass),
  *   - stream-active seconds (QueryStartedEvent → QueryTerminatedEvent wall),
  *   - per-batch durationMs decomposition (triggerExecution and its parts:
  *     latestOffset, getBatch, queryPlanning, walCommit, commitOffsets,
  *     addBatch),
  *   - the OUTSIDE gap (wall − stream-active ≈ query construction + sink
  *     read-back + the batch post-pass + start/stop machinery).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32
  *   runMain graft.tools.ProfileStreamFloor [query,query,...]` (default: all
  * stream queries). */
object ProfileStreamFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.headOption.map(_.split(",").map(_.trim).toSeq)
      .getOrElse(graft.streaming.StreamOps.queries.keys.toSeq.sorted
        .filterNot(_ == "watermark_audit")) // batch-only, no stream machinery
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalDirs.shuffleDir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // session-wide listener: accumulates per-run events without touching
    // StreamOps (runToCompletion does not expose the query handle)
    val started = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ended = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        started.add(java.time.Instant.parse(e.timestamp).toEpochMilli)
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        progress.add(e.progress)
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        ended.add(System.currentTimeMillis())
    })
    def drain(): Unit = { Thread.sleep(300); started.clear(); ended.clear(); progress.clear() }

    spark.range(1000).selectExpr("sum(id)").collect() // session warm
    val keys = Seq("latestOffset", "getBatch", "queryPlanning", "walCommit",
      "commitOffsets", "addBatch", "triggerExecution")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"$name warm run failed: $e") }
      System.gc()
      drain()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wallS = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the terminated event land
      import scala.jdk.CollectionConverters._
      val ps = progress.asScala.toSeq
      val activeS = (for {
        s0 <- started.asScala.minOption
        e0 <- ended.asScala.maxOption
      } yield (e0 - s0) / 1e3).getOrElse(-1.0)
      val sums = keys.map { k =>
        k -> ps.map(p => Option(p.durationMs.get(k)).map(_.toLong)
          .getOrElse(0L)).sum
      }
      println(f"$name%-22s wall=$wallS%7.3f s active=$activeS%7.3f s " +
        f"batches=${ps.size}%2d outside=${wallS - activeS}%7.3f s rows=$n")
      println("    " + sums.map { case (k, v) => s"$k=${v}ms" }.mkString(" "))
      ps.foreach { p =>
        println(s"    batch=${p.batchId} rows=${p.numInputRows} " +
          keys.map(k => s"$k=${Option(p.durationMs.get(k)).getOrElse("-")}")
            .mkString(" "))
      }
    }
    spark.stop()
  }
}
