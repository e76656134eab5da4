package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev-only per-query cost decomposition: for each named query, one warm
  * run then one measured run, reporting wall seconds, job/stage/task
  * counts, summed executor task time, summed stage wall (first-launch →
  * last-finish per stage) and the DRIVER GAP (wall − union of stage
  * windows ≈ planning + scheduling + driver-side work between jobs).
  * Queries whose gap dominates are planning/barrier-bound (fix: fewer
  * jobs/passes); queries whose task time ≫ stage wall are
  * parallelism-bound; queries whose stage wall ≈ wall are compute/
  * shuffle-bound inside stages (fix: per-task work or shuffle bytes).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32
  *   runMain graft.tools.ProfileJobs <query>[,<query>...]`
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.headOption.map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("tpch_q1"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalDirs.shuffleDir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var taskTimeMs = 0L
    val stageWindows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        val si = sc.stageInfo
        tasks += si.numTasks
        for (s <- si.submissionTime; e <- si.completionTime)
          stageWindows.add((s, e))
        taskTimeMs += si.taskMetrics.executorRunTime
      }
    })
    def flush(): Unit =
      try {
        val bus = spark.sparkContext.getClass
          .getMethod("listenerBus").invoke(spark.sparkContext)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: ReflectiveOperationException => Thread.sleep(500) }

    spark.range(1000).selectExpr("sum(id)").collect() // session warm
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"$name warm run failed: $e") }
      System.gc()
      flush()
      jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0; stageWindows.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wallS = (System.nanoTime() - t0) / 1e9
      flush()
      // union of stage windows (merge overlaps) = time with ≥1 stage live
      import scala.jdk.CollectionConverters._
      val merged = stageWindows.asScala.toSeq.sortBy(_._1)
        .foldLeft(List.empty[(Long, Long)]) {
          case ((s0, e0) :: t, (s, e)) if s <= e0 => (s0, math.max(e0, e)) :: t
          case (acc, w) => w :: acc
        }
      val stageLiveS = merged.map { case (s, e) => (e - s) / 1e3 }.sum
      println(f"$name%-24s wall=$wallS%7.3f s  jobs=$jobs%3d stages=$stages%4d " +
        f"tasks=$tasks%5d  taskTime=${taskTimeMs / 1e3}%8.3f s  " +
        f"stageLive=$stageLiveS%7.3f s  driverGap=${wallS - stageLiveS}%7.3f s  rows=$n")
    }
    spark.stop()
  }
}
