package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The retry hop across the worker fleet: a job with retries > 0 that fails
  * on the worker that claimed it is RE-PUBLISHED through the shared broker
  * (queue file / queue row, attempt+1, same admission epoch) rather than
  * retried on the failing worker's own timers — so any other worker can
  * claim the next attempt. The reference gets this from tasqueue
  * re-enqueueing through Redis (core.go:389-394); here it's
  * [[Scheduler.retryPublisher]] wired by [[FileQueueWorker]] and
  * [[JdbcQueueWorker]].
  *
  * Worker identity in-JVM: worker A is constructed with a ~10-minute poll
  * interval, so its ONLY poll is the startup one — it can claim the first
  * publish but structurally cannot claim the retry; worker B is started
  * only after the retry file is observed sitting unclaimed in the queue.
  * The attempt therefore provably crosses workers.
  */
class CrossWorkerRetrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Task dir with a count over `events`; the SOURCE dir starts empty so
    * attempt 1 fails (no events table), then the spec materializes the
    * table and the next attempt succeeds — wherever it runs. */
  private def fixture() = {
    val root = Files.createTempDirectory("graft-xretry").toFile
    val stateDir = new java.io.File(root, "state")
    val queueDir = new java.io.File(root, "queue")
    val tasksDir = Files.createTempDirectory("graft-xretry-tasks")
    Files.writeString(tasksDir.resolve("t.sql"),
      """-- name: count_events
        |SELECT COUNT(*) AS n FROM events;
        |""".stripMargin)
    val srcDir = Files.createTempDirectory("graft-xretry-src")
    val results = Files.createTempDirectory("graft-xretry-results").toString
    val src = SourcePool(Map("db" -> srcDir.toString))
    val bk = SourcePool(Map("res" -> results))
    val tasks = TaskRegistry.load(spark, Seq(tasksDir.toString), src, bk)
    (stateDir, queueDir, srcDir, tasks, bk)
  }

  private def makeEvents(srcDir: java.nio.file.Path): Unit = {
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("event_id", "user_id")
      .coalesce(1).write.mode("overwrite")
      .parquet(srcDir.resolve("events.parquet").toString)
  }

  private def await(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (System.currentTimeMillis < deadline) {
      if (cond) return true
      Thread.sleep(30)
    }
    cond
  }

  test("file broker: a failed attempt is re-published and another worker finishes it") {
    val (stateDir, queueDir, srcDir, tasks, bk) = fixture()
    val apiStore = new FileJobStateStore(stateDir)
    val broker = new FileQueueBroker(queueDir, apiStore)
    val job = JobFactory.make(
      JobReq("count_events", jobId = "xretry-file", retries = 1),
      tasks("count_events"))
    assert(broker.submit(job, tasks("count_events")))

    // worker A: only its startup poll runs within the test window
    val workerA = new FileQueueWorker(spark, tasks,
      new FileJobStateStore(stateDir), queueDir, pollMs = 600000)
    try {
      // attempt 1 fails (empty source dir) → retry file appears, attempt=2
      def queueFiles(): List[java.nio.file.Path] = {
        val qs = Files.list(queueDir.toPath)
        val dirs = try qs.iterator().asScala.toList.filter(p =>
          Files.isDirectory(p) && p.getFileName.toString != "_claimed")
        finally qs.close()
        dirs.flatMap { qd =>
          val fs = Files.list(qd)
          try fs.iterator().asScala.toList
            .filter(_.getFileName.toString.endsWith(".props"))
          finally fs.close()
        }
      }
      assert(await(30000) {
        queueFiles().exists(p => FileQueue.readJob(p).exists(_._3 == 2))
      }, s"retry file with attempt=2 never appeared; state=${apiStore.get(job.id)}")
      assert(apiStore.get(job.id).exists(_.state == JobState.Retry))

      // make the next attempt succeed, then bring up worker B to claim it
      makeEvents(srcDir)
      val workerB = new FileQueueWorker(spark, tasks,
        new FileJobStateStore(stateDir), queueDir, pollMs = 25)
      try {
        assert(await(60000) {
          apiStore.get(job.id).exists(_.state == JobState.Success)
        }, s"retry never succeeded on worker B; state=${apiStore.get(job.id)}")
      } finally workerB.stop()
    } finally { workerA.stop(); broker.shutdown() }
  }

  test("jdbc broker: a failed attempt is re-inserted and another worker finishes it") {
    val (stateDir, _, srcDir, tasks, bk) = fixture()
    val url = s"jdbc:derby:memory:xretry${System.nanoTime()};create=true"
    val apiStore = new JdbcJobStateStore(url)
    val broker = new JdbcQueueBroker(url, apiStore)
    val job = JobFactory.make(
      JobReq("count_events", jobId = "xretry-jdbc", retries = 1),
      tasks("count_events"))
    assert(broker.submit(job, tasks("count_events")))

    val workerA = new JdbcQueueWorker(spark, tasks,
      new JdbcJobStateStore(url), url, pollMs = 600000)
    try {
      assert(await(30000) {
        apiStore.get(job.id).exists(_.state == JobState.Retry) &&
          broker.pendingJobs(job.queue).contains(job.id)
      }, s"retry row never appeared; state=${apiStore.get(job.id)}")

      makeEvents(srcDir)
      val workerB = new JdbcQueueWorker(spark, tasks,
        new JdbcJobStateStore(url), url, pollMs = 25)
      try {
        assert(await(60000) {
          apiStore.get(job.id).exists(_.state == JobState.Success)
        }, s"retry never succeeded on worker B; state=${apiStore.get(job.id)}")
      } finally workerB.stop()
    } finally { workerA.stop(); broker.shutdown() }
  }
}
