package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end job lifecycle through the library facade — the port of the
  * reference's client e2e suite (`client/client_test.go`): post jobs and
  * groups, poll state transitions, pending listing, cancellation, purge.
  */
class GraftCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def newCore(): GraftCore = {
    val tasksDir = Files.createTempDirectory("graft-e2e-tasks")
    Files.writeString(tasksDir.resolve("tasks.sql"),
      """-- name: get_profit_summary
        |-- queue: test
        |SELECT CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
        |       CAST(ts AS DATE) AS entry_date
        |FROM events WHERE user_id = $1 GROUP BY CAST(ts AS DATE) ORDER BY entry_date;
        |
        |-- name: get_profit_entries
        |-- queue: test
        |SELECT * FROM events WHERE user_id = $1;
        |
        |-- name: get_profit_entries_by_date
        |-- queue: test
        |SELECT * FROM events WHERE user_id = $1 AND ts > $2 AND ts < $3;
        |
        |-- name: slow_query
        |-- queue: slow
        |-- conc: 1
        |SELECT COUNT(*) AS n FROM lineitem a CROSS JOIN lineitem b CROSS JOIN lineitem c
        |WHERE a.l_quantity + b.l_quantity + c.l_quantity > $1;
        |
        |-- name: broken_query
        |SELECT no_such_column FROM events;
        |""".stripMargin)
    val results = Files.createTempDirectory("graft-e2e-results").toString
    GraftCore(spark, Seq(tasksDir.toString),
      sources = Map("my_db" -> TestSpark.sf0001),
      resultBackends = Map("my_results" -> results))
  }

  private def await(core: GraftCore, id: String, timeoutMs: Long = 60000): JobStatus = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (System.currentTimeMillis < deadline) {
      core.store.get(id) match {
        case Some(s) if s.state == JobState.Success || s.state == JobState.Failure => return s
        case _ => Thread.sleep(30)
      }
    }
    fail(s"job $id did not finish in ${timeoutMs}ms: ${core.store.get(id)}")
  }

  test("job end-to-end: enqueue → SUCCESS → materialized canonical result " +
       "(client_test.go:104-122 + server_test.go.bak:261-286)") {
    val core = newCore()
    val job = core.postJob(JobReq("get_profit_summary", jobId = "e2e-1", args = Seq("1")))
    assert(job.queue == "test")
    val st = await(core, job.id)
    assert(st.state == JobState.Success)
    assert(st.count > 0)
    val res = core.results(job.id)
    assert(res.count() == st.count)
    assert(res.schema("total").dataType == DoubleType)      // NUMERIC class
    assert(res.schema("entry_date").dataType == DateType)   // DATE
    core.shutdown()
  }

  test("args bind typed: range query with timestamps (test.postgres.sql:19-21)") {
    val core = newCore()
    val job = core.postJob(JobReq("get_profit_entries_by_date",
      args = Seq("1", "2024-01-01 00:00:00", "2024-06-01 00:00:00")))
    val st = await(core, job.id)
    assert(st.state == JobState.Success && st.count >= 0)
    core.shutdown()
  }

  test("failure path: bad column → FAILURE with error (getState, core.go:584-599)") {
    val core = newCore()
    val job = core.postJob(JobReq("broken_query"))
    val st = await(core, job.id)
    assert(st.state == JobState.Failure)
    assert(st.error.nonEmpty)
    core.shutdown()
  }

  test("duplicate running job ID is refused (core.go:332-339)") {
    val core = newCore()
    core.postJob(JobReq("slow_query", jobId = "dup-1", args = Seq("0"), ttlSec = 120))
    val e = intercept[IllegalStateException](
      core.postJob(JobReq("slow_query", jobId = "dup-1", args = Seq("0"))))
    assert(e.getMessage.contains("already queued or running"))
    core.deleteJob("dup-1") // cleanup: cancel the in-flight cross join
    core.shutdown()
  }

  test("cancel kills an in-flight job and removes it (core.go:244-271)") {
    val core = newCore()
    val job = core.postJob(JobReq("slow_query", jobId = "cancel-me", args = Seq("0"), ttlSec = 300))
    // wait for it to actually start
    val deadline = System.currentTimeMillis + 30000
    while (core.store.get(job.id).exists(_.state == JobState.Pending) &&
           System.currentTimeMillis < deadline) Thread.sleep(20)
    core.deleteJob(job.id)
    intercept[NoSuchElementException](core.getJobStatus(job.id))
    // the worker slot frees up again (the spark job group was interrupted)
    assert(core.scheduler.awaitQuiescence(60000), "worker did not free after cancel")
    core.shutdown()
  }

  test("TTL cancels overlong jobs (core.go:354-357)") {
    val core = newCore()
    val job = core.postJob(JobReq("slow_query", args = Seq("0"), ttlSec = 2))
    val deadline = System.currentTimeMillis + 90000
    var st = core.store.get(job.id)
    while (st.exists(s => s.state == JobState.Pending || s.state == JobState.Started) &&
           System.currentTimeMillis < deadline) { Thread.sleep(50); st = core.store.get(job.id) }
    assert(st.exists(_.state == JobState.Failure), s"expected TTL failure, got $st")
    core.shutdown()
  }

  test("retries re-attempt a failing job and succeed once the source heals") {
    // source dir starts without events.parquet: every attempt fails at
    // analysis until the test drops the file in during a RETRY backoff
    val srcDir = Files.createTempDirectory("graft-retry-src")
    Files.copy(java.nio.file.Path.of(TestSpark.sf0001, "region.parquet"),
      srcDir.resolve("region.parquet"))
    val tasksDir = Files.createTempDirectory("graft-retry-tasks")
    Files.writeString(tasksDir.resolve("t.sql"),
      "-- name: n_events\nSELECT COUNT(*) AS n FROM events;\n")
    val results = Files.createTempDirectory("graft-retry-res").toString
    val core = GraftCore(spark, Seq(tasksDir.toString),
      sources = Map("db" -> srcDir.toString),
      resultBackends = Map("res" -> results))
    val job = core.postJob(JobReq("n_events", retries = 8))
    // wait until at least one failed attempt has been recorded as RETRY
    val deadline = System.currentTimeMillis + 60000
    var sawRetry = false
    while (!sawRetry && System.currentTimeMillis < deadline) {
      sawRetry = core.store.get(job.id).exists(_.state == JobState.Retry)
      if (!sawRetry) Thread.sleep(10)
    }
    assert(sawRetry, s"never observed RETRY: ${core.store.get(job.id)}")
    // heal the source mid-backoff; a later attempt must succeed
    Files.copy(java.nio.file.Path.of(TestSpark.sf0001, "events.parquet"),
      srcDir.resolve("events.parquet"))
    val st = await(core, job.id)
    assert(st.state == JobState.Success, st.toString)
    assert(st.count == 1L) // one row: the COUNT(*) aggregate
    assert(core.results(job.id).head.getLong(0) == 1000L)
    core.shutdown()
  }

  test("retry exhaustion lands FAILURE after retries+1 attempts") {
    val core = newCore()
    val job = core.postJob(JobReq("broken_query", retries = 2))
    val st = await(core, job.id)
    assert(st.state == JobState.Failure)
    assert(st.error.nonEmpty)
    core.shutdown()
  }

  test("groups fan out and reduce state (core.go:107-147, 207-241)") {
    val core = newCore()
    val (gid, jobs) = core.postJobGroup("grp-1", Seq(
      JobReq("get_profit_summary", args = Seq("1")),
      JobReq("get_profit_entries", args = Seq("2")),
      JobReq("get_profit_entries_by_date",
        args = Seq("3", "2024-01-01 00:00:00", "2024-12-01 00:00:00"))))
    assert(gid == "grp-1" && jobs.size == 3)
    jobs.foreach(j => await(core, j.id))
    val g = core.getGroupStatus(gid)
    assert(g.state == JobState.Success && g.jobs.size == 3)
    core.shutdown()
  }

  test("cancelling a mixed-state group cancels running members, drops done ones") {
    val core = newCore()
    val (gid, _) = core.postJobGroup("grp-mixed", Seq(
      JobReq("get_profit_entries", jobId = "gm-fast", args = Seq("1")),
      JobReq("slow_query", jobId = "gm-slow", args = Seq("0"), ttlSec = 300)))
    await(core, "gm-fast") // fast member completes; slow one keeps running
    core.deleteGroup(gid)  // must NOT throw on the completed member
    intercept[NoSuchElementException](core.getJobStatus("gm-fast"))
    intercept[NoSuchElementException](core.getJobStatus("gm-slow"))
    intercept[NoSuchElementException](core.getGroupStatus(gid))
    assert(core.scheduler.awaitQuiescence(60000))
    core.shutdown()
  }

  test("pending listing is newest-first (core.go:156-159)") {
    val core = newCore()
    // conc=1 'slow' queue: first job occupies the worker, rest stay pending
    core.postJob(JobReq("slow_query", jobId = "p0", args = Seq("0"), ttlSec = 120))
    Thread.sleep(200) // let p0 leave the backlog and start
    core.postJob(JobReq("slow_query", jobId = "p1", args = Seq("0")))
    core.postJob(JobReq("slow_query", jobId = "p2", args = Seq("0")))
    assert(core.getPendingJobs("slow") == Seq("p2", "p1"))
    core.deleteJob("p1"); core.deleteJob("p2"); core.deleteJob("p0")
    core.shutdown()
  }

  test("purge deletes the materialized result dir (CancelJob purge flag)") {
    val core = newCore()
    val job = core.postJob(JobReq("get_profit_summary", jobId = "purge-1", args = Seq("1")))
    await(core, job.id)
    val dir = new java.io.File(
      Executor.resultDir(core.resultBackends.sources.values.head, job.id))
    assert(dir.exists())
    // completed job: cancel without purge must refuse (core.go:252-254)
    intercept[IllegalStateException](core.deleteJob(job.id))
    core.deleteJob(job.id, purge = true)
    assert(!dir.exists())
    core.shutdown()
  }

  test("per-task concurrency limits tasks, not the queue (core.go:437-440)") {
    val tasksDir = Files.createTempDirectory("conc-tasks")
    Files.writeString(tasksDir.resolve("t.sql"),
      """-- name: quick
        |-- queue: mixed
        |SELECT 1 AS ok;
        |
        |-- name: slow_serial
        |-- queue: mixed
        |-- conc: 1
        |SELECT graft_sleep(1200) AS ok;
        |""".stripMargin)
    val out = Files.createTempDirectory("conc-out").toString
    val core = GraftCore(spark, Seq(tasksDir.toString),
      Map("db" -> TestSpark.sf0001), Map("res" -> out))
    val t0 = System.currentTimeMillis
    // pin the 'mixed' queue pool with the quick task first (conc 10)
    core.postJob(JobReq("quick", jobId = "q0"))
    core.postJob(JobReq("slow_serial", jobId = "s1", ttlSec = 60))
    core.postJob(JobReq("slow_serial", jobId = "s2", ttlSec = 60))
    core.postJob(JobReq("quick", jobId = "q1"))
    await(core, "q1", 30000) // quick task flows while slow ones hold slots
    assert(System.currentTimeMillis - t0 < 20000)
    await(core, "s1"); await(core, "s2")
    // two conc-1 jobs of 1.2s each must have serialized
    assert(System.currentTimeMillis - t0 >= 2400,
      s"slow_serial jobs overlapped: ${System.currentTimeMillis - t0}ms")
    core.shutdown()
  }

  test("ETA delays execution (core.go:359-367)") {
    val core = newCore()
    val eta = java.time.LocalDateTime.now.plusSeconds(2)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    val t0 = System.currentTimeMillis
    val job = core.postJob(JobReq("get_profit_entries", args = Seq("1"), eta = Some(eta)))
    val st = await(core, job.id)
    assert(st.state == JobState.Success)
    assert(System.currentTimeMillis - t0 >= 1000, "job ran before its ETA")
    core.shutdown()
  }

  test("listTasks: names by default, SQL on request (documented deviation)") {
    val core = newCore()
    assert(core.listTasks().left.exists(_.contains("slow_query")))
    assert(core.listTasks(withSql = true).exists(_("get_profit_entries").contains("SELECT *")))
    core.shutdown()
  }

  test("control-plane SPI: a custom JobStateStore plugs in behind the facade") {
    // delegating store standing in for a shared (Redis/JDBC) impl — proves
    // the scheduler/facade run against the trait, not the concrete class
    class CountingStore extends JobStateStore {
      val inner = new StatusStore
      val admits = new java.util.concurrent.atomic.AtomicInteger
      def tryAdmit(id: String): Long = { admits.incrementAndGet(); inner.tryAdmit(id) }
      def epoch(id: String): Long = inner.epoch(id)
      def set(id: String, st: JobState.Value, count: Long, error: String): Unit =
        inner.set(id, st, count, error)
      def setIfPresent(id: String, st: JobState.Value, count: Long, error: String): Unit =
        inner.setIfPresent(id, st, count, error)
      def get(id: String): Option[JobStatus] = inner.get(id)
      def remove(id: String): Unit = inner.remove(id)
      def rollback(id: String): Unit = inner.rollback(id)
      def putGroup(groupId: String, jobIds: Seq[String]): Unit = inner.putGroup(groupId, jobIds)
      def groupJobIds(groupId: String): Option[Seq[String]] = inner.groupJobIds(groupId)
      def removeGroup(groupId: String): Unit = inner.removeGroup(groupId)
      def groupStatus(groupId: String): Option[GroupStatus] = inner.groupStatus(groupId)
      def snapshot: Map[String, JobStatus] = inner.snapshot
    }
    val counting = new CountingStore
    val base = newCore()
    val core = new GraftCore(spark, base.tasks, base.sources, base.resultBackends,
      mkStore = () => counting)
    val job = core.postJob(JobReq("get_profit_entries", args = Seq("1")))
    assert(await(core, job.id).state == JobState.Success)
    assert(counting.admits.get() == 1, "facade must route admission through the SPI store")
    core.shutdown(); base.shutdown()
  }
}
