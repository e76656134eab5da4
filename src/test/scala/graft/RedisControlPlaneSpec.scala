package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The Redis-protocol control plane over the embedded RESP server: the
  * API-node / worker-node split with SEPARATE client connections per role —
  * the in-JVM stand-in for the reference's API nodes + worker fleet sharing
  * one Redis (`cmd/init.go:200-229`), here over a real TCP round-trip. */
class RedisControlPlaneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withServer[A](f: (String, Int) => A): A = {
    val srv = new RespServer().start()
    try f("127.0.0.1", srv.boundPort) finally srv.stop()
  }

  private def fixture() = {
    val tasksDir = Files.createTempDirectory("graft-redis-tasks")
    Files.writeString(tasksDir.resolve("t.sql"),
      """-- name: count_events
        |SELECT COUNT(*) AS n FROM events;
        |
        |-- name: profit
        |SELECT CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events WHERE user_id = $1;
        |""".stripMargin)
    val results = Files.createTempDirectory("graft-redis-results").toString
    val src = SourcePool(Map("db" -> TestSpark.sf0001))
    val bk = SourcePool(Map("res" -> results))
    val tasks = TaskRegistry.load(spark, Seq(tasksDir.toString), src, bk)
    (tasks, src, bk, results)
  }

  private def await(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (System.currentTimeMillis < deadline) {
      if (cond) return true
      Thread.sleep(30)
    }
    cond
  }

  test("RESP wire basics: strings w/ NX+PX, hashes, lists, INCR, KEYS") {
    withServer { (h, p) =>
      val c = new RedisControlPlane.RespClient(h, p)
      try {
        assert(c.cmd("PING") == "PONG")
        assert(c.cmd("SET", "k", "v1") == "OK")
        assert(c.cmd("GET", "k") == "v1")
        // NX refuses while present, wins after DEL
        assert(c.cmd("SET", "k", "v2", "NX") == null)
        assert(c.cmdLong("DEL", "k") == 1)
        assert(c.cmd("SET", "k", "v2", "NX") == "OK")
        // PX expiry: key vanishes after the TTL
        assert(c.cmd("SET", "ttl", "x", "PX", "60") == "OK")
        assert(c.cmd("GET", "ttl") == "x")
        Thread.sleep(90)
        assert(c.cmd("GET", "ttl") == null)
        // INCR is the epoch counter
        assert(c.cmdLong("INCR", "n") == 1 && c.cmdLong("INCR", "n") == 2)
        // hashes
        assert(c.cmdLong("HSET", "h", "a", "1", "b", "2") == 2)
        assert(c.cmdSeq("HGETALL", "h").map(_.toString) == Seq("a", "1", "b", "2"))
        // lists: LPUSH head, RPOP tail = FIFO; LRANGE walks newest-first
        c.cmd("LPUSH", "q", "first")
        c.cmd("LPUSH", "q", "second")
        assert(c.cmdSeq("LRANGE", "q", "0", "-1").map(_.toString) ==
          Seq("second", "first"))
        assert(c.cmd("RPOP", "q") == "first")
        assert(c.cmdLong("LREM", "q", "0", "second") == 1)
        assert(c.cmd("RPOP", "q") == null)
        // KEYS glob
        c.cmd("SET", "graft:job:a", "1"); c.cmd("SET", "other", "1")
        assert(c.cmdSeq("KEYS", "graft:job:*").map(_.toString) == Seq("graft:job:a"))
      } finally c.close()
    }
  }

  test("API core enqueues; a separate Redis worker claims, executes, API sees SUCCESS") {
    withServer { (h, p) =>
      val (tasks, src, bk, results) = fixture()
      val apiStore = new RedisJobStateStore(h, p)
      val api = new GraftCore(spark, tasks, src, bk,
        mkStore = () => apiStore,
        mkBroker = (_, st) => new RedisQueueBroker(h, p, st))
      // worker node: its own connections over the same server
      val worker = new RedisQueueWorker(spark, tasks,
        new RedisJobStateStore(h, p), h, p)
      try {
        val job = api.postJob(JobReq("profit", jobId = "redis-1", args = Seq("1")))
        assert(await(60000)(apiStore.get(job.id).exists(_.state == JobState.Success)),
          s"API-side saw: ${apiStore.get(job.id)}")
        assert(apiStore.get(job.id).exists(_.count > 0))
        assert(new java.io.File(Executor.resultDir(results, "redis-1")).isDirectory,
          "result must be materialized by the worker")
        // terminal states re-admit with a NEW epoch
        val e1 = apiStore.epoch(job.id)
        val second = api.postJob(JobReq("profit", jobId = "redis-1", args = Seq("2")))
        assert(await(60000)(apiStore.get(second.id).exists(_.state == JobState.Success)))
        assert(apiStore.epoch(job.id) > e1, "re-admission must bump the epoch")
      } finally { worker.stop(); api.scheduler.shutdown(); apiStore.close() }
    }
  }

  test("duplicate ID refused across brokers; cancel drops the queued payload") {
    withServer { (h, p) =>
      val (tasks, src, bk, _) = fixture()
      val storeA = new RedisJobStateStore(h, p)
      val brokerA = new RedisQueueBroker(h, p, storeA)
      // no worker: the job stays queued
      val job = JobFactory.make(JobReq("count_events", jobId = "redis-dup"),
        tasks("count_events"))
      assert(brokerA.submit(job, tasks("count_events")))
      val brokerB = new RedisQueueBroker(h, p, new RedisJobStateStore(h, p))
      assert(!brokerB.submit(job, tasks("count_events")), "dup ID admitted twice")
      assert(brokerA.pendingJobs(job.queue) == Seq("redis-dup"))
      // cancel removes the store entry AND the unclaimed payload
      brokerA.cancel("redis-dup", purge = false, bk)
      assert(storeA.get("redis-dup").isEmpty)
      assert(brokerA.pendingJobs(job.queue).isEmpty)
      // canceled ≠ never-admitted: group reduction still accounts for it
      storeA.putGroup("g1", Seq("redis-dup"))
      val gs = storeA.groupStatus("g1")
      assert(gs.exists(_.state == JobState.Pending)) // canceled member, no live jobs
      brokerA.shutdown(); storeA.close()
    }
  }

  test("redis broker: a failed attempt is re-published and another worker finishes it") {
    withServer { (h, p) =>
      // empty source dir: attempt 1 fails; then the table materializes and
      // the RETRY attempt succeeds — on a DIFFERENT worker (worker A's only
      // poll is the startup one; worker B starts after the retry payload
      // is observed sitting in the queue)
      val tasksDir = Files.createTempDirectory("graft-redis-xr-tasks")
      Files.writeString(tasksDir.resolve("t.sql"),
        """-- name: count_events
          |SELECT COUNT(*) AS n FROM events;
          |""".stripMargin)
      val srcDir = Files.createTempDirectory("graft-redis-xr-src")
      val results = Files.createTempDirectory("graft-redis-xr-results").toString
      val src = SourcePool(Map("db" -> srcDir.toString))
      val bk = SourcePool(Map("res" -> results))
      val tasks = TaskRegistry.load(spark, Seq(tasksDir.toString), src, bk)

      val apiStore = new RedisJobStateStore(h, p)
      val broker = new RedisQueueBroker(h, p, apiStore)
      val probe = new RedisControlPlane.RespClient(h, p)
      val job = JobFactory.make(
        JobReq("count_events", jobId = "redis-xretry", retries = 1),
        tasks("count_events"))
      assert(broker.submit(job, tasks("count_events")))

      val workerA = new RedisQueueWorker(spark, tasks,
        new RedisJobStateStore(h, p), h, p, pollMs = 600000)
      try {
        // attempt 1 fails → retry payload (attempt=2) re-published to Redis
        assert(await(30000) {
          probe.cmdSeq("LRANGE", s"graft:queue:${job.queue}", "0", "-1")
            .exists(s => RedisControlPlane.decodeJob(s.toString).exists(_._3 == 2))
        }, s"retry payload never appeared; state=${apiStore.get(job.id)}")
        assert(apiStore.get(job.id).exists(_.state == JobState.Retry))
        // now the data exists; worker B claims the retry
        import spark.implicits._
        Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("event_id", "user_id")
          .coalesce(1).write.mode("overwrite")
          .parquet(srcDir.resolve("events.parquet").toString)
        val workerB = new RedisQueueWorker(spark, tasks,
          new RedisJobStateStore(h, p), h, p)
        try {
          assert(await(60000)(apiStore.get(job.id).exists(_.state == JobState.Success)),
            s"retry never completed; state=${apiStore.get(job.id)}")
        } finally workerB.stop()
      } finally { workerA.stop(); broker.shutdown(); apiStore.close(); probe.close() }
    }
  }

  test("worker survives a broker outage and resumes claiming after restart") {
    val srv1 = new RespServer().start()
    val h = "127.0.0.1"; val p = srv1.boundPort
    val (tasks, src, bk, _) = fixture()
    val worker = new RedisQueueWorker(spark, tasks,
      new RedisJobStateStore(h, p), h, p)
    try {
      srv1.stop()
      Thread.sleep(300) // several poll ticks hit the dead socket
      // the poll thread must still be alive — transient socket errors are
      // caught like the JDBC worker's SQLException, not thread-fatal
      val pollThread = Thread.getAllStackTraces.keySet().stream()
        .filter(_.getName == "graft-redis-queue-worker").findFirst()
      assert(pollThread.isPresent && pollThread.get().isAlive,
        "broker outage killed the worker poll thread")
      // broker comes back on the same port; worker must resume claiming
      val srv2 = new RespServer(p).start()
      try {
        val apiStore = new RedisJobStateStore(h, p)
        val api = new GraftCore(spark, tasks, src, bk,
          mkStore = () => apiStore,
          mkBroker = (_, st) => new RedisQueueBroker(h, p, st))
        try {
          val job = api.postJob(JobReq("count_events", jobId = "redis-revive"))
          val ok = await(60000)(apiStore.get(job.id).exists(_.state == JobState.Success))
          if (!ok) {
            val probe = new RedisControlPlane.RespClient("127.0.0.1", p)
            println(s"DEBUG queues=${probe.cmdSeq("KEYS", "graft:queue:*")}")
            println(s"DEBUG q-content=${probe.cmdSeq("LRANGE", s"graft:queue:${job.queue}", "0", "-1")}")
            probe.close()
            import scala.jdk.CollectionConverters._
            Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
              if (t.getName == "graft-redis-queue-worker")
                println(s"DEBUG worker thread ${t.getState}:\n  " + st.take(12).mkString("\n  "))
            }
          }
          assert(ok,
            s"worker never resumed after restart; state=${apiStore.get(job.id)}")
        } finally { api.scheduler.shutdown(); apiStore.close() }
      } finally srv2.stop()
    } finally worker.stop()
  }

  test("client disconnect mid-command frees the server thread; server stays up") {
    withServer { (h, p) =>
      def connThreads = Thread.getAllStackTraces.keySet().stream()
        .filter(t => t.getName == "graft-resp-conn" && t.isAlive).count()
      val before = connThreads
      val raw = new java.net.Socket(h, p)
      raw.getOutputStream.write("*1\r\n$4".getBytes) // EOF mid length-line
      raw.getOutputStream.flush()
      raw.close()
      // the handler must see EOF and exit, not busy-loop on read()== -1
      assert(await(5000)(connThreads <= before),
        s"handler thread pinned after mid-command disconnect ($connThreads live)")
      val c = new RedisControlPlane.RespClient(h, p)
      try assert(c.cmd("PING") == "PONG") finally c.close()
    }
  }

  test("LMOVE/RPOPLPUSH/LPOP/LINDEX wire semantics (the reliable-queue primitives)") {
    withServer { (h, p) =>
      val c = new RedisControlPlane.RespClient(h, p)
      try {
        c.cmd("LPUSH", "src", "a") // src = [c, b, a] after three LPUSHes
        c.cmd("LPUSH", "src", "b")
        c.cmd("LPUSH", "src", "c")
        assert(c.cmd("LINDEX", "src", "0") == "c")
        assert(c.cmd("LINDEX", "src", "-1") == "a")
        assert(c.cmd("LINDEX", "src", "7") == null)
        // the claim: atomic pop-from-tail, park-at-head
        assert(c.cmd("LMOVE", "src", "park", "RIGHT", "LEFT") == "a")
        assert(c.cmdSeq("LRANGE", "park", "0", "-1").map(_.toString) == Seq("a"))
        // legacy spelling ≡ LMOVE RIGHT LEFT
        assert(c.cmd("RPOPLPUSH", "src", "park") == "b")
        assert(c.cmdSeq("LRANGE", "park", "0", "-1").map(_.toString) == Seq("b", "a"))
        // the reaper's re-queue: head of park to tail of src
        assert(c.cmd("LMOVE", "park", "src", "LEFT", "RIGHT") == "b")
        assert(c.cmdSeq("LRANGE", "src", "0", "-1").map(_.toString) == Seq("c", "b"))
        assert(c.cmd("LPOP", "park") == "a")
        assert(c.cmd("LPOP", "park") == null)
        // single-element self-rotate must not lose the element
        c.cmd("LPUSH", "one", "x")
        assert(c.cmd("LMOVE", "one", "one", "LEFT", "RIGHT") == "x")
        assert(c.cmdSeq("LRANGE", "one", "0", "-1").map(_.toString) == Seq("x"))
        assert(c.cmd("LMOVE", "empty", "park", "RIGHT", "LEFT") == null)
      } finally c.close()
    }
  }

  test("reliable queue: a parked claim whose reply was lost is reaped back and executed") {
    withServer { (h, p) =>
      val (tasks, _, _, _) = fixture()
      val apiStore = new RedisJobStateStore(h, p)
      val broker = new RedisQueueBroker(h, p, apiStore)
      val probe = new RedisControlPlane.RespClient(h, p)
      try {
        val job = JobFactory.make(JobReq("count_events", jobId = "redis-reap-1"),
          tasks("count_events"))
        assert(broker.submit(job, tasks("count_events")))
        // simulate the lost-reply claim: the payload moved into a worker's
        // processing list but no worker ever saw the reply (the window the
        // old RPOP spelling lost the payload in — permanently)
        assert(probe.cmd("LMOVE", s"graft:queue:${job.queue}",
          "graft:processing:w0", "RIGHT", "LEFT") != null)
        assert(probe.cmdLong("LLEN", s"graft:queue:${job.queue}") == 0)
        assert(apiStore.get(job.id).exists(_.state == JobState.Pending))
        // a worker with the SAME workerId starts (the restart-recovery
        // contract): its reaper must re-queue the orphan and execute it
        val worker = new RedisQueueWorker(spark, tasks,
          new RedisJobStateStore(h, p), h, p, workerId = "w0")
        try {
          assert(await(60000)(apiStore.get(job.id).exists(_.state == JobState.Success)),
            s"orphaned claim never recovered; state=${apiStore.get(job.id)}")
          assert(probe.cmdLong("LLEN", "graft:processing:w0") == 0,
            "processing list must drain after the ack")
        } finally worker.stop()
      } finally { broker.shutdown(); apiStore.close(); probe.close() }
    }
  }

  test("reliable queue: a terminal orphan is dropped, never re-run") {
    withServer { (h, p) =>
      // empty source: ANY (re-)run of the task fails, so a wrongly
      // re-queued orphan would flip the store to Retry/Failure — the state
      // staying Success is the proof the reaper dropped instead of re-ran
      val tasksDir = Files.createTempDirectory("graft-redis-reap2-tasks")
      Files.writeString(tasksDir.resolve("t.sql"),
        """-- name: count_events
          |SELECT COUNT(*) AS n FROM events;
          |""".stripMargin)
      val srcDir = Files.createTempDirectory("graft-redis-reap2-src")
      val results = Files.createTempDirectory("graft-redis-reap2-results").toString
      val src = SourcePool(Map("db" -> srcDir.toString))
      val bk = SourcePool(Map("res" -> results))
      val tasks = TaskRegistry.load(spark, Seq(tasksDir.toString), src, bk)
      val apiStore = new RedisJobStateStore(h, p)
      val probe = new RedisControlPlane.RespClient(h, p)
      try {
        val job = JobFactory.make(JobReq("count_events", jobId = "redis-reap-2"),
          tasks("count_events"))
        val epoch = apiStore.tryAdmit(job.id)
        assert(epoch > 0)
        // the job completed long ago; a stale parked payload survived (ack
        // reply lost, then the worker crashed before its reaper retried)
        apiStore.set(job.id, JobState.Success, 42, "")
        probe.cmd("LPUSH", "graft:processing:w0",
          RedisControlPlane.encodeJob(job, epoch, 1))
        val worker = new RedisQueueWorker(spark, tasks,
          new RedisJobStateStore(h, p), h, p, workerId = "w0")
        try {
          assert(await(10000)(probe.cmdLong("LLEN", "graft:processing:w0") == 0),
            "terminal orphan must be dropped from the processing list")
          Thread.sleep(200) // a wrong re-queue would be claiming about now
          assert(apiStore.get(job.id).contains(JobStatus(job.id, JobState.Success, 42, "")),
            s"terminal state must be untouched; got ${apiStore.get(job.id)}")
          assert(probe.cmdLong("LLEN", s"graft:queue:${job.queue}") == 0,
            "terminal orphan must not be re-queued")
        } finally worker.stop()
      } finally { apiStore.close(); probe.close() }
    }
  }

  test("dead-socket RPOP rethrows (no blind retry); idempotent GET silently reconnects") {
    withServer { (h, p) =>
      val c = new RedisControlPlane.RespClient(h, p)
      try {
        c.cmd("LPUSH", "dq", "p1", "p2")
        // idempotent read: a severed connection is invisible to the caller
        c.dropConnection()
        assert(c.cmd("LLEN", "dq") == 2L)
        // destructive read: severed connection must SURFACE, because the
        // broker may have executed the pop and the reply is unrecoverable —
        // a blind retry here would discard a second claimed payload
        c.dropConnection()
        intercept[java.io.IOException](c.cmd("RPOP", "dq"))
        // but the client reconnected behind the failure: the NEXT command
        // works, and both payloads are still claimable (nothing was popped
        // by a hidden retry — the send itself never reached the broker)
        assert(c.cmd("LLEN", "dq") == 2L)
        assert(c.cmd("RPOP", "dq") == "p1")
        assert(c.cmd("RPOP", "dq") == "p2")
      } finally c.close()
    }
  }
}
