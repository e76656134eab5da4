package graft

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets

/** Redis-protocol control plane — the THIRD [[JobStateStore]]/[[JobBroker]]
  * implementation, speaking RESP2 on the wire.
  *
  * This is the reference's actual deployment topology: its only supported
  * broker/state store is Redis (`cmd/init.go:200-229` hard-rejects any
  * `job_queue.*.type` but "redis"), with tasqueue pushing job payloads
  * through Redis lists and states through Redis hashes. The port's file and
  * JDBC planes prove the SPI; this one closes the deployment-parity gap —
  * an operator who already runs Redis points `graft` at the same address.
  *
  * Key layout (all under a configurable prefix, default `graft:`):
  *   - `job:<id>`    hash {state, count, error} — present ⇔ admitted entry
  *   - `meta:<id>`   admission epoch counter (INCR; survives cancel, which
  *                   is what keeps epochs monotonic across cancel+re-admit)
  *   - `cancel:<id>` canceled marker (group reduction needs canceled vs
  *                   never-admitted)
  *   - `lock:<id>`   admission lock: `SET … NX PX <ttl>` — the standard
  *                   single-instance Redis lock; the TTL bounds the damage
  *                   of a lock-holder crash
  *   - `queue:<q>`   job payload list — LPUSH at head, claim from tail
  *                   (FIFO); a retry re-publish LPUSHes the next attempt so
  *                   ANY worker claims it (the cross-worker retry hop)
  *   - `processing:<worker>` the reliable-queue parking list: a claim is
  *                   `LMOVE queue:<q> processing:<w> RIGHT LEFT` (atomic
  *                   pop-and-park), acked with LREM once handed to the
  *                   local scheduler; [[RedisQueueWorker]]'s reaper
  *                   recovers orphans (see there)
  *   - `group:<gid>` member-ID list
  *
  * Atomicity: every single Redis command is atomic (the server is
  * single-threaded over its keyspace — [[RespServer]] reproduces this with
  * one command mutex), and the only read-modify-write — admission — runs
  * under the `lock:<id>` NX lock exactly like [[FileJobStateStore]]'s file
  * lock. The claim is an atomic LMOVE into the worker's processing list:
  * exactly one worker moves each payload, and a reply lost with the socket
  * leaves the payload parked there (recoverable) instead of gone — the
  * Redis reliable-queue pattern (RPOPLPUSH in pre-6.2 spellings). Snapshot
  * uses KEYS under the prefix (SCAN in a production deployment — same
  * contract, cursor-paged).
  *
  * Honest limitation (same as the file plane, documented there): a worker
  * crashing AFTER the hand-off ack (payload LREMed, job running in its
  * local scheduler) still strands the job's store entry until a
  * re-admission — the processing list covers the claim window, not
  * mid-execution crashes; cancel-while-RUNNING in another process
  * converges state but cannot reclaim the compute.
  */
object RedisControlPlane {

  /** Minimal RESP2 client: commands go out as arrays of bulk strings,
    * replies parse the five RESP types. One socket; callers are serialized
    * per client (the scheduler's per-queue pools hold separate clients or
    * share one — both safe). */
  final class RespClient(host: String, port: Int) extends AutoCloseable {
    private var socket = connect()
    private var in = new BufferedInputStream(socket.getInputStream)
    private var out = new BufferedOutputStream(socket.getOutputStream)

    private def connect(): Socket = {
      val s = new Socket(host, port)
      s.setTcpNoDelay(true)
      s
    }

    /** Drop the (possibly half-dead) connection and dial a fresh one —
      * the queue worker's transient-error recovery after a broker restart.
      * Throws if the broker is still down; the caller retries next tick. */
    def reconnect(): Unit = synchronized {
      try socket.close() catch { case _: Exception => () }
      socket = connect()
      in = new BufferedInputStream(socket.getInputStream)
      out = new BufferedOutputStream(socket.getOutputStream)
    }

    /** Commands whose REPLY carries otherwise-unrecoverable state. RPOP is
      * a destructive read: if the broker executes it but the connection
      * dies before the reply is read, the popped payload is gone with the
      * socket — a blind retry would pop (and process) a SECOND payload
      * while the first job is stranded non-terminal forever. The
      * at-least-once argument that justifies retrying everything else
      * (epochs absorb a duplicate LPUSH/INCR; GET/SET/DEL/HSET/EXISTS/
      * KEYS/LRANGE/LLEN are idempotent; an LREM replay removes nothing
      * new) does NOT hold for a lost destructive read, so these commands
      * surface the IOException to the caller instead — the queue worker's
      * poll loop already treats that as a skipped tick.
      *
      * LMOVE/RPOPLPUSH are in the set for the same no-blind-retry reason
      * (a replay would claim a SECOND payload), but their lost reply is
      * no longer lost DATA: the atomic move parks the payload in the
      * worker's processing list, where [[RedisQueueWorker]]'s reaper
      * recovers it — the standard Redis reliable-queue pattern. */
    private val noRetry =
      Set("RPOP", "LPOP", "BRPOP", "BLPOP", "LMOVE", "RPOPLPUSH", "BLMOVE")

    /** Send one command, return its reply: String (+simple/$bulk), Long
      * (:int), null ($-1), Seq[Any] (*array). -error throws.
      *
      * On a socket-level failure (broker restarted, connection dropped) the
      * client reconnects and retries the command ONCE — the standard
      * real-Redis client behavior — EXCEPT for [[noRetry]] destructive
      * reads, where a lost reply is lost data, not a harmless duplicate:
      * those reconnect (so the next command starts clean) and rethrow. A
      * broker that is still down rethrows to the caller either way. */
    def cmd(args: String*): Any = synchronized {
      try sendAndRead(args)
      catch {
        case e: java.io.IOException if noRetry(args.head.toUpperCase) =>
          try reconnect() catch { case _: Exception => () }
          throw e
        case _: java.io.IOException =>
          reconnect()
          sendAndRead(args)
      }
    }

    /** Test seam: sever the live socket (as a broker restart would) without
      * touching client state, so specs can drive the retry-vs-rethrow split
      * in [[cmd]] deterministically. */
    private[graft] def dropConnection(): Unit =
      try socket.close() catch { case _: Exception => () }

    private def sendAndRead(args: Seq[String]): Any = {
      val sb = new java.lang.StringBuilder()
      sb.append('*').append(args.length).append("\r\n")
      args.foreach { a =>
        val b = a.getBytes(StandardCharsets.UTF_8)
        sb.append('$').append(b.length).append("\r\n").append(a).append("\r\n")
      }
      out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
      out.flush()
      readReply()
    }

    def cmdLong(args: String*): Long = cmd(args: _*) match {
      case l: Long => l
      case other => throw new IllegalStateException(s"expected :int, got $other")
    }

    def cmdSeq(args: String*): Seq[Any] = cmd(args: _*) match {
      case s: Seq[_] => s
      case null => Nil
      case other => throw new IllegalStateException(s"expected *array, got $other")
    }

    private def readLine(): String = {
      val sb = new java.lang.StringBuilder()
      var c = in.read()
      while (c != '\r') {
        if (c < 0) throw new java.io.EOFException("connection closed")
        sb.append(c.toChar)
        c = in.read()
      }
      in.read() // \n
      sb.toString
    }

    private def readReply(): Any = in.read() match {
      case '+' => readLine()
      case '-' => throw new IllegalStateException(s"redis error: ${readLine()}")
      case ':' => readLine().toLong
      case '$' =>
        val n = readLine().toInt
        if (n < 0) null
        else {
          val buf = new Array[Byte](n)
          var off = 0
          while (off < n) {
            val r = in.read(buf, off, n - off)
            if (r < 0) throw new java.io.EOFException("connection closed")
            off += r
          }
          in.read(); in.read() // \r\n
          new String(buf, StandardCharsets.UTF_8)
        }
      case '*' =>
        val n = readLine().toInt
        if (n < 0) null else Seq.fill(n)(readReply())
      case -1 =>
        // EOF is a socket-level condition (broker closed the connection),
        // not a protocol error — surface it as IOException so cmd()'s
        // reconnect-and-retry-once path handles it.
        throw new java.io.EOFException("connection closed")
      case c => throw new IllegalStateException(s"bad RESP type byte: $c")
    }

    override def close(): Unit = {
      try cmd("QUIT") catch { case _: Exception => () }
      socket.close()
    }
  }

  /** Compact job payload codec for the queue lists: one URL-encoded field
    * per line (order fixed), so payloads round-trip bytes-exactly — LREM
    * removes the exact string LRANGE returned. */
  private[graft] def encodeJob(job: Job, epoch: Long, attempt: Int): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)
    (Seq(job.id, job.taskName, job.queue, job.eta.map(_.toString).getOrElse(""),
      job.retries.toString, job.ttlSec.toString, job.db.getOrElse(""),
      epoch.toString, attempt.toString, job.args.size.toString) ++ job.args)
      .map(enc).mkString("\n")
  }

  private[graft] def decodeJob(s: String): Option[(Job, Long, Int)] = try {
    def dec(x: String) = java.net.URLDecoder.decode(x, StandardCharsets.UTF_8)
    val f = s.split("\n", -1).map(dec)
    val nargs = f(9).toInt
    Some((Job(f(0), f(1), f(2),
      Some(f(3)).filter(_.nonEmpty).map(java.time.LocalDateTime.parse),
      f(4).toInt, f(5).toInt, (0 until nargs).map(i => f(10 + i)),
      Some(f(6)).filter(_.nonEmpty)),
      f(7).toLong, f(8).toInt))
  } catch { case _: Exception => None }
}

/** [[JobStateStore]] over Redis. Mirrors [[FileJobStateStore]]'s semantics
  * 1:1 (the scaladoc there states the contracts); see the key layout in
  * [[RedisControlPlane]]. */
final class RedisJobStateStore(host: String, port: Int, prefix: String = "graft:")
    extends JobStateStore with AutoCloseable {
  import RedisControlPlane.RespClient
  private val c = new RespClient(host, port)

  private def jobKey(id: String) = s"${prefix}job:$id"
  private def metaKey(id: String) = s"${prefix}meta:$id"
  private def cancelKey(id: String) = s"${prefix}cancel:$id"
  private def lockKey(id: String) = s"${prefix}lock:$id"
  private def groupKey(id: String) = s"${prefix}group:$id"

  /** Run `f` under the per-ID NX lock (5 s TTL bounds a holder crash;
    * admission's critical section is a handful of commands). */
  private def withLock[A](id: String)(f: => A): A = {
    val key = lockKey(id)
    val token = s"${ProcessHandle.current().pid()}-${Thread.currentThread().getId}"
    val deadline = System.currentTimeMillis + 10000
    var held = false
    while (!held) {
      if (c.cmd("SET", key, token, "NX", "PX", "5000") != null) held = true
      else if (System.currentTimeMillis > deadline)
        throw new IllegalStateException(s"lock timeout on $key")
      else Thread.sleep(2)
    }
    // Compare-and-delete: if the critical section outlived the TTL (GC
    // pause, slow broker) another holder now owns the key — an
    // unconditional DEL would release THEIR lock and cascade mutual-
    // exclusion loss. GET+compare is atomic enough against the embedded
    // single-command-at-a-time server; real Redis would use the standard
    // Lua compare-and-delete script.
    try f finally {
      val cur = c.cmd("GET", key)
      if (cur != null && cur.toString == token) c.cmd("DEL", key): Unit
    }
  }

  private def readStatus(id: String): Option[JobStatus] = {
    val kv = c.cmdSeq("HGETALL", jobKey(id)).map(_.toString)
    if (kv.isEmpty) None
    else {
      val m = kv.grouped(2).map(p => p.head -> p(1)).toMap
      Some(JobStatus(id, JobState.withName(m("state")),
        m.getOrElse("count", "-1").toLong, m.getOrElse("error", "")))
    }
  }

  private def writeStatus(id: String, st: JobState.Value, count: Long, error: String): Unit =
    c.cmd("HSET", jobKey(id), "state", st.toString,
      "count", count.toString, "error", error): Unit

  override def tryAdmit(id: String): Long = withLock(id) {
    val live = readStatus(id).exists(s => s.state == JobState.Pending ||
      s.state == JobState.Started || s.state == JobState.Retry)
    if (live) -1L
    else {
      val next = c.cmdLong("INCR", metaKey(id))
      c.cmd("DEL", cancelKey(id))
      c.cmd("DEL", jobKey(id)) // clear a stale error field from the last run
      writeStatus(id, JobState.Pending, -1, "")
      next
    }
  }

  override def epoch(id: String): Long =
    Option(c.cmd("GET", metaKey(id))).map(_.toString.toLong).getOrElse(0L)

  override def set(id: String, st: JobState.Value, count: Long, error: String): Unit =
    withLock(id) { writeStatus(id, st, count, error) }

  override def setIfPresent(id: String, st: JobState.Value, count: Long, error: String): Unit =
    withLock(id) {
      if (c.cmdLong("EXISTS", jobKey(id)) == 1) writeStatus(id, st, count, error)
    }

  override def get(id: String): Option[JobStatus] = readStatus(id)

  override def remove(id: String): Unit = withLock(id) {
    c.cmd("SET", cancelKey(id), "1")
    c.cmd("DEL", jobKey(id)): Unit
  }

  override def rollback(id: String): Unit = withLock(id) {
    c.cmd("DEL", jobKey(id)): Unit
  }

  override def putGroup(groupId: String, jobIds: Seq[String]): Unit = {
    c.cmd("DEL", groupKey(groupId))
    if (jobIds.nonEmpty) c.cmd(("RPUSH" +: groupKey(groupId) +: jobIds): _*): Unit
  }

  override def groupJobIds(groupId: String): Option[Seq[String]] = {
    val ids = c.cmdSeq("LRANGE", groupKey(groupId), "0", "-1").map(_.toString)
    if (ids.isEmpty) None else Some(ids)
  }

  override def removeGroup(groupId: String): Unit =
    c.cmd("DEL", groupKey(groupId)): Unit

  /** Same reduction lattice + canceled-member exclusion as [[StatusStore]]. */
  override def groupStatus(groupId: String): Option[GroupStatus] =
    groupJobIds(groupId).map { ids =>
      val sts = ids.flatMap(get)
      val unaccounted = ids.exists(id =>
        c.cmdLong("EXISTS", jobKey(id)) == 0 &&
          c.cmdLong("EXISTS", cancelKey(id)) == 0)
      val state =
        if (sts.exists(_.state == JobState.Failure)) JobState.Failure
        else if (sts.nonEmpty && !unaccounted && sts.forall(_.state == JobState.Success)) JobState.Success
        else if (sts.exists(s => s.state == JobState.Started || s.state == JobState.Retry)) JobState.Started
        else JobState.Pending
      GroupStatus(groupId, state, sts)
    }

  override def snapshot: Map[String, JobStatus] = {
    val pat = s"${prefix}job:*"
    c.cmdSeq("KEYS", pat).map(_.toString).flatMap { k =>
      val id = k.stripPrefix(s"${prefix}job:")
      readStatus(id).map(id -> _)
    }.toMap
  }

  override def close(): Unit = c.close()
}

/** API-node [[JobBroker]] over Redis lists. */
final class RedisQueueBroker(host: String, port: Int, store: JobStateStore,
    prefix: String = "graft:") extends JobBroker {
  import RedisControlPlane._
  private val c = new RespClient(host, port)
  @volatile private var closed = false

  private def queueKey(q: String) = s"${prefix}queue:$q"

  override def submit(job: Job, task: Task): Boolean = {
    require(!closed, "broker stopped")
    val epoch = store.tryAdmit(job.id)
    if (epoch < 0) return false
    try {
      c.cmd("LPUSH", queueKey(job.queue), encodeJob(job, epoch, 1))
      true
    } catch {
      case e: Throwable =>
        store.rollback(job.id) // failed enqueue must not wedge the ID
        throw e
    }
  }

  /** Newest-first: LPUSH puts the newest at the head, LRANGE walks
    * head→tail — the reference's reversed pending listing for free. */
  override def pendingJobs(queue: String): Seq[String] =
    c.cmdSeq("LRANGE", queueKey(queue), "0", "-1")
      .flatMap(p => decodeJob(p.toString).map(_._1.id))

  override def cancel(jobId: String, purge: Boolean, backends: SourcePool): Unit = {
    store.get(jobId) match {
      case None => throw new NoSuchElementException(s"unknown job: $jobId")
      case Some(st) =>
        val completed = st.state == JobState.Success || st.state == JobState.Failure
        if (completed && !purge)
          throw new IllegalStateException("can't cancel a completed job without purge")
        store.remove(jobId) // workers' pre-run checks key off absence
        // drop unclaimed payloads: LREM the exact strings LRANGE returned
        // (payloads round-trip bytes-exactly; a claim racing this is
        // stopped by the store check instead)
        c.cmdSeq("KEYS", s"${prefix}queue:*").map(_.toString).foreach { qk =>
          c.cmdSeq("LRANGE", qk, "0", "-1").map(_.toString).foreach { p =>
            if (decodeJob(p).exists(_._1.id == jobId))
              c.cmd("LREM", qk, "0", p): Unit
          }
        }
        if (purge) ResultPurge.purge(backends, jobId)
    }
  }

  override def cancelGroup(groupId: String, purge: Boolean, backends: SourcePool): Unit = {
    val ids = store.groupJobIds(groupId)
      .getOrElse(throw new NoSuchElementException(s"unknown group: $groupId"))
    val statuses = ids.flatMap(store.get)
    val allDone = statuses.nonEmpty && statuses.forall(s =>
      s.state == JobState.Success || s.state == JobState.Failure)
    if (allDone && !purge)
      throw new IllegalStateException("can't cancel a completed group without purge")
    ids.foreach { id =>
      store.get(id).foreach { st =>
        val completed = st.state == JobState.Success || st.state == JobState.Failure
        if (completed && !purge) store.remove(id)
        else cancel(id, purge, backends)
      }
    }
    store.removeGroup(groupId)
  }

  override def awaitQuiescence(timeoutMs: Long = 120000): Boolean = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (System.currentTimeMillis < deadline) {
      val queued = c.cmdSeq("KEYS", s"${prefix}queue:*").map(_.toString)
        .exists(qk => c.cmdLong("LLEN", qk) > 0)
      val live = store.snapshot.values.exists(s => s.state == JobState.Pending ||
        s.state == JobState.Started || s.state == JobState.Retry)
      if (!queued && !live) return true
      Thread.sleep(25)
    }
    false
  }

  override def shutdown(): Unit = { closed = true; c.close() }
}

/** Worker-process side: claims payloads with an atomic
  * `LMOVE queue:<q> processing:<workerId> RIGHT LEFT` (exactly one worker
  * wins each, and a reply lost with the socket parks the payload in the
  * processing list instead of losing it — the Redis reliable-queue
  * pattern) and executes them through a local [[Scheduler]] with the full
  * retry/TTL/cancel machinery against the SHARED Redis state. A claim is
  * acked (LREM from the processing list) as soon as it is handed to the
  * scheduler; [[reapProcessing]] recovers everything else. Retryable
  * failures re-publish through the SHARED queue (LPUSH of the next
  * attempt), so any worker in the fleet claims the retry — the same
  * cross-worker hop the file plane proves. `queues = None` consumes every
  * `queue:*` key (the reference's worker consumes its configured queues).
  *
  * `workerId` must be UNIQUE per live worker and STABLE across restarts
  * of the same worker slot (the standard reliable-queue deployment
  * contract): unique because a reaper may only judge ITS OWN processing
  * list (another live worker's entries are in-flight, not orphans);
  * stable so a restarted worker inherits — and recovers — its
  * predecessor's parked claims. */
final class RedisQueueWorker(
    spark: org.apache.spark.sql.SparkSession,
    tasks: Map[String, Task],
    store: JobStateStore,
    host: String, port: Int,
    queues: Option[Seq[String]] = None,
    prefix: String = "graft:",
    pollMs: Long = 50,
    workerId: String = "w0") {
  import RedisControlPlane._
  private val c = new RespClient(host, port)
  private val scheduler = new Scheduler(spark, store)
  @volatile private var stopped = false

  scheduler.retryPublisher = (job, nextAttempt, epoch) => {
    if (stopped) false
    else {
      c.cmd("LPUSH", s"${prefix}queue:${job.queue}",
        encodeJob(job, epoch, nextAttempt))
      true
    }
  }

  private val loop = new Thread(() => {
    while (!stopped) {
      // Socket/protocol errors (broker restart, dropped connection) are
      // transient, same contract as the JDBC worker's SQLException catch —
      // a dead broker must not kill the daemon thread and silently stop
      // the worker claiming forever. Reconnect lazily and retry next tick.
      try pollOnce() catch {
        case _: InterruptedException => ()
        case _: java.io.IOException | _: IllegalStateException =>
          // reconnect() itself throws while the broker is still down —
          // swallow and retry next tick.
          try c.reconnect() catch { case _: Exception => () }
      }
      try Thread.sleep(pollMs) catch { case _: InterruptedException => () }
    }
  }, "graft-redis-queue-worker")
  loop.setDaemon(true)
  loop.start()

  private def queueKeys(): Seq[String] = queues match {
    case Some(qs) => qs.map(q => s"${prefix}queue:$q")
    case None => c.cmdSeq("KEYS", s"${prefix}queue:*").map(_.toString)
  }

  private val processingKey = s"${prefix}processing:$workerId"

  /** Payloads handed to the local scheduler whose ack (LREM) has not been
    * confirmed yet — the reaper's disambiguator between "hand-off done,
    * only the ack reply was lost" (just retry the ack) and "claim reply
    * was lost before hand-off" (re-queue). In-memory on purpose: after a
    * crash/restart the set is empty and every parked payload falls
    * through to the store-gated decision, which is the correct recovery
    * for a dead predecessor (its hand-offs died with its scheduler). */
  private val handedOff = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())

  /** The reliable-queue reaper: anything in this worker's processing list
    * at tick start is an orphan (the claim/ack cycle within a tick is
    * synchronous, so nothing of THIS tick's is mid-flight). Three cases:
    *
    *   - acked-but-ack-lost (in [[handedOff]]): retry the LREM;
    *   - claim-reply-lost with the SAME admission still live in the store
    *     (non-terminal state, matching epoch): atomically LMOVE the
    *     payload back to its queue's claim end — the payload the old RPOP
    *     spelling lost for good;
    *   - everything else (terminal, canceled, re-admitted under a newer
    *     epoch, torn): drop — a re-queue would double-run.
    *
    * Every step removes the head, so the LLEN-bounded loop terminates. */
  private def reapProcessing(): Unit = {
    var remaining = c.cmdLong("LLEN", processingKey)
    while (remaining > 0 && !stopped) {
      remaining -= 1
      val head = c.cmd("LINDEX", processingKey, "0")
      if (head == null) return
      val p = head.toString
      // retry the ack FIRST, un-mark only once it succeeded: removing the
      // mark before a confirmed LREM converts a still-down broker into a
      // later re-queue of a job that is already running (the mark is the
      // only thing distinguishing "ran, ack lost" from "never ran")
      if (handedOff.contains(p)) {
        c.cmd("LREM", processingKey, "1", p)
        handedOff.remove(p)
      }
      else decodeJob(p) match {
        case Some((job, epoch, _)) if
            store.get(job.id).exists(s => s.state == JobState.Pending ||
              s.state == JobState.Started || s.state == JobState.Retry) &&
            store.epoch(job.id) == epoch =>
          c.cmd("LMOVE", processingKey, s"${prefix}queue:${job.queue}",
            "LEFT", "RIGHT")
        case _ => c.cmd("LPOP", processingKey)
      }
    }
  }

  private def pollOnce(): Unit = {
    reapProcessing()
    queueKeys().foreach { qk =>
      var payload = c.cmd("LMOVE", qk, processingKey, "RIGHT", "LEFT")
      while (payload != null && !stopped) {
        val p = payload.toString
        decodeJob(p) match {
          case Some((job, epoch, attempt)) =>
            tasks.get(job.taskName) match {
              case Some(task) =>
                // mark AFTER a successful hand-off (nothing between the two
                // statements does I/O, so the mark can't be missed): if the
                // ack below dies with the socket, the reaper knows this
                // payload already runs; a hand-off that THROWS (scheduler
                // closing / pool rejection) leaves the payload parked and
                // UN-marked, so the reaper re-queues it through the store
                // gate instead of acking a job that never started
                scheduler.executeClaimed(job, task, epoch, attempt)
                handedOff.add(p)
              case None =>
                store.setIfPresent(job.id, JobState.Failure, -1,
                  s"worker has no task '${job.taskName}'")
            }
          case None => () // torn/foreign payload: drop (logged by store state)
        }
        c.cmd("LREM", processingKey, "1", p) // ack the claim
        handedOff.remove(p)
        payload =
          if (stopped) null
          else c.cmd("LMOVE", qk, processingKey, "RIGHT", "LEFT")
      }
    }
  }

  def awaitQuiescence(timeoutMs: Long = 120000): Boolean =
    scheduler.awaitQuiescence(timeoutMs)

  def stop(): Unit = {
    stopped = true
    loop.interrupt()
    scheduler.shutdown()
    c.close()
  }
}
