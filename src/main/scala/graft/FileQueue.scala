package graft

import java.io.File
import java.nio.file.{Files, Path, StandardCopyOption}
import java.time.LocalDateTime
import java.util.Properties
import scala.jdk.CollectionConverters._

/** Shared-directory job queue — the [[JobBroker]] half of the cross-process
  * control plane (the state half is [[FileJobStateStore]]).
  *
  * Reproduces the reference's API-node / worker-node split
  * (`cmd/main.go:73-75`, README's "workers across machines") without Redis:
  * an API process runs [[FileQueueBroker]] (admit → drop a claim file in
  * the queue directory), worker processes run [[FileQueueWorker]] (claim by
  * atomic rename — exactly-once per file — then execute through a local
  * [[Scheduler]] with the full retry/TTL/cancel machinery). Both sides
  * share a [[JobStateStore]] (e.g. [[FileJobStateStore]] over the same
  * root), so admission exclusivity, status, and cancellation are global:
  * a cancel issued on the API node deletes the store entry, and the
  * worker's pre-run checks (`runWithRetries`) observe it before starting.
  *
  * Honest limitation, documented: cancel-while-RUNNING cannot interrupt a
  * query executing in another process (no cross-process thread interrupt);
  * the running attempt completes or hits its TTL, and its final
  * `setIfPresent` is a no-op against the removed entry — state converges to
  * canceled, compute is not reclaimed. The reference has the same gap
  * unless the owning process consumes the cancel message itself.
  */
final class FileQueueBroker(queueRoot: File, store: JobStateStore) extends JobBroker {
  require(queueRoot.isDirectory || queueRoot.mkdirs(), s"cannot create $queueRoot")
  @volatile private var closed = false
  private val seq = new java.util.concurrent.atomic.AtomicLong()

  private def queueDir(queue: String): Path = {
    val p = queueRoot.toPath.resolve(FileQueue.safe(queue))
    Files.createDirectories(p)
    p
  }

  override def submit(job: Job, task: Task): Boolean = {
    require(!closed, "broker stopped")
    val epoch = store.tryAdmit(job.id)
    if (epoch < 0) return false
    try {
      // monotonic name: (millis, per-JVM seq, pid) orders the backlog and
      // never collides across submitting processes
      val name = f"${System.currentTimeMillis()}%013d_${seq.incrementAndGet()}%06d_" +
        s"${ProcessHandle.current().pid()}_${FileQueue.safe(job.id)}.props"
      FileQueue.writeJob(queueDir(job.queue).resolve(name), job, epoch)
      true
    } catch {
      case e: Throwable =>
        store.rollback(job.id) // failed enqueue must not wedge the ID
        throw e
    }
  }

  override def pendingJobs(queue: String): Seq[String] = {
    val stream = Files.list(queueDir(queue))
    // newest-first, like the reference's reversed pending listing
    try stream.iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".props"))
      .sortBy(_.getFileName.toString).reverse
      .flatMap(p => FileQueue.readJob(p).map(_._1.id))
    finally stream.close()
  }

  override def cancel(jobId: String, purge: Boolean, backends: SourcePool): Unit = {
    store.get(jobId) match {
      case None => throw new NoSuchElementException(s"unknown job: $jobId")
      case Some(st) =>
        val completed = st.state == JobState.Success || st.state == JobState.Failure
        if (completed && !purge)
          throw new IllegalStateException("can't cancel a completed job without purge")
        store.remove(jobId) // workers' pre-run checks key off absence
        // drop the unclaimed queue file, if any (claimed files are gone; a
        // claim racing this delete is stopped by the store check instead)
        val stream = Files.list(queueRoot.toPath)
        try stream.iterator().asScala.foreach { qd =>
          if (Files.isDirectory(qd)) {
            val files = Files.list(qd)
            try files.iterator().asScala.foreach { p =>
              if (p.getFileName.toString.endsWith(s"_${FileQueue.safe(jobId)}.props"))
                Files.deleteIfExists(p)
            } finally files.close()
          }
        } finally stream.close()
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

  /** Drained when no queue files remain unclaimed and no shared-store entry
    * is still live (workers may be mid-run in other processes). */
  override def awaitQuiescence(timeoutMs: Long = 120000): Boolean = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (System.currentTimeMillis < deadline) {
      val stream = Files.walk(queueRoot.toPath)
      val queued = try stream.iterator().asScala.exists(
        _.getFileName.toString.endsWith(".props")) finally stream.close()
      val live = store.snapshot.values.exists(s => s.state == JobState.Pending ||
        s.state == JobState.Started || s.state == JobState.Retry)
      if (!queued && !live) return true
      Thread.sleep(25)
    }
    false
  }

  override def shutdown(): Unit = closed = true
}

/** Worker-process side: claims queue files by atomic rename and executes
  * them through a local [[Scheduler]] (full retry/TTL/cancel machinery)
  * against the SHARED state store. `queues = None` consumes everything —
  * the reference's `--worker-only` with queue filters maps to `Some(...)`. */
final class FileQueueWorker(
    spark: org.apache.spark.sql.SparkSession,
    tasks: Map[String, Task],
    store: JobStateStore,
    queueRoot: File,
    queues: Option[Seq[String]] = None,
    pollMs: Long = 50) {

  private val scheduler = new Scheduler(spark, store)
  private val claimedDir = queueRoot.toPath.resolve("_claimed")
  Files.createDirectories(claimedDir)
  @volatile private var stopped = false
  private val retrySeq = new java.util.concurrent.atomic.AtomicLong()

  // Retryable failures re-publish through the SHARED queue directory (state
  // Retry is already stamped in the shared store by the scheduler): any
  // worker in the fleet — not just this one — claims the next attempt, so a
  // worker that is sick (full disk, bad mount, dying JVM) doesn't pin the
  // job's remaining retries to itself. The queue poll cadence is the
  // backoff. Publish failure → return false → the scheduler falls back to
  // retrying locally, so the attempt is never dropped either way.
  scheduler.retryPublisher = (job, nextAttempt, epoch) => {
    if (stopped) false
    else {
      val qd = queueRoot.toPath.resolve(FileQueue.safe(job.queue))
      Files.createDirectories(qd)
      val name = f"${System.currentTimeMillis()}%013d_${retrySeq.incrementAndGet()}%06d_" +
        s"${ProcessHandle.current().pid()}_${FileQueue.safe(job.id)}.props"
      FileQueue.writeJob(qd.resolve(name), job, epoch, nextAttempt)
      true
    }
  }

  // Crash recovery: claims are named <claimerPid>__<queueDir>__<file>, so a
  // starting worker can detect claims whose owner died between claim and
  // execution (a crash there strands the job as PENDING forever — the store
  // entry is live but nobody holds the file) and requeue them. Claims by
  // live processes are left alone.
  locally {
    val stream = Files.list(claimedDir)
    try stream.iterator().asScala.foreach { p =>
      p.getFileName.toString.split("__", 3) match {
        case Array(pid, qdir, rest) if pid.forall(_.isDigit) &&
            ProcessHandle.of(pid.toLong).isEmpty =>
          val back = queueRoot.toPath.resolve(qdir).resolve(rest)
          Files.createDirectories(back.getParent)
          try Files.move(p, back, StandardCopyOption.ATOMIC_MOVE)
          catch { case _: java.io.IOException => () } // another starter won
        case _ => ()
      }
    } finally stream.close()
  }

  private val loop = new Thread(() => {
    while (!stopped) {
      try pollOnce() catch { case _: InterruptedException => () }
      try Thread.sleep(pollMs) catch { case _: InterruptedException => () }
    }
  }, "graft-file-queue-worker")
  loop.setDaemon(true)
  loop.start()

  private def wantedQueue(dirName: String): Boolean =
    queues.forall(_.exists(q => FileQueue.safe(q) == dirName))

  private def pollOnce(): Unit = {
    val qs = Files.list(queueRoot.toPath)
    val dirs = try qs.iterator().asScala.toList.filter(p =>
      Files.isDirectory(p) && p.getFileName.toString != "_claimed" &&
        wantedQueue(p.getFileName.toString)) finally qs.close()
    dirs.foreach { qd =>
      val files = Files.list(qd)
      val batch = try files.iterator().asScala.toList
        .filter(_.getFileName.toString.endsWith(".props"))
        .sortBy(_.getFileName.toString) finally files.close()
      batch.foreach { p =>
        // claim = atomic rename; exactly one worker process wins a file.
        // Name carries (claimer pid, queue dir) for crash recovery above.
        val mine = claimedDir.resolve(
          s"${ProcessHandle.current().pid()}__${qd.getFileName}__${p.getFileName}")
        val won =
          try { Files.move(p, mine, StandardCopyOption.ATOMIC_MOVE); true }
          catch { case _: java.io.IOException => false }
        if (won) FileQueue.readJob(mine) match {
          case Some((job, epoch, attempt)) =>
            tasks.get(job.taskName) match {
              case Some(task) => scheduler.executeClaimed(job, task, epoch, attempt)
              case None => // this worker doesn't carry the task dir: refuse
                store.setIfPresent(job.id, JobState.Failure, -1,
                  s"worker has no task '${job.taskName}'")
            }
            Files.deleteIfExists(mine): Unit
          case None => () // torn/foreign file: leave in _claimed for autopsy
        }
      }
    }
  }

  def awaitQuiescence(timeoutMs: Long = 120000): Boolean =
    scheduler.awaitQuiescence(timeoutMs)

  def stop(): Unit = {
    stopped = true
    loop.interrupt()
    scheduler.shutdown()
  }
}

private[graft] object FileQueue {
  def safe(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(10)
    s.replaceAll("[^A-Za-z0-9_-]", "_").take(48) + "_" + md
  }

  def writeJob(p: Path, job: Job, epoch: Long, attempt: Int = 1): Unit = {
    val props = new Properties()
    props.setProperty("attempt", attempt.toString)
    props.setProperty("id", job.id)
    props.setProperty("task", job.taskName)
    props.setProperty("queue", job.queue)
    job.eta.foreach(e => props.setProperty("eta", e.toString))
    props.setProperty("retries", job.retries.toString)
    props.setProperty("ttlSec", job.ttlSec.toString)
    props.setProperty("nargs", job.args.size.toString)
    job.args.zipWithIndex.foreach { case (a, i) => props.setProperty(s"arg.$i", a) }
    job.db.foreach(props.setProperty("db", _))
    props.setProperty("epoch", epoch.toString)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    val out = Files.newOutputStream(tmp)
    try props.store(out, null) finally out.close()
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
  }

  /** (job, admission epoch, attempt) — attempt is 1 on first publish and
    * N+1 on a cross-worker retry re-publish, so the claiming worker resumes
    * the retry budget where the failing worker left off. */
  def readJob(p: Path): Option[(Job, Long, Int)] =
    if (!Files.exists(p)) None
    else try {
      val in = Files.newInputStream(p)
      val props = new Properties()
      try props.load(in) finally in.close()
      val args = (0 until props.getProperty("nargs", "0").toInt)
        .map(i => props.getProperty(s"arg.$i"))
      Some((Job(
        props.getProperty("id"),
        props.getProperty("task"),
        props.getProperty("queue"),
        Option(props.getProperty("eta")).map(LocalDateTime.parse),
        props.getProperty("retries", "0").toInt,
        props.getProperty("ttlSec", "60").toInt,
        args,
        Option(props.getProperty("db"))),
        props.getProperty("epoch", "0").toLong,
        props.getProperty("attempt", "1").toInt))
    } catch { case _: Exception => None }
}
