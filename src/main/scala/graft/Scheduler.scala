package graft

import java.time.{Duration, LocalDateTime}
import java.util.concurrent._
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession

/** In-process job queue + workers — the port of the reference's
  * tasqueue/Redis broker usage (`internal/core/core.go:406-447` worker
  * registration, `core.go:68-78` worker loop) onto plain JVM executors and
  * Spark's own scheduler.
  *
  * Semantics preserved:
  *   - one worker pool per queue; a queue's concurrency is fixed by the
  *     first task that names it (the reference documents exactly this in
  *     sql/test.sql comments);
  *   - ETA = delayed start (`core.go:359-367`);
  *   - retries = N re-runs with state RETRY between attempts
  *     (`core.go:389-394`);
  *   - TTL = max runtime; enforced by a scheduled `cancelJobGroup`
  *     (`core.go:354-357`);
  *   - pending listing returns the backlog newest-first (`core.go:156-159`);
  *   - cancel refuses completed jobs unless purge, kills the in-flight query,
  *     and deletes from the store (`core.go:244-271`).
  */
final class Scheduler(spark: SparkSession, store: JobStateStore) extends JobBroker {
  private val pools = new ConcurrentHashMap[String, ThreadPoolExecutor]()
  private val pending = new ConcurrentHashMap[String, ConcurrentLinkedDeque[String]]()
  private val running = new ConcurrentHashMap[String, Thread]()
  // per-task concurrency limit (tasqueue registers task.Conc workers per
  // task, core.go:437-440); fixed at first sight like queue concurrency
  private val taskSlots = new ConcurrentHashMap[String, java.util.concurrent.Semaphore]()
  private val timers = Executors.newScheduledThreadPool(2, daemonFactory("graft-timer"))
  @volatile private var closed = false

  /** Cross-process retry hop (set by a queue worker, e.g.
    * [[FileQueueWorker]]): when non-null, a retryable failure re-publishes
    * the job THROUGH THE BROKER (`(job, nextAttempt) => published`) instead
    * of re-running on this process's timers — so the retry is visible in
    * the shared queue and ANY worker in the fleet can claim the next
    * attempt (the reference gets this from tasqueue re-enqueueing through
    * Redis, core.go:389-394). The queue's poll cadence plays the role of
    * the local backoff. Returning false (broker closed, disk error) falls
    * back to the local timer path so the attempt is never lost. The
    * attempt's admission epoch rides along so a cancel+resubmit during the
    * failure window can't be resurrected under a newer epoch (and the
    * claim side re-checks the epoch against the shared store anyway). */
  @volatile private[graft] var retryPublisher: (Job, Int, Long) => Boolean = null

  private def daemonFactory(prefix: String): ThreadFactory = new ThreadFactory {
    private val n = new java.util.concurrent.atomic.AtomicInteger
    def newThread(r: Runnable): Thread = {
      val t = new Thread(r, s"$prefix-${n.incrementAndGet()}")
      t.setDaemon(true); t
    }
  }

  /** Queue pool; size pinned at first sight of the queue. */
  private def pool(queue: String, conc: Int): ThreadPoolExecutor =
    pools.computeIfAbsent(queue, _ => new ThreadPoolExecutor(
      conc, conc, 60L, TimeUnit.SECONDS, new LinkedBlockingQueue[Runnable](),
      daemonFactory(s"graft-q-$queue")))

  private def backlog(queue: String): ConcurrentLinkedDeque[String] =
    pending.computeIfAbsent(queue, _ => new ConcurrentLinkedDeque[String]())

  /** Enqueue a validated job (NewJob, core.go:86-105). Returns false if the
    * same ID is already queued/running (core.go:332-339). */
  def submit(job: Job, task: Task): Boolean = {
    require(!closed, "scheduler stopped")
    val myEpoch = store.tryAdmit(job.id)
    if (myEpoch < 0) return false
    try {
      backlog(job.queue).addLast(job.id)
      val delayMs = job.eta
        .map(e => Duration.between(LocalDateTime.now, e).toMillis.max(0L))
        .getOrElse(0L)
      val runnable: Runnable = () => runWithRetries(job, task, 1, myEpoch)
      if (delayMs > 0)
        timers.schedule(
          (() => poolExecuteOrFail(job, task, myEpoch, runnable)): Runnable,
          delayMs, TimeUnit.MILLISECONDS)
      else pool(job.queue, task.conc).execute(runnable)
      true
    } catch {
      case e: Throwable =>
        // failed enqueue must not leave a Pending admission that would block
        // this job ID forever (core.go's enqueue failures surface the same way);
        // rollback ≠ cancel: the ID stays unaccounted so a group holding it
        // reads PENDING rather than skipping the member
        backlog(job.queue).remove(job.id)
        store.rollback(job.id)
        throw e
    }
  }

  /** Execute through the queue pool from a timer thread; after shutdown()
    * the pool rejects, and a ScheduledThreadPoolExecutor would swallow the
    * RejectedExecutionException — mark the job failed instead of leaving it
    * parked in PENDING/RETRY forever. Epoch-gated like every other async
    * continuation: a stale timer must not stamp FAILURE onto a newer
    * admission of the same ID. */
  private def poolExecuteOrFail(job: Job, task: Task, myEpoch: Long, r: Runnable): Unit =
    try pool(job.queue, task.conc).execute(r)
    catch {
      case _: java.util.concurrent.RejectedExecutionException =>
        if (store.epoch(job.id) == myEpoch)
          store.setIfPresent(job.id, JobState.Failure, -1,
            "re-enqueue rejected: scheduler stopped")
    }

  private def runWithRetries(job: Job, task: Task, attempt: Int, myEpoch: Long): Unit = {
    // stale-first: a canceled-then-resubmitted ID enqueues a NEW runnable;
    // this old one must return before touching anything — including the
    // backlog, where job.id now denotes the new admission's pending entry
    if (store.epoch(job.id) != myEpoch) return
    backlog(job.queue).remove(job.id)
    // canceled-while-pending guard (execJob's not-canceled check,
    // core.go:452-454): cancellation removes the ID from the store.
    if (store.get(job.id).isEmpty) return
    val slot = taskSlots.computeIfAbsent(task.name,
      _ => new java.util.concurrent.Semaphore(math.max(task.conc, 1), true))
    try slot.acquire()
    catch { case _: InterruptedException => Thread.interrupted(); return }
    try runAttempt(job, task, attempt, myEpoch) finally slot.release()
  }

  /** One attempt; a retryable failure RE-ENQUEUES through the pool after a
    * capped delay (the reference re-enqueues through its broker) instead of
    * sleeping on the worker — the thread and the per-task slot free up so a
    * retrying job never head-of-line blocks its queue. */
  private def runAttempt(job: Job, task: Task, attempt: Int, myEpoch: Long): Unit = {
    if (store.get(job.id).isEmpty) { // canceled while waiting for slot/retry
      spark.sparkContext.cancelJobGroup(job.id)
      return
    }
    // a non-empty store entry may belong to a NEWER admission of the same ID
    // (cancel + resubmit while this attempt waited on the slot or the retry
    // backoff): a stale attempt must not touch the fresh job's state/results
    if (store.epoch(job.id) != myEpoch) return
    val worker = Thread.currentThread()
    running.put(job.id, worker)
    try {
      store.setIfPresent(job.id, JobState.Started)
      // TTL watchdog (core.go:354-357): cancel the job group AND interrupt
      // the worker — a job stalled driver-side (e.g. a hung JDBC schema
      // probe) has no tagged stages for cancelJobGroup to kill. The
      // attemptLive flag keeps a late-firing timer from interrupting
      // whatever the thread runs next.
      val attemptLive = new java.util.concurrent.atomic.AtomicBoolean(true)
      val ttlTimer = timers.schedule((() => {
        spark.sparkContext.cancelJobGroup(job.id)
        if (attemptLive.get()) worker.interrupt()
      }): Runnable, job.ttlSec.toLong, TimeUnit.SECONDS)
      try {
        val res = graft.Executor.run(spark, job, task)
        attemptLive.set(false); ttlTimer.cancel(false)
        // conditional update: a concurrent cancel removed the entry and
        // must not be resurrected as SUCCESS
        store.setIfPresent(job.id, JobState.Success, res.count)
      } catch {
        case e: Throwable =>
          attemptLive.set(false); ttlTimer.cancel(false)
          if (store.get(job.id).isEmpty) {
            // canceled: kill any stages that slipped in after the canceler's
            // cancelJobGroup (e.g. cancel landed during planning), then stop.
            Thread.interrupted() // clear the canceler's interrupt
            spark.sparkContext.cancelJobGroup(job.id)
          }
          else if (attempt <= job.retries) {
            store.setIfPresent(job.id, JobState.Retry)
            val rp = retryPublisher
            val published =
              try rp != null && rp(job, attempt + 1, myEpoch)
              catch { case _: Exception => false }
            if (!published) {
              val delay = math.min(250L * attempt, 2000L) // capped backoff
              // the admission generation rides along from submit(): if the job
              // is canceled and the same ID re-submitted as a NEW job during
              // the backoff, the stale timer must not resurrect the old one
              // (runAttempt re-checks the epoch after winning the slot too)
              timers.schedule(
                (() => poolExecuteOrFail(job, task, myEpoch, (() => {
                  if (store.epoch(job.id) == myEpoch) runWithRetries(job, task, attempt + 1, myEpoch)
                }): Runnable)): Runnable,
                delay, TimeUnit.MILLISECONDS)
            }
          }
          else store.setIfPresent(job.id, JobState.Failure, -1, safeMsg(e))
      } finally Thread.interrupted() // drop any stray TTL interrupt
    } finally running.remove(job.id)
  }

  private def safeMsg(e: Throwable): String =
    Option(e.getMessage).getOrElse(e.getClass.getSimpleName).linesIterator.take(3).mkString(" ")

  /** Pending backlog for a queue, newest-first (core.go:150-162). */
  def pendingJobs(queue: String): Seq[String] =
    Option(pending.get(queue)).map(_.iterator().asScala.toSeq.reverse).getOrElse(Nil)

  /** CancelJob (core.go:244-271). */
  def cancel(jobId: String, purge: Boolean, backends: SourcePool): Unit = {
    store.get(jobId) match {
      case None => throw new NoSuchElementException(s"unknown job: $jobId")
      case Some(st) =>
        val completed = st.state == JobState.Success || st.state == JobState.Failure
        if (completed && !purge)
          throw new IllegalStateException("can't cancel a completed job without purge")
        store.remove(jobId) // before interrupt: the worker's catch keys off absence
        // drop the pending-backlog entry too: the job's runnable no longer
        // touches the backlog once its admission is stale, so cancel owns
        // the removal (otherwise a cancel + resubmit leaves a ghost entry)
        pending.values().asScala.foreach(_.remove(jobId))
        spark.sparkContext.cancelJobGroup(jobId)
        // the in-flight query may still be in planning (no Spark jobs tagged
        // yet) — interrupt the worker thread so the driver-side wait aborts;
        // the worker then re-fires cancelJobGroup for late-submitted stages.
        Option(running.get(jobId)).foreach(_.interrupt())
        if (purge) ResultPurge.purge(backends, jobId)
    }
  }

  /** CancelJobGroup (core.go:274-322): per-member cancel with the
    * *group-level* completed guard only — a mixed group (some members done,
    * some running) cancels the running members and removes the finished
    * ones, like the reference's per-member delete loop. */
  def cancelGroup(groupId: String, purge: Boolean, backends: SourcePool): Unit = {
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
        if (completed && !purge) store.remove(id) // done: just drop from store
        else cancel(id, purge, backends)
      }
    }
    store.removeGroup(groupId)
  }

  /** Block until all queues drain (test/CLI helper; the reference's worker
    * loop blocks forever instead, core.go:68-78). */
  def awaitQuiescence(timeoutMs: Long = 120000): Boolean = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (System.currentTimeMillis < deadline) {
      val busy = pools.values().asScala.exists(p => p.getActiveCount > 0 || !p.getQueue.isEmpty) ||
        pending.values().asScala.exists(!_.isEmpty) ||
        store.snapshot.values.exists(s => s.state == JobState.Pending ||
          s.state == JobState.Started || s.state == JobState.Retry)
      if (!busy) return true
      Thread.sleep(25)
    }
    false
  }

  /** Execute a job ALREADY ADMITTED by another process (a queue worker's
    * entry point — see [[FileQueueWorker]]): skips the admission gate, runs
    * through this process's queue pools with the full retry/TTL/cancel
    * machinery. The epoch is the remote admission's; every staleness and
    * cancellation check inside `runWithRetries` reads the SHARED store, so
    * a cancel issued by any process stops the claimed job before it starts
    * (and stops its retries after). ETA honored like submit(). */
  private[graft] def executeClaimed(job: Job, task: Task, epoch: Long,
      attempt: Int = 1): Unit = {
    require(!closed, "scheduler stopped")
    backlog(job.queue).addLast(job.id)
    val delayMs = job.eta
      .map(e => Duration.between(LocalDateTime.now, e).toMillis.max(0L))
      .getOrElse(0L)
    val runnable: Runnable = () => runWithRetries(job, task, attempt, epoch)
    if (delayMs > 0)
      timers.schedule(
        (() => poolExecuteOrFail(job, task, epoch, runnable)): Runnable,
        delayMs, TimeUnit.MILLISECONDS)
    else pool(job.queue, task.conc).execute(runnable)
  }

  def shutdown(): Unit = {
    closed = true
    pools.values().asScala.foreach(_.shutdown())
    timers.shutdown()
  }
}

/** Result purge shared by the in-process broker and the file-queue broker:
  * DROP the external `results_<id>` table (dialect-quoted, sqldb.go:298) or
  * delete the result parquet directory, across every backend. */
object ResultPurge {
  def purge(backends: SourcePool, jobId: String): Unit =
    backends.sources.values.foreach {
      case url if url.startsWith("jdbc:") =>
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.createStatement().execute(
            s"DROP TABLE ${graft.Executor.quotedResultTable(url, jobId)}")
          ResultClock.forget(url, graft.Executor.resultTable(jobId))
        } catch { case _: Exception => () } finally conn.close()
      case dir =>
        FsUtil.deleteRecursive(new java.io.File(graft.Executor.resultDir(dir, jobId)))
    }
}
