package graft

import java.io.File
import java.sql.DriverManager
import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
import scala.util.control.NonFatal

/** Result-TTL sweeper: deletes `results_<jobID>` directories (filesystem
  * backends) and drops `results_%` tables (jdbc: backends) older than a
  * retention period.
  *
  * The reference configures result expiry but its SQL result backend never
  * enforces it (README: "TTL ... unsupported by SQL result backend"; the
  * expiry settings only apply to the Redis state, `config.toml.sample`
  * `[job_queue.state] expiry`). The port closes that gap the way the SURVEY
  * (§4) prescribes: a background sweep over the backend directories keyed on
  * the parquet commit mtime. Results-cache semantics are preserved — a
  * re-run of the same job ID rewrites the directory and refreshes its mtime.
  *
  * JDBC backends expose no portable table-creation time, so the sweeper
  * stamps each `results_%` table when it first observes it and drops it once
  * the stamp ages past retention. After a process restart the clock starts
  * over (conservative: a table is never dropped sooner than retention after
  * first observation).
  */
final class ResultSweeper(backends: SourcePool, retentionSec: Long) {
  private val pool = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-result-sweeper"); t.setDaemon(true); t
  })
  // (backend URL, table name) → first-seen millis
  private val jdbcSeen = new ConcurrentHashMap[(String, String), java.lang.Long]()

  /** One sweep pass; returns the deleted result directory/table names. */
  def sweepOnce(nowMs: Long = System.currentTimeMillis): Seq[String] =
    backends.sources.values.toSeq.flatMap { dir =>
      if (dir.startsWith("jdbc:")) sweepJdbc(dir, nowMs)
      else {
        val root = new File(dir)
        Option(root.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith("results_"))
          .filter(f => nowMs - f.lastModified() > retentionSec * 1000)
          .map { f => deleteRecursive(f); f.getName }
          .toSeq
      }
    }.sorted

  private def sweepJdbc(url: String, nowMs: Long): Seq[String] = {
    val quote = if (url.startsWith("jdbc:mysql:")) "`" else "\""
    try {
      val conn = DriverManager.getConnection(url)
      try {
        val rs = conn.getMetaData.getTables(null, null, "results_%", Array("TABLE"))
        val present = Iterator.continually(rs).takeWhile(_.next()).map(_.getString("TABLE_NAME")).toVector
        // stamp new tables at now; forget vanished ones (purged via the API)
        // so a later same-ID job starts a fresh retention clock
        val live = present.map { t =>
          (jdbcSeen.computeIfAbsent((url, t), _ => nowMs): Long, t)
        }
        jdbcSeen.keySet.removeIf(k => k._1 == url && !present.contains(k._2))
        live.collect { case (seen, t) if nowMs - seen > retentionSec * 1000 =>
          conn.createStatement().execute(s"DROP TABLE $quote$t$quote")
          jdbcSeen.remove((url, t))
          t
        }
      } finally conn.close()
    } catch { case NonFatal(_) => Nil } // backend down: retry next sweep
  }

  def start(periodSec: Long = 60): Unit =
    pool.scheduleAtFixedRate(() => { sweepOnce(): Unit }, periodSec, periodSec, TimeUnit.SECONDS): Unit

  def stop(): Unit = pool.shutdown()

  private def deleteRecursive(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursive))
    f.delete(): Unit
  }
}
