package graft

import java.io.File
import java.util.concurrent.{Executors, TimeUnit}

/** Result-TTL sweeper: deletes `results_<jobID>` directories older than a
  * retention period.
  *
  * The reference configures result expiry but its SQL result backend never
  * enforces it (README: "TTL ... unsupported by SQL result backend"; the
  * expiry settings only apply to the Redis state, `config.toml.sample`
  * `[job_queue.state] expiry`). The port closes that gap the way the SURVEY
  * (§4) prescribes: a background sweep over the backend directories keyed on
  * the parquet commit mtime. Results-cache semantics are preserved — a
  * re-run of the same job ID rewrites the directory and refreshes its mtime.
  */
final class ResultSweeper(backends: SourcePool, retentionSec: Long) {
  private val pool = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-result-sweeper"); t.setDaemon(true); t
  })

  /** One sweep pass; returns the deleted result directory names. */
  def sweepOnce(nowMs: Long = System.currentTimeMillis): Seq[String] =
    backends.sources.values.toSeq.flatMap { dir =>
      val root = new File(dir)
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("results_"))
        .filter(f => nowMs - f.lastModified() > retentionSec * 1000)
        .map { f => deleteRecursive(f); f.getName }
    }.sorted

  def start(periodSec: Long = 60): Unit =
    pool.scheduleAtFixedRate(() => { sweepOnce(): Unit }, periodSec, periodSec, TimeUnit.SECONDS): Unit

  def stop(): Unit = pool.shutdown()

  private def deleteRecursive(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursive))
    f.delete(): Unit
  }
}
