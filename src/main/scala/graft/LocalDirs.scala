package graft

/** Local-mode scratch placement. Spark's shuffle/spill files default to
  * `/tmp`, which on this class of box is a virtio DISK: a wide exchange
  * (e.g. the 74 M-row link-prediction repartition, ~700 MB of shuffle
  * files) then rides the page-cache writeback, and an ill-timed flush
  * stalls a whole stage for tens of seconds — the bench showed 5 s → 36 s
  * swings on an otherwise idle machine. A RAM-backed tmpfs (`/dev/shm`)
  * removes the disk from the path entirely, which is exactly what a real
  * cluster's local NVMe scratch does for executors; shuffle files are
  * transient per-app state, deleted on exit, and bounded here by the
  * largest single exchange (~2 GB at sf0.1) on a 128 GiB box.
  *
  * Only mains (Bench/Verify/tools) opt in; library callers keep whatever
  * `spark.local.dir` their environment configures.
  */
object LocalDirs {
  /** Preferred `spark.local.dir` for local-mode runs: a per-user dir on
    * /dev/shm when it exists, is writable, and has headroom; else the
    * Spark default (`/tmp`). */
  def shuffleDir(): String = {
    val shm = new java.io.File("/dev/shm")
    val headroomBytes = 8L << 30 // stay away from a nearly-full tmpfs
    if (shm.isDirectory && shm.canWrite && shm.getUsableSpace > headroomBytes) {
      val d = new java.io.File(shm, "graft-" + sys.props.getOrElse("user.name", "spark"))
      d.mkdirs()
      d.getPath
    } else System.getProperty("java.io.tmpdir", "/tmp")
  }
}
