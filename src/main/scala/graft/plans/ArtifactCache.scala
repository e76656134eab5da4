package graft.plans

import java.io.File
import java.security.MessageDigest

/** Content-addressed cache for derived physical artifacts (bucketed table
  * layouts, ANN index directories).
  *
  * Operators like the bucketed join and the persistent IVF index are
  * pay-once-build, query-many structures: at 100 TB the build is a scheduled
  * pipeline stage, not part of the query. Locally the same contract is kept
  * by keying the artifact directory on a fingerprint of the source files
  * (path + length + mtime): the first query builds, subsequent queries — in
  * any JVM — reuse, and any change to the source data changes the
  * fingerprint and forces a rebuild. A `_GRAFT_BUILT` marker written after
  * the build commits guards against reusing a partial build.
  */
object ArtifactCache {

  private def root: File = {
    val r = new File(sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-artifacts")
    r.mkdirs()
    r
  }

  /** Stable fingerprint of a set of source tables under `sfDir`. */
  def fingerprint(sfDir: String, tables: Seq[String]): String = {
    val md = MessageDigest.getInstance("MD5")
    def feed(f: File): Unit = {
      md.update(f.getPath.getBytes("UTF-8"))
      md.update(java.nio.ByteBuffer.allocate(16).putLong(f.length).putLong(f.lastModified).array())
      if (f.isDirectory) Option(f.listFiles()).foreach(_.sortBy(_.getName).foreach(feed))
    }
    md.update(new File(sfDir).getCanonicalPath.getBytes("UTF-8"))
    tables.sorted.foreach(t => feed(new File(sfDir, s"$t.parquet")))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** Return the artifact directory for (kind, sources), building it via
    * `build(dir)` exactly once per fingerprint. Concurrent builders in one
    * JVM serialize on the intern'd path; a crashed build leaves no marker
    * and is redone. */
  def getOrBuild(kind: String, sfDir: String, tables: Seq[String])(build: String => Unit): String = {
    val dir = new File(root, s"${kind}_${fingerprint(sfDir, tables)}")
    val marker = new File(dir, "_GRAFT_BUILT")
    dir.getPath.intern.synchronized {
      if (!marker.exists()) {
        deleteRecursive(dir) // stale partial build, if any
        dir.mkdirs()
        build(dir.getPath)
        marker.createNewFile()
      }
    }
    dir.getPath
  }

  private def deleteRecursive(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursive))
    f.delete(): Unit
  }
}
