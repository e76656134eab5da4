package graft

import java.io.File

/** Small filesystem helpers shared across the job layer. */
object FsUtil {
  def deleteRecursive(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursive))
    f.delete(): Unit
  }
}
