package graft.util

/** Small filesystem helpers shared by Bench/SparkEntry/CLI scratch dirs. */
object Fs {
  /** Recursive delete; tolerates unreadable dirs (listFiles == null). */
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(rmTree)
    }
    f.delete(): Unit
  }

  def rmTree(path: String): Unit = rmTree(new java.io.File(path))
}
