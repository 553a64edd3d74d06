package graft.util

/** Small filesystem helpers shared by Bench/SparkEntry/CLI scratch dirs. */
object Fs {
  /** Recursive delete; tolerates unreadable dirs (listFiles == null).
    * Symlinks are unlinked, NEVER followed (recursing through a link would
    * delete the target's contents outside the tree). */
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath)) {
      val children = f.listFiles()
      if (children != null) children.foreach(rmTree)
    }
    f.delete(): Unit
  }

  def rmTree(path: String): Unit = rmTree(new java.io.File(path))
}
