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

  /** Recursive copy (regular files + dirs; symlinks skipped — an index
    * tree never contains them, and following one would copy outside the
    * tree). Existing destination files are replaced. */
  def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isSymbolicLink(src)) return
    if (java.nio.file.Files.isDirectory(src)) {
      java.nio.file.Files.createDirectories(dst)
      val stream = java.nio.file.Files.list(src)
      try {
        val it = stream.iterator()
        while (it.hasNext) {
          val c = it.next()
          copyTree(c, dst.resolve(c.getFileName))
        }
      } finally stream.close() // one open dir handle per recursion level, not per entry
    } else {
      java.nio.file.Files.createDirectories(dst.getParent)
      java.nio.file.Files.copy(src, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    }
  }
}
