package graft

/** Shared recursive file-tree helpers for driver-side index
  * maintenance (generation GC, index clones, staging resets) — one
  * implementation instead of per-module copies that drift. */
private[graft] object FileTree {

  /** Recursive delete; missing paths are a no-op. */
  def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(delete)
    f.delete(); ()
  }

  /** Recursive copy, replacing existing files; creates directories
    * as needed. */
  def copy(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs()
      Option(src.listFiles()).toSeq.flatten
        .foreach(c => copy(c, new java.io.File(dst, c.getName)))
    } else {
      java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }
}
