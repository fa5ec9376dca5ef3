package graft

/** SINGLE-MAINTENANCE-WRITER fence for the generation machineries
  * (IVF/SQ lists, graph gen roots, BM25 postings generations, the
  * dedup register): every staged-rewrite op derives its next version
  * from a directory LISTING, so two concurrent writers — two
  * compactions, or a compaction racing a valve-fired one from another
  * session — can derive the SAME next version from the same listing,
  * overwrite each other's staged files, and race the CURRENT flip
  * (last rename wins silently). Single-writer was always the
  * documented contract; this states it in code: before staging
  * version N the writer creates a per-version marker file with
  * CREATE_NEW — an atomic create-exclusive on any filesystem, a
  * conditional PUT (`If-None-Match: *`) on an object store — and the
  * LOSER of a same-version race fails LOUDLY here instead of flipping
  * over the winner.
  *
  * Liveness: the marker is per-version, never a global lock, so a
  * crashed writer cannot wedge the machinery — each machinery's
  * next-version derivation counts marker files alongside generation
  * directories ([[markerVersions]]), so a re-run simply versions PAST
  * a dead marker; markers at or below a committed version are swept
  * by the committing writer ([[sweep]]).
  *
  * The fence orders staging CLAIMS; it cannot by itself order
  * COMMITS: a writer that stalls mid-staging while a staggered newer
  * writer claims a higher version, commits, and sweeps could wake up
  * and flip the pointer BACK to its stale generation. That half is
  * closed at the commit sites — `IVF.flipCurrent` /
  * `GraphAnn.flipCurrent` refuse a flip whose version is not
  * strictly above the standing generation's, and `compactPostings`
  * re-checks the metastore location before its rename dance — so the
  * stale writer fails loudly at commit and its orphaned generation
  * is GC'd. (The register has no pointer: `compactRegister`'s
  * RETURNED path is the commit, threaded by a single caller — the
  * documented single-writer-per-register contract.) */
object WriterFence {

  /** THE claim protocol, shared by every machinery (IVF/SQ lists,
    * graph gen roots, postings generations, the register): derive
    * the next version as max(existing generation versions, standing
    * marker versions) + 1, then acquire the fence for it. One
    * implementation so a protocol change can never silently leave a
    * machinery unfenced. Returns the claimed version; the committer
    * calls [[sweep]](dir, prefix, v) after its ordered commit. */
  def claim(dir: java.io.File, prefix: String, existing: Seq[Int],
            what: String): Int = {
    val v = (existing ++ markerVersions(dir, prefix) :+ 1).max + 1
    acquire(new java.io.File(dir, prefix + v), what)
    v
  }

  /** Acquire the fence for version `marker` (a file path). Throws
    * IllegalStateException — loudly, before any bytes are staged —
    * when another writer already holds this version. */
  def acquire(marker: java.io.File, what: String): Unit = {
    try java.nio.file.Files.createFile(marker.toPath)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"$what: concurrent maintenance writer — ${marker.getName} " +
            "already exists under " + marker.getParent + "; another " +
            "writer is staging this generation (single-writer is the " +
            "maintenance contract). If that writer crashed, simply " +
            "re-run: the next attempt derives a fresh version past " +
            "this marker.")
    }
  }

  /** Versions claimed by marker files `<prefix><N>` directly under
    * `dir` — folded into each machinery's next-version derivation so
    * a dead marker burns one version number instead of wedging the
    * re-run. */
  def markerVersions(dir: java.io.File, prefix: String): Seq[Int] =
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.startsWith(prefix))
      .flatMap(f => scala.util.Try(
        f.getName.stripPrefix(prefix).toInt).toOption)

  /** Post-commit sweep: drop every marker `<prefix><N>` with
    * N <= `upTo` — our own released fence plus dead crashed writers
    * below us. A swept marker below a committed generation can never
    * enable a version collision (derivations see the committed
    * directory and go higher), and a STALLED live writer below us
    * loses nothing it wasn't already losing: the ordered-commit
    * guard at the flip rejects its stale generation loudly. */
  def sweep(dir: java.io.File, prefix: String, upTo: Int): Unit =
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.startsWith(prefix) &&
        scala.util.Try(f.getName.stripPrefix(prefix).toInt)
          .toOption.exists(_ <= upTo))
      .foreach(f => java.nio.file.Files.deleteIfExists(f.toPath))
}
