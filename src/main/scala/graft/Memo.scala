package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-lifetime memo for small materialized frames that several
  * declared queries share (the q40 metrics table, BM25 corpus stats).
  *
  * Keys carry a cheap content fingerprint of the data directory (file
  * path + size + mtime over the tree) rather than the raw path alone:
  * rewriting the data under `dir` within a live session produces a
  * NEW key instead of serving stale rows, and the superseded entry is
  * dropped from the map so its checkpoint blocks become eligible for
  * Spark's ContextCleaner once unreferenced — the two failure modes
  * of the previous path-keyed TrieMap (round-4 advisory).
  */
object Memo {

  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String, String), DataFrame]

  /** The one invalidation rule, shared by every memo map: evict
    * same-(session, dir, tag) entries whose fingerprint changed, then
    * get-or-build under the current fingerprint. */
  private def memoIn[V](map: scala.collection.concurrent.TrieMap[(SparkSession, String, String, String), V])
                       (s: SparkSession, dir: String, tag: String)(build: => V): V = {
    val fp = dirFingerprint(dir)
    map.keys
      .filter(k => k._1 == s && k._2 == dir && k._3 == tag && k._4 != fp)
      .foreach(map.remove)
    map.getOrElseUpdate((s, dir, tag, fp), build)
  }

  /** Fingerprint of every file under `dir` (path, length, mtime).
    * Driver-side directory walk — cheap for the handful of parquet
    * files per scale-factor dir; at real scale the equivalent signal
    * is the table snapshot/transaction id.
    *
    * The recursive walk runs dozens of times per bench run (every
    * memo access), so its result is cached behind a SHALLOW signature
    * of the root (root mtime + direct children name/len/mtime): any
    * add/remove/rewrite of a table under a data dir changes a direct
    * child's entry (parquet overwrites create new part files, so even
    * directory-shaped tables bump their own mtime), invalidating the
    * cache and forcing a fresh deep walk. The signature descends TWO
    * levels (root entries + each subdirectory's entries) so that
    * directory-shaped tables (part files under events.parquet, or
    * under a partitioned index's cid= dirs) invalidate on part-file
    * append/delete —
    * any file write creates or deletes an entry whose parent dir sits
    * within those two levels for every table layout the engine
    * writes. The remaining blind spot — an in-place byte rewrite of a
    * depth-≥3 file that bumps no tracked mtime — does not occur for
    * parquet/CSV layouts, where writers always create/delete part
    * files. */
  private val fpCache = scala.collection.concurrent.TrieMap
    .empty[String, (String, String)] // dir -> (shallowSig, deepFp)

  private def shallowSig(root: java.io.File): String = {
    def entry(f: java.io.File) = s"${f.getName}:${f.length}:${f.lastModified}"
    val kids = Option(root.listFiles()).toSeq.flatten.sortBy(_.getName)
    (s"${root.lastModified}" +: kids.flatMap { f =>
      entry(f) +: (if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).map(entry)
      else Nil)
    }).mkString("|")
  }

  private[graft] def dirFingerprint(dir: String): String = {
    val root = new java.io.File(dir)
    val sig = shallowSig(root)
    fpCache.get(dir) match {
      case Some((`sig`, fp)) => fp
      case _ =>
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
          else Seq(f)
        val fp = walk(root)
          .map(f => s"${f.getPath}:${f.length}:${f.lastModified}")
          .mkString("|").hashCode.toString
        fpCache.put(dir, (sig, fp))
        fp
    }
  }

  /** Memoize `build` per (session, dir-content, tag), materialized
    * with localCheckpoint so consumers re-read executor-resident rows
    * instead of re-running the plan. */
  def cached(s: SparkSession, dir: String, tag: String)
            (build: => DataFrame): DataFrame =
    memoIn(cache)(s, dir, tag)(build.localCheckpoint())

  private val values = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String, String), Any]

  /** Memoize an arbitrary driver-side artifact descriptor (e.g. the
    * catalog names of tables a query wrote) per (session,
    * dir-content, tag) — same invalidation rule as [[cached]]. */
  def cachedValue[T](s: SparkSession, dir: String, tag: String)
                    (build: => T): T =
    memoIn(values)(s, dir, tag)(build).asInstanceOf[T]

  private val scalars = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String, String), Long]

  /** Memoize a driver-side scalar per (session, dir-content, tag) —
    * e.g. a corpus count that parameterizes a plan (q33's adaptive
    * LSH bits), so repeated query construction doesn't re-run the
    * counting job. */
  def cachedCount(s: SparkSession, dir: String, tag: String)
                 (build: => Long): Long =
    memoIn(scalars)(s, dir, tag)(build)
}
