package graft.util

import java.io.File
import scala.collection.concurrent.TrieMap

/** Filesystem-fingerprint keys for per-corpus memoized artifacts (staged
  * lake temp dirs, trained codebooks, folded indexes, ANN ground truth).
  *
  * Keying a session-lifetime memo on the RAW sf-dir path goes stale the
  * moment a corpus is regenerated under the same path within one JVM
  * (r16/r17 ADVICE): the memo would keep serving artifacts derived from
  * the old files. The fingerprint — file count + total bytes + newest
  * mtime across the table's parquet footprint — invalidates on any
  * rewrite while costing only a directory listing, no Spark job. The
  * file COUNT closes the residual hole a (bytes, mtime) pair leaves for
  * a same-size rewrite inside one mtime granule that also reshapes the
  * file set; a same-size same-count rewrite within one granule remains
  * theoretically invisible, which is the documented limit of a
  * listing-only fingerprint (hashing contents would cost a full read).
  *
  * [[memo]] additionally EVICTS superseded entries for the same dir on a
  * miss (running their `onEvict`, e.g. temp-dir deletion), so repeated
  * regeneration within one session cannot accumulate orphaned staging
  * dirs or map entries (r17 ADVICE on `Vectors.corpusKey`).
  */
object Fingerprint {

  /** Cheap fingerprint of the given tables' parquet footprint under
    * `dir`: `dir#fileCount#totalBytes#newestMtime`.
    */
  def corpusKey(dir: String, tables: Seq[String]): String = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    val files = tables.flatMap(t => walk(new File(s"$dir/$t.parquet")))
    s"$dir#${files.size}#${files.map(_.length).sum}#${
      files.map(_.lastModified).foldLeft(0L)(math.max)}"
  }

  /** Best-effort recursive delete of an evicted staging dir (failures
    * ignored — eviction is hygiene, never correctness).
    */
  def deleteDir(path: String): Unit = {
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
      f.delete()
    }
    try rm(new File(path)) catch { case _: Exception => () }
  }

  /** Memo lookup keyed by corpus fingerprint + `suffix` (params frame —
    * must be empty or start with '#' so fingerprints can never prefix-
    * collide across suffixes). On a miss, first drops every entry of the
    * same `dir` whose fingerprint no longer matches (the regenerated-
    * corpus case), running `onEvict` on each removed value — pass
    * [[deleteDir]] for maps whose values are staging-dir paths.
    */
  def memo[V](map: TrieMap[String, V], dir: String, tables: Seq[String],
      suffix: String = "", onEvict: V => Unit = (_: V) => ())(
      build: => V): V = {
    require(suffix.isEmpty || suffix.startsWith("#"),
      s"memo suffix must be empty or start with '#': $suffix")
    val fp = corpusKey(dir, tables)
    val key = fp + suffix
    map.get(key) match {
      case Some(v) => v
      case None =>
        // freshness = the key IS this fingerprint (modulo its '#'-framed
        // suffix) — a bare startsWith(fp) would keep a STALE entry whose
        // numeric tail textually extends the current one (mtime 1234 vs
        // 123): the trailing fingerprint fields are not '#'-terminated,
        // so prefix collisions across fingerprints are possible even
        // though suffixes are '#'-framed
        for ((k, v) <- map if k.startsWith(dir + "#") &&
            !(k == fp || k.startsWith(fp + "#")))
          if (map.remove(k, v)) onEvict(v)
        map.getOrElseUpdate(key, build)
    }
  }
}
