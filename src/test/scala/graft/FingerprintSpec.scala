package graft

import graft.util.Fingerprint
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.concurrent.TrieMap

/** The shared corpus-fingerprint memo discipline (r18: every staged-dir /
  * trained-artifact memo keys through this): regeneration under the SAME
  * path invalidates, superseded entries are evicted (their staging dirs
  * deleted), and suffixed param-variants of one corpus coexist.
  */
class FingerprintSpec extends AnyFunSuite {

  private def writeCorpus(dir: String, content: String): Unit = {
    val t = java.nio.file.Paths.get(dir, "documents.parquet")
    java.nio.file.Files.createDirectories(t)
    java.nio.file.Files.write(t.resolve("part-00000"),
      content.getBytes("UTF-8"))
  }

  test("memo rebuilds on corpus regeneration and evicts the superseded " +
      "entry instead of accumulating") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fp").toString
    writeCorpus(dir, "v1 corpus")
    val map = TrieMap.empty[String, String]
    var builds = 0
    val evicted = scala.collection.mutable.Buffer.empty[String]
    def get(): String =
      Fingerprint.memo(map, dir, Seq("documents"), "",
        (v: String) => evicted += v) { builds += 1; s"artifact$builds" }
    assert(get() == "artifact1")
    assert(get() == "artifact1", "unchanged corpus must serve the memo")
    assert(builds == 1 && map.size == 1)
    // regenerate under the SAME path (different byte size → the file-
    // count/bytes/mtime fingerprint changes even within one mtime granule)
    writeCorpus(dir, "v2 corpus — regenerated, deliberately longer")
    assert(get() == "artifact2", "regeneration must invalidate the memo")
    assert(builds == 2)
    assert(map.size == 1, "superseded entry must be evicted")
    assert(evicted.toSeq == Seq("artifact1"))
    // suffixed param-variants of the same corpus coexist: neither miss
    // evicts the other while the fingerprint matches
    var altBuilds = 0
    def getAlt(): String =
      Fingerprint.memo(map, dir, Seq("documents"), "#alt")(
        { altBuilds += 1; s"alt$altBuilds" })
    assert(getAlt() == "alt1")
    assert(get() == "artifact2" && getAlt() == "alt1")
    assert(map.size == 2 && builds == 2 && altBuilds == 1)
    // ... and a regeneration sweeps BOTH stale variants on the next miss
    writeCorpus(dir, "v3")
    assert(get() == "artifact3")
    assert(map.size == 1 && evicted.size == 3,
      "a miss after regeneration must sweep every stale variant")
  }

  test("deleteDir onEvict removes the superseded staging dir from disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fp2").toString
    writeCorpus(dir, "v1")
    val map = TrieMap.empty[String, String]
    def stage(): String = Fingerprint.memo(map, dir, Seq("documents"), "",
      Fingerprint.deleteDir) {
      val t = java.nio.file.Files.createTempDirectory("graft_fp_stage")
      java.nio.file.Files.write(t.resolve("data"), "x".getBytes("UTF-8"))
      t.toString
    }
    val first = stage()
    assert(new java.io.File(first, "data").exists())
    writeCorpus(dir, "v2 longer")
    val second = stage()
    assert(second != first)
    assert(!new java.io.File(first).exists(),
      "evicted staging dir must be deleted from disk")
    assert(new java.io.File(second, "data").exists())
  }

  test("eviction sweep stays exact on textually prefix-colliding " +
      "fingerprints (unframed numeric tail)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fp4").toString
    writeCorpus(dir, "v1 corpus")
    val f = new java.io.File(s"$dir/documents.parquet/part-00000")
    assert(f.setLastModified(1230000L))
    val map = TrieMap.empty[String, String]
    val evicted = scala.collection.mutable.Buffer.empty[String]
    var builds = 0
    def get(): String = Fingerprint.memo(map, dir, Seq("documents"), "",
      (v: String) => evicted += v) { builds += 1; s"a$builds" }
    assert(get() == "a1")
    // same bytes + file count, mtime rewound so the NEW fingerprint is a
    // textual PREFIX of the old one ("…#123000" vs "…#1230000") — a bare
    // startsWith freshness test would keep the stale entry forever
    assert(f.setLastModified(123000L))
    assert(get() == "a2")
    assert(map.size == 1 && evicted.toSeq == Seq("a1"),
      "a prefix-colliding stale entry must still be evicted")
  }

  test("suffixes must be '#'-framed so fingerprints cannot prefix-collide") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fp3").toString
    writeCorpus(dir, "v1")
    val map = TrieMap.empty[String, String]
    intercept[IllegalArgumentException] {
      Fingerprint.memo(map, dir, Seq("documents"), "q153")("x")
    }
  }
}
