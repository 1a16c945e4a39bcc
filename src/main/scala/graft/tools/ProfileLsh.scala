package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.storage.StorageLevel

/** Stage timing for the LSH dedup pipeline. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, dir, "documents")
    val sets = Dedup.shingleFrame(docs, "doc_id", "text").persist(StorageLevel.MEMORY_AND_DISK)
    time("shingleFrame materialize") { sets.count() }
    val cands = Dedup.lshCandidatePairs(sets, bands = 2, rowsPerBand = 3)
    val nc = time("candidates") { cands.count() }
    println(s"[profile] n_candidates=$nc")
    time("verify") { Dedup.jaccardVerify(sets, cands, 0.2).count() }
    spark.stop()
  }
}
