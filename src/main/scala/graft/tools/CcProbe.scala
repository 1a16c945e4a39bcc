package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q84 round-count probe (round-15 judge item #7): does a higher label
  * fan-in — the label(label(neighbor)) third branch — cut a
  * pointer-doubling round on the q84 connected-components input, and is
  * the extra per-round join worth it?
  *
  * {{{ runMain graft.tools.CcProbe [baseDir] [factor] [runs] }}}
  *
  * Loads the q67/q84 verified near-dup pair list (LSH candidates → exact
  * Jaccard) over a corpus `factor`× the base documents table, then times
  * the two-branch (production) and three-branch loops over identical
  * inputs, asserting bit-identical cluster outputs and printing rounds +
  * wall time per variant.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(1)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs =
      if (factor <= 1) Tables.load(spark, base, "documents")
      else {
        val n = spark.read.parquet(s"$base/documents.parquet").count()
        Scale.genDocuments(spark, n * factor)
      }
    val sets = Dedup.shingleFrame(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = Dedup.blockedCandidatePairs(
      Dedup.lshKeyedBuckets(sets, bands = 2, rowsPerBand = 3),
      "doc", Seq("band", "sig"), blockSize = 256)
    val pairs = Dedup.jaccardVerify(sets, cands, minJaccard = 0.2)
      .select(col("id1"), col("id2")).localCheckpoint(true)
    val nodes = docs.select(col("doc_id").as("id")).localCheckpoint(true)
    sets.unpersist(false)
    println(s"[ccprobe] nodes=${nodes.count()} pairs=${pairs.count()}")

    def run(neighborDouble: Boolean): (Double, Int, Long) = {
      // snapshot so cleanup only drops THIS run's loop checkpoints — the
      // shared nodes/pairs checkpoints must survive (lineage truncated:
      // an unpersisted localCheckpoint cannot recompute)
      val keep = spark.sparkContext.getPersistentRDDs.keySet
      val rounds = new AtomicInteger(0)
      val t0 = System.nanoTime()
      val out = Dedup.duplicateClustersFanIn(nodes, pairs,
        neighborDouble = neighborDouble, roundsOut = Some(rounds))
      val fp = out.select(xxhash64(col("id"), col("cluster_id"),
          col("cluster_size"), col("is_canonical")).as("h"))
        .agg(expr("bit_xor(h)").as("fp"))
        .head.getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep.contains(id) }
        .values.foreach(_.unpersist(true))
      (sec, rounds.get, fp)
    }

    var fp2 = 0L
    var fp3 = 0L
    for (r <- 1 to runs) {
      val (s2, r2, f2) = run(neighborDouble = false)
      val (s3, r3, f3) = run(neighborDouble = true)
      fp2 = f2; fp3 = f3
      println(f"[ccprobe] run$r  2-branch: $s2%6.2f s ($r2 rounds)   " +
        f"3-branch: $s3%6.2f s ($r3 rounds)   identical=${f2 == f3}")
    }
    require(fp2 == fp3, "cluster outputs diverged between variants")
    spark.stop()
  }
}
