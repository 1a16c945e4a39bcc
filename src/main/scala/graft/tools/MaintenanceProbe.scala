package graft.tools

import graft.GraftSession
import graft.lake.Snapshots
import graft.streaming.DedupIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCALING probe for SCHEDULED registry maintenance: does a long fold
  * sequence with [[Snapshots.reclusterIfFragmented]] invoked after every
  * batch keep [[Snapshots.readKeyProbe]] pruning power — files-read
  * tracking the BATCH — without any manual recluster call?
  *
  * Two identical 10-batch span-dedup fold sequences over the same
  * corpus:
  *
  *  - `auto`: `reclusterIfFragmented` runs after every batch commit (the
  *    scheduled-run posture — a no-op below the overlap threshold, one
  *    atomic sort-rewrite above it);
  *  - `none`: no maintenance — per-commit clustered runs accrue and
  *    interleave, so the key probe degrades toward reading every run.
  *
  * Per batch, both sequences report the probe's (kept, total) file
  * counts, the live [[Snapshots.keyOverlapFraction]], and fold wall
  * time. The claim under test: `auto`'s kept-files stays ≈ the batch's
  * key reach as total files grow, while `none`'s kept grows with the
  * accrued run count.
  *
  * {{{ runMain graft.tools.MaintenanceProbe [baseDir] [nBatches] }}}
  */
object MaintenanceProbe {

  private def sentenceified(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      array_join(graft.functions.TextFunctions.sixWordSentences(col("text")),
        " ").as("text"))

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]"),
      cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nDocs = spark.read.parquet(s"$base/documents.parquet").count()
    val corpus = sentenceified(Scale.genDocuments(spark, nDocs * 3))
      .localCheckpoint(true)

    val t = java.nio.file.Files
      .createTempDirectory("graft_maintprobe").toString
    val regs = Seq("auto" -> s"$t/auto", "none" -> s"$t/none")

    println(f"${"mode"}%-5s ${"batch"}%5s ${"files"}%6s ${"kept"}%5s " +
      f"${"overlap"}%8s ${"fold_s"}%7s ${"maint_s"}%8s ${"recluster"}%9s")
    for (i <- 0 until nBatches) {
      val lo = nDocs * 3 * i / nBatches
      val hi = nDocs * 3 * (i + 1) / nBatches
      val batch = corpus.filter(col("doc_id") >= lo && col("doc_id") < hi)
      for ((mode, reg) <- regs) {
        DedupIndex.lastProbeFiles = None // batch 0 runs no probe
        val t0 = System.nanoTime()
        DedupIndex.spanDedupBatch(spark, reg, batch)
          .write.mode("overwrite").format("noop").save()
        val foldS = (System.nanoTime() - t0) / 1e9
        val (kept, total) = DedupIndex.lastProbeFiles.getOrElse((0, 0))
        val t1 = System.nanoTime()
        // keysPerFile 300 keeps the registry in the probe-wins regime at
        // test scale (micro-batch keys << file count) — the deployment
        // analogue of 128 MB files against a multi-TB registry
        val fired =
          if (mode == "auto")
            Snapshots.reclusterIfFragmented(spark, reg, Seq("h"),
              keysPerFile = 300L).isDefined
          else false
        val maintS = (System.nanoTime() - t1) / 1e9
        val ov = Snapshots.keyOverlapFraction(reg, "h")
        println(f"$mode%-5s $i%5d $total%6d $kept%5d $ov%8.3f " +
          f"$foldS%7.2f $maintS%8.2f $fired%9s")
      }
    }

    // the regime where pruning bites (RegistryProbe's sweep A): a 5-doc
    // micro-batch against the grown registry — `auto` must read a file
    // subset tracking the batch's keys; `none` reads ~every accrued run
    val freshLo = nDocs * 3
    val micro = sentenceified(Scale.genDocuments(spark, freshLo + 5)
      .filter(col("doc_id") >= freshLo)).localCheckpoint(true)
    println(f"${"mode"}%-5s ${"micro"}%5s ${"files"}%6s ${"kept"}%5s " +
      f"${"fold_s"}%7s")
    for ((mode, reg) <- regs) {
      DedupIndex.lastProbeFiles = None
      val t0 = System.nanoTime()
      DedupIndex.spanDedupBatch(spark, reg, micro)
        .write.mode("overwrite").format("noop").save()
      val foldS = (System.nanoTime() - t0) / 1e9
      val (kept, total) = DedupIndex.lastProbeFiles.getOrElse((0, 0))
      println(f"$mode%-5s ${"5doc"}%5s $total%6d $kept%5d $foldS%7.2f")
    }
    spark.stop()
  }
}
