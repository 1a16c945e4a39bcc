package graft.tools

import graft.GraftSession
import graft.lake.Snapshots
import graft.streaming.DedupIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALING probe for the dedup registries' zone-map key pruning: does a
  * small batch's registry probe read a file subset that tracks the BATCH,
  * not the registry?
  *
  * Experiment design (the control is per-file key count, held constant):
  *
  *  1. Build a span registry from a `factor`×-scaled corpus (the q176
  *     fold, three id-ordered batches), then run the [[Snapshots
  *     .recluster]] maintenance action into `keys / KeysPerFile` files —
  *     file SIZE stays constant as the registry grows, file COUNT grows
  *     with it, exactly the 128 MB-file geometry of a deployment.
  *  2. Probe with a FIXED small batch of fresh docs and read
  *     [[DedupIndex.lastProbeFiles]]: with uniform int64 span keys, a
  *     file is read iff ≥1 batch key lands in its range, so kept ≈
  *     batch-key count — FLAT as the registry grows 1×→3×→10× while
  *     total file count (and registry bytes) grows linearly.
  *  3. Batch-size sweep at the largest registry: kept must track the
  *     batch's key count (≈ min(batch keys, files)).
  *  4. Counterfactual wall time with [[DedupIndex.keyProbeEnabled]] off —
  *     the full-registry-scan read the pruning replaces.
  *
  * {{{ runMain graft.tools.RegistryProbe [baseDir] [factors...] }}}
  */
object RegistryProbe {

  /** Per-file distinct-key budget after recluster — the constant that
    * makes file count proportional to registry size (a deployment's
    * analogue: a 128 MB parquet file of slim (h, wdoc, wpos) rows).
    */
  private val KeysPerFile = 3300L

  private def sentenceified(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      array_join(graft.functions.TextFunctions.sixWordSentences(col("text")),
        " ").as("text"))

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 3, 10, 30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]"),
      cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nDocs = spark.read.parquet(s"$base/documents.parquet").count()

    def foldBatch(reg: String, batch: DataFrame): Double = {
      val t0 = System.nanoTime()
      DedupIndex.spanDedupBatch(spark, reg, batch)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    println(f"${"sweep"}%-9s ${"factor"}%6s ${"reg_keys"}%9s ${"files"}%6s " +
      f"${"b_docs"}%6s ${"b_keys"}%7s ${"kept"}%6s ${"pruned_s"}%9s ${"full_s"}%7s")

    val registries = factors.map { f =>
      val n = nDocs * f
      val corpus = sentenceified(Scale.genDocuments(spark, n))
        .localCheckpoint(true)
      val t = java.nio.file.Files
        .createTempDirectory(s"graft_regprobe_$f").toString
      val reg = s"$t/registry"
      Seq(
        col("doc_id") < n / 3,
        col("doc_id") >= n / 3 && col("doc_id") < 2 * n / 3,
        col("doc_id") >= 2 * n / 3)
        .foreach(cut => foldBatch(reg, corpus.filter(cut)))
      val keys = Snapshots.read(spark, reg).count()
      val files = math.max(16L, keys / KeysPerFile).toInt
      Snapshots.recluster(spark, reg, Seq("h"), files)
      (f, n, keys, files, reg)
    }

    // sweep A: fixed 5-doc micro-batch, growing registry — kept must
    // saturate at ~the batch's key count while total grows linearly
    for ((f, n, keys, files, reg) <- registries) {
      def fresh(lo: Long, count: Long): DataFrame =
        sentenceified(Scale.genDocuments(spark, lo + count)
          .filter(col("doc_id") >= lo))
      // fresh ids beyond the corpus: fresh text, mostly-fresh keys
      val pruned = foldBatch(reg, fresh(n, 5))
      val (kept, total) = DedupIndex.lastProbeFiles.get
      val bKeys = Snapshots.read(spark, reg).count() - keys // fresh registrations
      // try/finally: a counterfactual fold that throws must not leave
      // probe pruning disabled JVM-wide for everything sharing the session
      DedupIndex.keyProbeEnabled = false
      val full =
        try foldBatch(reg, fresh(n + 5, 5))
        finally DedupIndex.keyProbeEnabled = true
      println(f"${"registry"}%-9s $f%6d $keys%9d $total%6d ${5}%6d " +
        f"$bKeys%7d $kept%6d $pruned%9.2f $full%7.2f")
    }

    // sweep B: growing batch, fixed (largest) registry — kept must track
    // the batch's key count
    val (fL, nL, keysL, _, regL) = registries.last
    var lo = nL + 100
    for (bDocs <- Seq(5L, 50L, 500L)) {
      val batch = sentenceified(Scale.genDocuments(spark, lo + bDocs)
        .filter(col("doc_id") >= lo))
      val before = Snapshots.read(spark, regL).count()
      val pruned = foldBatch(regL, batch)
      val (kept, total) = DedupIndex.lastProbeFiles.get
      val bKeys = Snapshots.read(spark, regL).count() - before
      println(f"${"batch"}%-9s $fL%6d $keysL%9d $total%6d $bDocs%6d " +
        f"$bKeys%7d $kept%6d $pruned%9.2f ${Double.NaN}%7.2f")
      lo += bDocs
    }
    spark.stop()
  }
}
