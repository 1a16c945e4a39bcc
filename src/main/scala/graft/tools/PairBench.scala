package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single-JVM A/B harness for the complete-pairing schedules — built
  * because cross-sweep comparisons of the 30× probe carry several
  * seconds of in-run variance (r11's q32 rows ranged 9.1–14.3 s across
  * sweeps of IDENTICAL code), which is larger than the effect being
  * measured. Here every strategy runs interleaved on the SAME banded
  * frame in one session, alternating a-b-a-b, so JIT/cache/GC drift
  * lands on all strategies equally.
  *
  * {{{ runMain graft.tools.PairBench [baseDir] [factor] [runs] }}}
  *
  * Strategies, all producing the identical pair set (spec-gated):
  *   plain   — uncapped within-bucket self-join (the pre-r11 form)
  *   blocked — blockedCandidatePairs (density dial + pinned parallelism)
  */
object PairBench {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(30)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDocs = spark.read.parquet(s"$base/documents.parquet").count()
    val docs = Scale.genDocuments(spark, nDocs * factor)
    // q32's exact banded frame, materialized once so every strategy reads
    // the same persisted input (the pairing is the ONLY thing timed).
    // Persisted in the CO-LOCATED layout (hash on the bucket key) so the
    // blocked path's persisted-input trust check accepts it — a persisted
    // frame in any other layout gets re-pinned, which is the pin cost
    // `pinned` isolates, not the dial premium this bench measures.
    val sets = Dedup.shingleFrame(docs, "doc_id", "text")
    val keyed = Dedup.lshKeyedBuckets(sets, bands = 2, rowsPerBand = 3)
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("band"), col("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[pairbench] banded rows: ${keyed.count()} (docs ${nDocs * factor})")
    // bucket-size histogram: what the dial actually sees
    val hist = keyed.groupBy(col("band"), col("sig")).count()
      .select(floor(log2(col("count"))).as("lg"))
      .groupBy("lg").count().orderBy("lg")
      .collect().map(r => s"2^${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
    println(s"[pairbench] bucket-size histogram (log2): $hist")

    val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null)
          maxTask.getAndUpdate(m => math.max(m, e.taskInfo.duration))
    })

    def plain(df: DataFrame): DataFrame =
      df.select(col("band"), col("sig"), col("doc").as("id1"))
        .join(df.select(col("band"), col("sig"), col("doc").as("id2")),
          Seq("band", "sig"))
        .filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2")).distinct()

    // diagnostic decompositions of the blocked schedule's premium:
    //   pinned — plain + the explicit repartition (isolates the pin cost)
    //   anti   — pin + in-plan dial + anti join, NO hot subtree
    def pinnedJoin(df: DataFrame): DataFrame = {
      val n = spark.sessionState.conf.numShufflePartitions
      val a = df.repartition(n, col("band"), col("sig"))
      a.select(col("band"), col("sig"), col("doc").as("id1"))
        .join(a.select(col("band"), col("sig"), col("doc").as("id2")),
          Seq("band", "sig"))
        .filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2")).distinct()
    }
    def antiOnly(df: DataFrame): DataFrame = {
      val n = spark.sessionState.conf.numShufflePartitions
      val hot = broadcast(df.groupBy(col("band"), col("sig"))
        .agg(count(lit(1)).as("__bn")).filter(col("__bn") > 4096)
        .select(col("band"), col("sig")))
      val small = df.join(hot, Seq("band", "sig"), "left_anti")
        .repartition(n, col("band"), col("sig"))
      small.select(col("band"), col("sig"), col("doc").as("id1"))
        .join(small.select(col("band"), col("sig"), col("doc").as("id2")),
          Seq("band", "sig"))
        .filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2")).distinct()
    }

    val strategies: Seq[(String, DataFrame => DataFrame)] = Seq(
      "plain" -> plain,
      "pinned" -> pinnedJoin,
      "anti" -> antiOnly,
      "blocked" -> (df =>
        Dedup.blockedCandidatePairs(df, "doc", Seq("band", "sig"),
          blockSize = 256)))

    def time(fn: DataFrame => DataFrame): (Double, Long, Long) = {
      maxTask.set(0)
      val t0 = System.nanoTime()
      val n = fn(keyed).count()
      val elapsed = (System.nanoTime() - t0) / 1e9
      var last = -1L; var tries = 0
      while (maxTask.get != last && tries < 25) {
        last = maxTask.get; Thread.sleep(200); tries += 1
      }
      (elapsed, maxTask.get, n)
    }

    // warm every strategy once (JIT + codegen), then interleave timed runs
    strategies.foreach { case (_, fn) => time(fn) }
    val acc = scala.collection.mutable.Map.empty[String, List[(Double, Long, Long)]]
    for (_ <- 1 to runs; (name, fn) <- strategies)
      acc(name) = time(fn) :: acc.getOrElse(name, Nil)
    println(f"${"strategy"}%-10s ${"median_s"}%9s ${"min_s"}%7s ${"max_s"}%7s ${"mtask"}%8s ${"pairs"}%10s")
    strategies.foreach { case (name, _) =>
      val rs = acc(name)
      val walls = rs.map(_._1).sorted
      val med = walls(walls.size / 2)
      println(f"$name%-10s $med%9.2f ${walls.head}%7.2f ${walls.last}%7.2f " +
        f"${rs.map(_._2).max}%6dms ${rs.head._3}%10d")
      require(rs.map(_._3).distinct.size == 1, s"$name pair count varied")
    }
    require(acc.values.map(_.head._3).toSeq.distinct.size == 1,
      "strategies disagree on the pair count")
    spark.stop()
  }
}
