package graft

import java.nio.file.Files

import graft.lake.Lake
import graft.sources.Framing
import graft.transform.TransformDsl
import org.apache.spark.sql.functions._

/** Lake maintenance + leftover transform/source surface. */
class LakeSpec extends SparkSpec {
  import spark.implicits._

  test("compactHour bin-packs one partition's files and preserves rows") {
    val tmp = Files.createTempDirectory("graft_compact").toString
    val rows = (1 to 500).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-02-01 03:10:00")))
      .toDF("id", "ts")
    // many small files: append in 10 slices
    (0 until 10).foreach { s =>
      Lake.append(rows.filter(col("id") % 10 === s).repartition(2), tmp)
    }
    val dir = new java.io.File(s"$tmp/ts_hour=2024-02-01-03")
    val before = dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 10)
    Lake.compactHour(spark, tmp, "2024-02-01-03")
    val after = dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(after < before)
    val back = Lake.read(spark, tmp)
    assert(back.count() == 500)
    assert(back.select(sum("id")).head.getLong(0) == (1 to 500).map(_.toLong).sum)
  }

  test("relatedPrelude seeds empty related arrays") {
    val df = Seq(("x", 1)).toDF("a", "b")
    val out = TransformDsl.relatedPrelude(df)
    val r = out.select("related.ip", "related.user", "related.hash").head
    assert(r.getSeq[String](0).isEmpty && r.getSeq[String](1).isEmpty && r.getSeq[String](2).isEmpty)
  }

  test("expandRecords explodes a payload array into rows (S5)") {
    val df = Seq(("file1", Seq("r1", "r2", "r3"))).toDF("path", "records")
    val out = Framing.expandRecords(df, col("records"))
    assert(out.count() == 3)
    assert(out.select("record").as[String].collect().sorted.toSeq == Seq("r1", "r2", "r3"))
    assert(out.columns.contains("path"))
  }

  test("evolveAppend: new columns appear, old rows read null, old columns null-fill") {
    import graft.lake.Lake
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    val v1 = Seq((1L, "a")).toDF("id", "name")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:10:00")))
    Lake.append(v1, dir)
    // v2 adds `score`, drops `name` (the reference's unionByNameWith)
    val v2 = Seq((2L, 9.5)).toDF("id", "score")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 01:10:00")))
    Lake.evolveAppend(spark, v2, dir)
    val out = Lake.readEvolved(spark, dir).orderBy("id")
    assert(out.columns.toSet == Set("id", "name", "score", "ts", Lake.PartitionCol))
    val rows = out.select("id", "name", "score").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "a" && rows(0).isNullAt(2))
    assert(rows(1).getLong(0) == 2L && rows(1).isNullAt(1) && rows(1).getDouble(2) == 9.5)
  }

  test("lake mergeUpsert: matched keys update in place, new keys insert") {
    import graft.lake.Lake
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_merge").toString
    val base = Seq(
      (1L, "old1", java.sql.Timestamp.valueOf("2024-01-01 00:10:00")),
      (2L, "old2", java.sql.Timestamp.valueOf("2024-01-01 01:10:00")),
      (3L, "keep", java.sql.Timestamp.valueOf("2024-01-01 02:10:00"))
    ).toDF("id", "v", "ts")
    Lake.append(base, dir)
    val before = new java.io.File(s"$dir/ts_hour=2024-01-01-02")
      .listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    val updates = Seq(
      (1L, "new1", java.sql.Timestamp.valueOf("2024-01-01 00:10:00")), // matched
      (9L, "ins9", java.sql.Timestamp.valueOf("2024-01-01 03:10:00"))  // insert
    ).toDF("id", "v", "ts")
    Lake.mergeUpsert(spark, dir, updates, "id")
    val out = Lake.read(spark, dir).orderBy("id")
    assert(out.select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "new1"), (2L, "old2"), (3L, "keep"), (9L, "ins9")))
    // the untouched hour partition kept its original files
    val after = new java.io.File(s"$dir/ts_hour=2024-01-01-02")
      .listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    assert(after == before)
  }

  test("lake mergeUpsert: an update whose ts re-derives another hour cannot nuke it") {
    import graft.lake.Lake
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_mv").toString
    Lake.append(Seq(
      (1L, "old1", java.sql.Timestamp.valueOf("2024-01-01 00:10:00")),
      (2L, "bystander", java.sql.Timestamp.valueOf("2024-01-01 02:10:00"))
    ).toDF("id", "v", "ts"), dir)
    // key 1's update carries a ts INSIDE hour 02 — the bystander's hour;
    // the row must stay in its original partition, hour 02 untouched
    Lake.mergeUpsert(spark, dir,
      Seq((1L, "new1", java.sql.Timestamp.valueOf("2024-01-01 02:30:00")))
        .toDF("id", "v", "ts"), "id")
    val out = Lake.read(spark, dir)
    assert(out.count() == 2)
    assert(out.filter(col("id") === 2L).select("v").head.getString(0) == "bystander")
    val k1 = out.filter(col("id") === 1L).head
    assert(k1.getAs[String]("v") == "new1")
    assert(k1.getAs[String](graft.lake.Lake.PartitionCol) == "2024-01-01-00") // original hour
  }

  test("fast minhash (xxhash64) is deterministic and seed-sensitive") {
    import graft.functions.TextFunctions
    val sh = TextFunctions.shingleSet(lit("a b c d e f"), 2)
    val row = Seq(1).toDF("x").select(
      TextFunctions.minhashFast(sh, 0).as("m0"),
      TextFunctions.minhashFast(sh, 0).as("m0b"),
      TextFunctions.minhashFast(sh, 1).as("m1")).head
    assert(row.getLong(0) == row.getLong(1))
    assert(row.getLong(0) != row.getLong(2))
  }

  test("zorderKey: hand-computed Morton interleave, locality ordering") {
    import graft.lake.Lake
    // a=3 (011), b=5 (101), 3 bits: even positions take a's bits, odd b's
    // → 1·1 + 1·2 + 1·4 + 0·8 + 0·16 + 1·32 = 39
    val k = Seq((3L, 5L)).toDF("a", "b")
      .select(Lake.zorderKey(col("a"), col("b"), 3)).head.getLong(0)
    assert(k == 39L)
    // interleave is a bijection on the 2-D grid (no key collisions)
    val grid = spark.range(0, 256).select(
      (col("id") % 16).as("a"), (col("id") / 16).cast("long").as("b"))
    assert(grid.select(Lake.zorderKey(col("a"), col("b"), 4)).distinct()
      .count() == 256)
    // locality: sorting by z-key keeps each quadrant contiguous — every
    // key of the low quadrant (a,b < 8) precedes every key of the high
    // quadrant (a,b >= 8), which is what makes per-file 2-D ranges tight
    val keys = grid.select(col("a"), col("b"),
        Lake.zorderKey(col("a"), col("b"), 4).as("z")).collect()
    val lowMax = keys.filter(r => r.getLong(0) < 8 && r.getLong(1) < 8)
      .map(_.getLong(2)).max
    val highMin = keys.filter(r => r.getLong(0) >= 8 && r.getLong(1) >= 8)
      .map(_.getLong(2)).min
    assert(lowMax < highMin)
  }
}
