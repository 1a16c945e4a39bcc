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
}
