package graft

import graft.schema.{FlattenedView, SchemaRegistry, SchemaResolver}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Schema composition, resolution + sidelining, flattened views. */
class SchemaSpec extends SparkSpec {
  import spark.implicits._

  private val master = StructType(Seq(
    StructField("event", StructType(Seq(
      StructField("action", StringType),
      StructField("category", ArrayType(StringType)),
      StructField("outcome", StringType)))),
    StructField("user", StructType(Seq(
      StructField("name", StringType),
      StructField("id", StringType)))),
    StructField("source", StructType(Seq(
      StructField("ip", StringType))))))

  test("cherryPick keeps only selected subtrees") {
    val picked = SchemaRegistry.cherryPick(master, Seq("event.action", "user"))
    assert(picked.fieldNames.toSeq == Seq("event", "user"))
    assert(picked("event").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("action"))
    assert(picked("user").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("name", "id"))
  }

  test("resolve adds defaults, sorts ts first, merges custom fields") {
    val custom = StructType(Seq(StructField("mycol", LongType)))
    val resolved = SchemaRegistry.resolve(master, Seq("event"), custom)
    assert(resolved.fieldNames.head == "ts")
    assert(resolved.fieldNames.contains("mycol") && resolved.fieldNames.contains("labels"))
    assert(resolved.fields.forall(_.nullable))
  }

  test("merge detects conflicting leaf types") {
    val a = StructType(Seq(StructField("x", StringType)))
    val b = StructType(Seq(StructField("x", LongType)))
    intercept[SchemaRegistry.SchemaConflict] { SchemaRegistry.merge(a, b) }
  }

  test("merge unions disjoint structs recursively") {
    val a = StructType(Seq(StructField("s", StructType(Seq(StructField("x", StringType))))))
    val b = StructType(Seq(StructField("s", StructType(Seq(StructField("y", LongType))))))
    val m = SchemaRegistry.merge(a, b)
    assert(m("s").dataType.asInstanceOf[StructType].fieldNames.toSet == Set("x", "y"))
  }

  test("resolver casts compatible rows and sidelines mismatches") {
    val target = StructType(Seq(
      StructField("n", LongType),
      StructField("s", StringType),
      StructField("missing", StringType)))
    val df = Seq(("42", "ok", "extra"), ("not-a-number", "bad", "x"))
      .toDF("n", "s", "junk")
    val r = SchemaResolver.resolve(df, target)
    val clean = r.resolved.collect()
    assert(clean.length == 1 && clean(0) == Row(42L, "ok", null))
    assert(r.resolved.columns.toSeq == Seq("n", "s", "missing"))
    val bad = r.sidelined.collect()
    assert(bad.length == 1 && bad(0).getAs[String]("error_kind") == "schema_mismatch")
    assert(bad(0).getAs[String]("n") == "not-a-number")
  }

  test("resolver handles nested structs and missing branches") {
    val target = StructType(Seq(
      StructField("user", StructType(Seq(
        StructField("id", LongType), StructField("name", StringType))))))
    val df = Seq(Tuple1(("7", "alice"))).toDF("user")
      .select(struct(col("user._1").as("id"), col("user._2").as("name")).as("user"))
    val r = SchemaResolver.resolve(df, target)
    assert(r.resolved.select("user.id", "user.name").head == Row(7L, "alice"))
    assert(r.sidelined.isEmpty)
  }

  test("flattened view exposes nested leaves as underscored columns") {
    val df = Seq((("a", 1), "x")).toDF("s", "top")
      .select(struct(col("s._1").as("b"), col("s._2").as("c")).as("s"), col("top"))
    val flat = FlattenedView.flatten(df)
    assert(flat.columns.toSeq == Seq("s_b", "s_c", "top"))
    assert(flat.head == Row("a", 1, "x"))
    FlattenedView.createView(df, "t1")
    assert(spark.table("t1_view").columns.contains("s_b"))
  }
}
