package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** VRL `compact(.)` — recursive removal of null / empty values (reference
  * transform footer, lib/rust/transformer/src/main.rs:339-351; 34 uses in
  * managed transforms).
  *
  * In a fixed-schema engine fields can't be physically removed per row, so
  * compaction normalizes instead: empty strings, empty arrays/maps, and
  * structs whose fields are all null become NULL; arrays are filtered of
  * null/empty elements first. This is schema-driven plan construction —
  * the recursion happens once at compile time over the `DataType`, emitting
  * ordinary codegen'd expressions (no UDF, no runtime reflection).
  */
object Compact {

  /** Compact a column given its data type. */
  def compact(c: Column, dt: DataType): Column = dt match {
    case StringType =>
      when(c === "", lit(null).cast(StringType)).otherwise(c)
    case ArrayType(et, _) =>
      val cleaned = filter(transform(c, x => compact(x, et)), _.isNotNull)
      when(c.isNull || size(cleaned) === 0, lit(null).cast(ArrayType(et))).otherwise(cleaned)
    case MapType(kt, vt, n) =>
      val cleaned = map_filter(c, (_, v) => compact(v, vt).isNotNull)
      when(c.isNull || size(cleaned) === 0, lit(null).cast(MapType(kt, vt, n))).otherwise(cleaned)
    case st: StructType =>
      // compute each field's compacted expression ONCE and reuse the same
      // instance for the struct and the all-null probe — building the tree
      // twice per level would blow up 2^depth on nested schemas
      val compacted = st.fields.map(f => compact(c.getField(f.name), f.dataType))
      val rebuilt = struct(st.fields.zip(compacted).map { case (f, cc) => cc.as(f.name) }.toIndexedSeq: _*)
      val allNull = compacted.map(_.isNull).reduceOption(_ && _).getOrElse(lit(true))
      when(c.isNull || allNull, lit(null).cast(st)).otherwise(rebuilt)
    case _ => c
  }

  /** Compact every column of a DataFrame (the `. = compact(.)` footer). */
  def compactAll(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.select(df.schema.fields.map(f => compact(col(f.name), f.dataType).as(f.name)).toIndexedSeq: _*)
}
