package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Flattened view projection (reference P7,
  * MatanoIcebergTableCustomResource.kt:266-318): per table, a view
  * selecting every nested struct leaf as `a_b_c` columns. Lists of structs
  * are kept intact (the reference skips flattening into them).
  */
object FlattenedView {

  /** (flatName, column) pairs for every leaf reachable without crossing an
    * array of structs.
    */
  def flatColumns(schema: StructType, prefix: Seq[String] = Nil): Seq[(String, Column)] =
    schema.fields.toSeq.flatMap { f =>
      val path = prefix :+ f.name
      f.dataType match {
        case nested: StructType => flatColumns(nested, path)
        case _ => Seq(path.mkString("_") -> col(path.mkString(".")))
      }
    }

  def flatten(df: DataFrame): DataFrame =
    df.select(flatColumns(df.schema).map { case (n, c) => c.as(n) }: _*)

  /** Register `<name>_view` like the reference's generated Athena views. */
  def createView(df: DataFrame, name: String): Unit =
    flatten(df).createOrReplaceTempView(s"${name}_view")
}
