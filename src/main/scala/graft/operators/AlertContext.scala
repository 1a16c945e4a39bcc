package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Alert context union-merge and diff — reference A2/A3
  * (alert_writer/src/main.rs:356-401, 537-563): per context key,
  * `merged = unique(flatten([existing, new]))`; the CDC diff is the set of
  * new elements absent from the old context. Pure array expressions.
  */
object AlertContext {

  /** unique(flatten([a, b])) — preserves first-seen order, drops nulls. */
  def merge(existing: Column, incoming: Column): Column =
    array_distinct(filter(
      concat(coalesce(existing, array()), coalesce(incoming, array())),
      _.isNotNull))

  /** Elements of `incoming` not present in `existing` (A3 set diff). */
  def diff(existing: Column, incoming: Column): Column =
    array_except(coalesce(incoming, array()), coalesce(existing, array()))

  /** Merge two map<string,array<string>> contexts key-wise; a null side
    * yields the other unchanged (types stay those of the real input).
    */
  def mergeMaps(existing: Column, incoming: Column): Column =
    when(existing.isNull, incoming)
      .when(incoming.isNull, existing)
      .otherwise(map_zip_with(existing, incoming, (_, a, b) => merge(a, b)))
}
