package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (point-in-time) join.
  *
  * For every left row, attach the single right row with the greatest right
  * timestamp at-or-before the left timestamp (`Backward` — "the latest state
  * as of this event"), or the smallest right timestamp at-or-after it
  * (`Forward`), matching on equi-keys. Left rows with no qualifying right
  * row keep null carried columns (left-outer semantics).
  *
  * The reference delegates point-in-time analytics to its query engines
  * (`README.md` "Bring Your Own Analytics"); Spark has no built-in as-of
  * join, and the naive formulations are scale-hazards: a theta-join
  * (`l.key = r.key && r.ts <= l.ts` + max-window) explodes to the full
  * per-key cross product before pruning, and a per-left-row correlated
  * subquery re-scans the right side. This is the scale-safe union trick:
  *
  *   1. tag both sides and union them — no join operator at all;
  *   2. ONE exchange: hash-partition by key, in-partition sort on
  *      (ts, side) — the same wire cost as a sort-merge join's shuffle of
  *      |L|+|R| rows, with zero join-explosion risk;
  *   3. a running `last(_, ignoreNulls)` window over
  *      `rowsBetween(unboundedPreceding, currentRow)` carries the most
  *      recent right-side row forward onto each left row in O(1) state
  *      (Spark's UnboundedPrecedingWindowFunctionFrame streams the frame —
  *      nothing is buffered);
  *   4. keep the left rows.
  *
  * Skewed keys degrade to a bigger in-partition sort, never to a cross
  * product. The carried right columns travel as ONE struct so a right row
  * whose carried value is null is still matched atomically (per-column
  * `last(ignoreNulls)` would "see through" it to an older row's value).
  */
object AsOfJoin {

  sealed trait Direction
  /** Match the greatest right ts <= left ts (latest prior state). */
  case object Backward extends Direction
  /** Match the smallest right ts >= left ts (next following event). */
  case object Forward extends Direction

  private val TS = "__asof_ts"
  private val SIDE = "__asof_side"
  private val PAYLOAD = "__asof_p"
  private val RTS = "__asof_rts"

  /** @param keys      equi-join key columns; must exist under the same name
    *                  on both sides. Null keys never match (SQL equality).
    * @param carry     right columns to attach, as (rightCol, outputName)
    *                  pairs; output names must not collide with left columns.
    * @param strict    exclude right rows at exactly the left timestamp
    *                  (r.ts < l.ts instead of <=, mirrored for Forward).
    * @param tolerance max allowed timestamp gap as an interval Column (e.g.
    *                  `expr("INTERVAL 1 HOUR")`); matches further away are
    *                  nulled, preserving left-outer row count.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      carry: Seq[(String, String)],
      direction: Direction = Backward,
      strict: Boolean = false,
      tolerance: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    val collisions = carry.map(_._2).toSet intersect left.columns.toSet
    require(collisions.isEmpty, s"carry output names collide with left columns: $collisions")

    val payloadFields = col(rightTs).as(RTS) +:
      carry.map { case (c, out) => col(c).as(out) }
    val rightTagged = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(
          col(rightTs).as(TS),
          lit(0).as(SIDE),
          struct(payloadFields: _*).as(PAYLOAD)): _*)
    val leftTagged = left
      .withColumn(TS, col(leftTs))
      .withColumn(SIDE, lit(1))

    // At equal ts the right row sorts before the left row iff inclusive, so
    // the running `last` at the left row sees it exactly when it should.
    val sideOrder = if (strict) col(SIDE).desc else col(SIDE).asc
    val tsOrder = direction match {
      case Backward => col(TS).asc
      case Forward  => col(TS).desc
    }
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = leftTagged
      .unionByName(rightTagged, allowMissingColumns = true)
      .withColumn(PAYLOAD, last(col(PAYLOAD), ignoreNulls = true).over(w))
      .filter(col(SIDE) === 1)

    val gated = tolerance match {
      case None => matched
      case Some(tol) =>
        val gap = direction match {
          case Backward => col(TS) - col(PAYLOAD)(RTS)
          case Forward  => col(PAYLOAD)(RTS) - col(TS)
        }
        matched.withColumn(PAYLOAD, when(gap <= tol, col(PAYLOAD)))
    }

    gated.select(
      left.columns.map(col) ++
        carry.map { case (_, out) => col(PAYLOAD)(out).as(out) }: _*)
  }
}
