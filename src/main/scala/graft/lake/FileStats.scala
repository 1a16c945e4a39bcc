package graft.lake

import java.util.Base64
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.sources._

import scala.jdk.CollectionConverters._

/** Per-file column min/max/null-count statistics for manifest-level file
  * skipping — the zone-map layer Iceberg keeps in its manifests.
  *
  * The reference collects exactly these metrics from parquet footers at
  * commit time (`IcebergMetadataWriter.kt:199-216, 238-248` reads the
  * footer via ranged GETs and attaches min/max/null counts to the
  * `DataFile`); engines then prune whole files against scan predicates
  * before any split is planned. [[collect]] is the same footer read
  * (driver-side, O(staged files), no data pass), [[mayMatch]] the same
  * conservative bound check, evaluated against Spark's public
  * `org.apache.spark.sql.sources.Filter` algebra so callers can hand over
  * the exact predicates they would push to a DataSource.
  *
  * Only top-level primitive columns are tracked. Unknown columns, unknown
  * filter shapes, and type mismatches all answer "may match" — pruning is
  * an optimization, never a correctness gate.
  */
object FileStats {

  /** min/max are None when the footer has no usable bound (all-null column,
    * unbounded stats, or a truncation that can't preserve the bound).
    */
  final case class ColStats(
      typ: Char, // l=integral  d=float/double  s=string  b=boolean  t=timestamp-micros
      min: Option[Any],
      max: Option[Any],
      nullCount: Long)

  final case class Stats(rows: Long, cols: Map[String, ColStats])

  private val MaxStringBound = 64

  // ---- collection -----------------------------------------------------------

  /** Read one parquet footer and aggregate per-column stats across its row
    * groups. Returns None if the footer is unreadable (never fails a
    * commit for missing stats).
    */
  def collect(conf: Configuration, file: java.nio.file.Path): Option[Stats] =
    try {
      val in = HadoopInputFile.fromPath(new HPath(file.toUri.toString), conf)
      val reader = ParquetFileReader.open(in)
      try {
        val footer = reader.getFooter
        val schema = footer.getFileMetaData.getSchema
        val rows = footer.getBlocks.asScala.map(_.getRowCount).sum
        val byCol = footer.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .filter(_.getPath.toArray.length == 1) // top-level only
          .groupBy(_.getPath.toDotString)
        val cols = byCol.flatMap { case (name, chunks) =>
          val prim = schema.getType(Seq(name): _*).asPrimitiveType()
          typeTag(prim).flatMap { t =>
            val stats = chunks.map(_.getStatistics)
            if (stats.exists(s => s == null || !s.isNumNullsSet)) None
            else {
              val nulls = stats.map(_.getNumNulls).sum
              val nonNull = stats.filter(_.hasNonNullValue).toVector
              val mins: Vector[Any] = nonNull.map(s => decode(t, s.genericGetMin))
              val maxs: Vector[Any] = nonNull.map(s => decode(t, s.genericGetMax))
              Some(name -> ColStats(t,
                if (mins.isEmpty) None else Some(mins.min(AnyOrd)),
                if (maxs.isEmpty) None else Some(maxs.max(AnyOrd)),
                nulls))
            }
          }
        }.toMap
        Some(Stats(rows, cols))
      } finally reader.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  private def typeTag(p: org.apache.parquet.schema.PrimitiveType): Option[Char] = {
    val logical = p.getLogicalTypeAnnotation
    p.getPrimitiveTypeName match {
      case INT32 | INT64 =>
        logical match {
          case _: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => Some('t')
          case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => None // days vs Date — skip
          case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => None
          case _ => Some('l')
        }
      case FLOAT | DOUBLE => Some('d')
      case BOOLEAN => Some('b')
      case BINARY if logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        Some('s')
      case _ => None
    }
  }

  private def decode(t: Char, v: Any): Any = (t, v) match {
    case ('s', b: org.apache.parquet.io.api.Binary) => b.toStringUsingUTF8
    case ('d', f: java.lang.Float) => f.doubleValue(): java.lang.Double
    case (_, n: java.lang.Integer) => n.longValue(): java.lang.Long
    case _ => v
  }

  private object AnyOrd extends Ordering[Any] {
    def compare(a: Any, b: Any): Int = (a, b) match {
      case (x: java.lang.Long, y: java.lang.Long) => x.compareTo(y)
      case (x: java.lang.Double, y: java.lang.Double) => x.compareTo(y)
      case (x: String, y: String) => x.compareTo(y)
      case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
      case _ => 0
    }
  }

  // ---- manifest encoding ----------------------------------------------------
  // One field per manifest line: `rows;col|t|minB64|maxB64|nulls;...`
  // (base64 keeps arbitrary string bounds clear of the \t|; separators).

  def encode(s: Stats): String = {
    def b64(v: Option[Any]): String =
      v.fold("")(x => Base64.getEncoder.encodeToString(x.toString.getBytes(UTF_8)))
    val cols = s.cols.toSeq.sortBy(_._1).map { case (n, c) =>
      // a string max bound truncated here would sort BELOW real values —
      // drop it instead (None = unknown, never prunes)
      val safeMax = c.max.filter {
        case str: String if c.typ == 's' => str.length <= MaxStringBound
        case _ => true
      }
      val safeMin = c.min.map {
        case str: String if c.typ == 's' && str.length > MaxStringBound =>
          str.take(MaxStringBound) // prefix is a valid (weaker) lower bound
        case other => other
      }
      s"$n|${c.typ}|${b64(safeMin)}|${b64(safeMax)}|${c.nullCount}"
    }
    (s.rows.toString +: cols).mkString(";")
  }

  def parse(field: String): Option[Stats] =
    try {
      val parts = field.split(";", -1)
      val rows = parts.head.toLong
      val cols = parts.tail.filter(_.nonEmpty).map { p =>
        val Array(n, t, minB, maxB, nulls) = p.split("\\|", -1)
        def un(b: String): Option[Any] =
          if (b.isEmpty) None
          else {
            val s = new String(Base64.getDecoder.decode(b), UTF_8)
            Some(t.head match {
              case 'l' | 't' => java.lang.Long.valueOf(s)
              case 'd' => java.lang.Double.valueOf(s)
              case 'b' => java.lang.Boolean.valueOf(s)
              case _ => s
            })
          }
        n -> ColStats(t.head, un(minB), un(maxB), nulls.toLong)
      }.toMap
      Some(Stats(rows, cols))
    } catch { case scala.util.control.NonFatal(_) => None }

  // ---- pruning --------------------------------------------------------------

  /** Conservative zone-map check: false ONLY when `filter` provably matches
    * no row of a file with these stats.
    */
  def mayMatch(filter: Filter, stats: Stats): Boolean = filter match {
    case And(l, r) => mayMatch(l, stats) && mayMatch(r, stats)
    case Or(l, r) => mayMatch(l, stats) || mayMatch(r, stats)
    case EqualTo(a, v) => inRange(a, v, stats)
    case In(a, vs) => vs.isEmpty || vs.exists(inRange(a, _, stats))
    case GreaterThan(a, v) => cmpMax(a, v, stats).forall(_ > 0)
    case GreaterThanOrEqual(a, v) => cmpMax(a, v, stats).forall(_ >= 0)
    case LessThan(a, v) => cmpMin(a, v, stats).forall(_ < 0)
    case LessThanOrEqual(a, v) => cmpMin(a, v, stats).forall(_ <= 0)
    case IsNull(a) => stats.cols.get(a).forall(_.nullCount > 0)
    case IsNotNull(a) =>
      stats.cols.get(a).forall(c => stats.rows <= 0 || c.nullCount < stats.rows)
    case _ => true // Not / StringStartsWith / unknown shapes: never prune
  }

  /** compare(file max, value) when both bounds comparable; None = unknown. */
  private def cmpMax(col: String, v: Any, stats: Stats): Option[Int] =
    for { c <- stats.cols.get(col); m <- c.max; fv <- coerce(c.typ, v) }
      yield AnyOrd.compare(m, fv)

  private def cmpMin(col: String, v: Any, stats: Stats): Option[Int] =
    for { c <- stats.cols.get(col); m <- c.min; fv <- coerce(c.typ, v) }
      yield AnyOrd.compare(m, fv)

  private def inRange(col: String, v: Any, stats: Stats): Boolean =
    cmpMax(col, v, stats).forall(_ >= 0) && cmpMin(col, v, stats).forall(_ <= 0)

  /** Filter value → the stat domain, or None (incomparable → no pruning).
    * String max bounds may be truncated-away but never inflated, and
    * numeric widening is exact, so coerced comparisons stay conservative.
    */
  private def coerce(t: Char, v: Any): Option[Any] = (t, v) match {
    case (_, null) => None
    case ('l', n: Number) if longSafe(n) => Some(java.lang.Long.valueOf(n.longValue()))
    case ('d', n: Number) => Some(java.lang.Double.valueOf(n.doubleValue()))
    case ('s', s: String) => Some(s)
    case ('b', b: java.lang.Boolean) => Some(b)
    case ('t', ts: java.sql.Timestamp) =>
      Some(java.lang.Long.valueOf(ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000))
    case ('t', ts: java.time.Instant) =>
      Some(java.lang.Long.valueOf(ts.getEpochSecond * 1000000L + ts.getNano / 1000))
    case _ => None
  }

  private def longSafe(n: Number): Boolean = n match {
    case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short | _: java.lang.Byte => true
    case _ => false
  }
}
