package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** VRL-capability transform DSL compiled to Catalyst `Column` graphs.
  *
  * The reference mutates records with compiled VRL programs (reference
  * lib/rust/transformer/src/main.rs:874-1011, lib/rust/shared/src/
  * vrl_util.rs:12-113). Here a transform is a declarative list of steps over
  * dotted paths; `Transform.apply` folds them into one `select`/`withColumn`
  * plan, so Catalyst sees ordinary expressions — whole-stage codegen, no
  * row-at-a-time interpreter in the hot path, and program "compilation" is
  * plan construction (cached by Spark's plan cache, the analogue of VRL's
  * 400-entry LRU program cache).
  *
  * Path semantics: `a.b.c` addresses nested struct fields. Setting a path
  * whose root doesn't exist creates the nested struct; deleting a leaf drops
  * the field; renames are set+del, as VRL's `del(.x)`+assignment idiom.
  */
object TransformDsl {

  sealed trait Step
  /** `.path = expr` — set/overwrite a (possibly nested) field. */
  final case class SetPath(path: String, value: Column) extends Step
  /** `del(.path)` — remove a field (leaf or subtree). */
  final case class DelPath(path: String) extends Step
  /** `.to = del(.from)` — the VRL rename idiom. */
  final case class Rename(from: String, to: String) extends Step
  /** `abort` under a condition — drop the record (reference P4). */
  final case class AbortWhen(cond: Column) extends Step
  /** Keep only records matching `cond` (the complement of AbortWhen). */
  final case class KeepWhen(cond: Column) extends Step

  final case class Transform(steps: Seq[Step]) {
    def apply(df: DataFrame): DataFrame = steps.foldLeft(df) {
      case (d, SetPath(p, v))   => setPath(d, p, v)
      case (d, DelPath(p))      => delPath(d, p)
      case (d, Rename(f, tTo))  => delPath(setPath(d, tTo, getPath(d, f)), f)
      case (d, AbortWhen(c))    => d.filter(!coalesce(c, lit(false)))
      case (d, KeepWhen(c))     => d.filter(coalesce(c, lit(false)))
    }
  }

  def transform(steps: Step*): Transform = Transform(steps)

  /** Column for a dotted path (null-safe: a path missing at ANY level —
    * root or intermediate struct field — resolves to a null literal so
    * downstream expressions stay total, as VRL's fallible get).
    */
  def getPath(df: DataFrame, path: String): Column =
    if (pathExists(df.schema, path.split('.').toList)) col(path) else lit(null)

  @annotation.tailrec
  private def pathExists(dt: DataType, parts: List[String]): Boolean =
    (dt, parts) match {
      case (_, Nil) => true
      case (st: StructType, p :: rest) =>
        st.fields.find(_.name == p) match {
          case Some(f) => pathExists(f.dataType, rest)
          case None    => false
        }
      case _ => false
    }

  /** Set a dotted path, creating intermediate structs as needed — including
    * missing intermediates under an EXISTING root (Column.withField alone
    * can't add through an absent parent), and replacing a non-struct value
    * sitting mid-path (VRL overwrites it with an object).
    */
  def setPath(df: DataFrame, path: String, value: Column): DataFrame = {
    val parts = path.split('.').toList
    val root = parts.head
    val cur =
      if (df.columns.contains(root))
        Some((col(root), df.schema.fields.find(_.name == root).get.dataType))
      else None
    df.withColumn(root, buildSet(cur, parts.tail, value))
  }

  private def buildSet(cur: Option[(Column, DataType)], parts: List[String], value: Column): Column =
    parts match {
      case Nil => value
      case head :: rest =>
        cur match {
          case Some((c, st: StructType)) =>
            val child = st.fields.find(_.name == head)
              .map(f => (c.getField(head), f.dataType))
            c.withField(head, buildSet(child, rest, value))
          case _ => // absent or non-struct mid-path: build the chain fresh
            struct(buildSet(None, rest, value).as(head))
        }
    }

  /** Delete a dotted path (no-op when any level is missing). Deleting the
    * last field of a struct leaves an empty struct (fixed-schema engines
    * can't drop to zero columns).
    */
  def delPath(df: DataFrame, path: String): DataFrame = {
    val parts = path.split('.')
    val root = parts.head
    if (!pathExists(df.schema, parts.toList)) df
    else if (parts.length == 1) df.drop(root)
    else df.withColumn(root, col(root).dropFields(parts.tail.mkString(".")))
  }

  /** Cast the value at a dotted path in place (try-cast: bad → null). */
  def castPath(df: DataFrame, path: String, to: DataType): DataFrame =
    if (!pathExists(df.schema, path.split('.').toList)) df
    else setPath(df, path, getPath(df, path).try_cast(to))

  // ---- VRL stdlib equivalents (SURVEY.md §2.6) --------------------------
  // Fallible-call semantics: `f(x) ?? default` → tryOr; `f!(x)` (abort on
  // error) → the expression returns null and AbortWhen(isnull) drops it.

  /** `expr ?? default` — VRL's error-coalescing operator. */
  def tryOr(c: Column, default: Column): Column = coalesce(c, default)

  /** Seed `related.{ip,user,hash}` arrays (transform prelude, reference
    * main.rs:267-282).
    */
  def relatedPrelude(df: DataFrame): DataFrame =
    df.withColumn("related", struct(
      array().cast(ArrayType(StringType)).as("ip"),
      array().cast(ArrayType(StringType)).as("user"),
      array().cast(ArrayType(StringType)).as("hash")))

  /** Transform footer (reference main.rs:339-351): stamp ecs.version. The
    * reference also runs `compact(.)` — see [[Compact]].
    */
  def ecsFooter(df: DataFrame, version: String = "8.5.0"): DataFrame =
    setPath(df, "ecs.version", lit(version))

  /** parse_key_value: `k1=v1 k2=v2` → map column. Repeated keys keep the
    * last value (str_to_map would throw DUPLICATED_MAP_KEY under the
    * default spark.sql.mapKeyDedupPolicy=EXCEPTION — a batch failure on
    * e.g. multi-OU X.509 DNs). Separators are regexes, as in str_to_map;
    * tokens without a kvSep are dropped.
    */
  def parseKeyValue(c: Column, pairSep: String = " ", kvSep: String = "="): Column = {
    import org.apache.spark.sql.functions.{transform => arrTransform}
    val split2 = arrTransform(split(c, pairSep), e => split(e, kvSep, 2))
    val entries = arrTransform(
      filter(split2, a => size(a) === 2),
      a => struct(element_at(a, 1).as("k"), element_at(a, 2).as("v")))
    val deduped = aggregate(
      entries,
      array().cast("array<struct<k:string,v:string>>"),
      (acc, e) => concat(
        filter(acc, x => !(x.getField("k") <=> e.getField("k"))), array(e)))
    map_from_entries(deduped)
  }

  /** to_timestamp with VRL-style fallibility (invalid → null, never throws). */
  def tryTimestamp(c: Column, fmt: String): Column = try_to_timestamp(c, lit(fmt))

  /** is_ipv4 heuristic (VRL is_ipv4): dotted-quad with 0-255 octets. */
  def isIpv4(c: Column): Column =
    c.rlike("^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$")

  /** is_ipv6 / ip_pton / ip_ntop (VRL net fns) — see [[graft.functions.NetFunctions]]. */
  def isIpv6(c: Column): Column = graft.functions.NetFunctions.isIpv6(c)
  def ipPton(c: Column): Column = graft.functions.NetFunctions.ipPton(c)
  def ipNtop(c: Column): Column = graft.functions.NetFunctions.ipNtop(c)

  /** decode_percent (VRL): percent-decode, invalid escape → null. */
  def decodePercent(c: Column): Column = try_url_decode(c)

  /** VRL `merge(to, from, deep: true)` over struct columns: field-wise
    * union, `from` wins on conflicts, struct-struct conflicts recurse.
    * Static schema can't distinguish an absent key from a null value, so a
    * runtime-null `from` leaf falls back to `to` (null-as-absent), and a
    * whole-null side yields the other side's fields.
    */
  def deepMerge(df: DataFrame, toPath: String, fromPath: String): Column = {
    def typeAt(path: String): StructType = {
      val t = path.split('.').toList.foldLeft(df.schema: DataType) {
        case (st: StructType, p) => st.fields.find(_.name == p)
          .getOrElse(sys.error(s"deepMerge: no field $p in $path")).dataType
        case (other, p) => sys.error(s"deepMerge: $p in $path addresses non-struct $other")
      }
      t match {
        case st: StructType => st
        case other => sys.error(s"deepMerge: $path is $other, expected struct")
      }
    }
    mergeStructCols(col(toPath), typeAt(toPath), col(fromPath), typeAt(fromPath))
  }

  private def mergeStructCols(a: Column, at: StructType, b: Column, bt: StructType): Column = {
    val merged = struct(mergedFieldCols(a, at, b, bt): _*)
    when(a.isNull && b.isNull, lit(null).cast(mergedType(at, bt))).otherwise(merged)
  }

  private def mergedFieldCols(a: Column, at: StructType, b: Column, bt: StructType): Seq[Column] =
    (at.fieldNames ++ bt.fieldNames).distinct.toIndexedSeq.map { n =>
      (at.fields.find(_.name == n), bt.fields.find(_.name == n)) match {
        case (Some(fa), Some(fb)) => (fa.dataType, fb.dataType) match {
          case (sa: StructType, sb: StructType) =>
            mergeStructCols(a.getField(n), sa, b.getField(n), sb).as(n)
          case (ta, tb) if ta == tb => coalesce(b.getField(n), a.getField(n)).as(n)
          case _ => b.getField(n).as(n) // type conflict: from wins outright
        }
        case (Some(_), None) => a.getField(n).as(n)
        case (None, _)       => b.getField(n).as(n)
      }
    }

  private def mergedType(at: StructType, bt: StructType): StructType =
    StructType((at.fieldNames ++ bt.fieldNames).distinct.map { n =>
      (at.fields.find(_.name == n), bt.fields.find(_.name == n)) match {
        case (Some(fa), Some(fb)) => (fa.dataType, fb.dataType) match {
          case (sa: StructType, sb: StructType) => StructField(n, mergedType(sa, sb))
          case _ => StructField(n, fb.dataType)
        }
        case (Some(fa), None) => StructField(n, fa.dataType)
        case (None, fb)       => StructField(n, fb.get.dataType)
      }
    })

  /** parse_url → {scheme, host, path, query} struct (VRL parse_url). */
  def parseUrl(c: Column): Column = struct(
    parse_url(c, lit("PROTOCOL")).as("scheme"),
    parse_url(c, lit("HOST")).as("host"),
    parse_url(c, lit("PATH")).as("path"),
    parse_url(c, lit("QUERY")).as("query"))

  /** parse_user_agent → ECS {name, version, os{name,version,full},
    * device{name}} from the [[UaLexicon]] pattern table (VRL
    * parse_user_agent enriched mode / uap-core evaluation order).
    */
  def parseUserAgent(c: Column): Column = UaLexicon.parse(c)
}
