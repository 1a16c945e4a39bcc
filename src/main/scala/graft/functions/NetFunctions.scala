package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** VRL net-function equivalents (reference vrl stdlib: is_ipv4 / is_ipv6 /
  * ip_pton / ip_ntop, used by managed source mappings e.g. for IP
  * normalization and CIDR math).
  *
  * ip_pton is a real parser (dotted quad, full/compressed IPv6, IPv4-mapped
  * tails), not a DNS-resolving InetAddress call — no network dependency,
  * deterministic, invalid input → null (VRL fallible-call semantics).
  * Implemented as codegen'd Catalyst expressions calling the static parser,
  * so the hot path stays inside whole-stage codegen.
  */
object NetFunctions {

  /** Packed bytes for an IP string: 4 bytes for IPv4, 16 for IPv6; null if
    * the string is not a valid IP literal.
    */
  def ipPtonBytes(s: UTF8String): Array[Byte] = {
    if (s == null) return null
    val str = s.toString
    if (str.indexOf(':') >= 0) parseIpv6(str) else parseIpv4(str)
  }

  /** Canonical text for packed IP bytes (inverse of ipPton): dotted quad for
    * 4 bytes, RFC 5952 lowercase-compressed for 16; null for other lengths.
    */
  def ipNtopString(b: Array[Byte]): UTF8String = {
    if (b == null) return null
    b.length match {
      case 4 => UTF8String.fromString(b.map(x => (x & 0xff).toString).mkString("."))
      case 16 =>
        val groups = Array.tabulate(8)(i => ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff))
        // RFC 5952: compress the longest run (>=2) of zero groups, leftmost wins
        var bestStart = -1; var bestLen = 0; var i = 0
        while (i < 8) {
          if (groups(i) == 0) {
            var j = i
            while (j < 8 && groups(j) == 0) j += 1
            if (j - i > bestLen) { bestStart = i; bestLen = j - i }
            i = j
          } else i += 1
        }
        val sb = new StringBuilder
        if (bestLen >= 2) {
          var k = 0
          while (k < bestStart) { if (k > 0) sb += ':'; sb ++= groups(k).toHexString; k += 1 }
          sb ++= "::"
          k = bestStart + bestLen
          var first = true
          while (k < 8) { if (!first) sb += ':'; sb ++= groups(k).toHexString; first = false; k += 1 }
        } else {
          sb ++= groups.map(_.toHexString).mkString(":")
        }
        UTF8String.fromString(sb.result())
      case _ => null
    }
  }

  private def parseIpv4(str: String): Array[Byte] = {
    val parts = str.split("\\.", -1)
    if (parts.length != 4) return null
    val out = new Array[Byte](4)
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return null
      if (p.length > 1 && p.charAt(0) == '0') return null // no leading zeros
      val v = p.toInt
      if (v > 255) return null
      out(i) = v.toByte
      i += 1
    }
    out
  }

  private def parseIpv6(str: String): Array[Byte] = {
    if (str.isEmpty) return null
    val dcol = str.indexOf("::")
    if (dcol >= 0 && str.indexOf("::", dcol + 1) >= 0) return null // one '::' max
    val (headStr, tailStr) =
      if (dcol >= 0) (str.substring(0, dcol), str.substring(dcol + 2)) else (str, "")
    def groupsOf(part: String): Option[Vector[Int]] = {
      if (part.isEmpty) return Some(Vector.empty)
      val toks = part.split(":", -1)
      if (toks.exists(_.isEmpty)) return None
      var acc = Vector.empty[Int]
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        if (t.indexOf('.') >= 0) {
          // embedded IPv4 tail, only valid as the final token
          if (i != toks.length - 1) return None
          val v4 = parseIpv4(t)
          if (v4 == null) return None
          acc :+= ((v4(0) & 0xff) << 8) | (v4(1) & 0xff)
          acc :+= ((v4(2) & 0xff) << 8) | (v4(3) & 0xff)
        } else {
          if (t.length > 4 || !t.forall(c => Character.digit(c, 16) >= 0)) return None
          acc :+= Integer.parseInt(t, 16)
        }
        i += 1
      }
      Some(acc)
    }
    (groupsOf(headStr), groupsOf(tailStr)) match {
      case (Some(h), Some(t)) =>
        val total = h.length + t.length
        val groups: Vector[Int] =
          if (dcol >= 0) {
            if (total > 7) return null // '::' must stand for >=1 group
            h ++ Vector.fill(8 - total)(0) ++ t
          } else {
            if (total != 8) return null
            h
          }
        val out = new Array[Byte](16)
        var i = 0
        while (i < 8) {
          out(2 * i) = (groups(i) >> 8).toByte
          out(2 * i + 1) = groups(i).toByte
          i += 1
        }
        out
      case _ => null
    }
  }

  /** VRL ip_pton: IP string → packed bytes (binary), null on invalid. */
  def ipPton(c: Column): Column = GraftBridge.column(IpPton(GraftBridge.expression(c)))

  /** VRL ip_ntop: packed bytes → canonical IP string, null on invalid. */
  def ipNtop(c: Column): Column = GraftBridge.column(IpNtop(GraftBridge.expression(c)))

  /** VRL is_ipv6: true iff the string parses as an IPv6 literal. Reuses the
    * real parser, so compressed forms and IPv4-mapped tails are exact —
    * not a regex approximation.
    */
  def isIpv6(c: Column): Column =
    coalesce(length(ipPton(c)) === 16, lit(false))
}

/** String IP literal → packed network-order bytes; null for invalid input. */
case class IpPton(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"ip_pton expects string, got $other")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "ip_pton"

  override def nullSafeEval(input: Any): Any =
    NetFunctions.ipPtonBytes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.NetFunctions.ipPtonBytes($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Packed IP bytes → canonical text form; null for invalid length. */
case class IpNtop(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"ip_ntop expects binary, got $other")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "ip_ntop"

  override def nullSafeEval(input: Any): Any =
    NetFunctions.ipNtopString(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.NetFunctions.ipNtopString($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
