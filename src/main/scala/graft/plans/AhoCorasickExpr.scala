package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd multi-pattern dictionary scan — the Aho-Corasick automaton
  * (Aho & Corasick 1975, "Efficient string matching: an aid to
  * bibliographic search"): ONE pass over the text finds every dictionary
  * term occurring as a substring, at cost O(text + matches) INDEPENDENT
  * of dictionary size. This is the published shape of the curation
  * steps that scan against large term lists — blocklist filtering (the
  * C4 bad-words gate at real list sizes), PII trigger terms, taxonomy /
  * topic tagging — where the naive per-term `contains` pass is
  * O(terms × text) and stops being viable around a few hundred terms.
  *
  * Semantics: returns the SORTED DISTINCT indices (into the constructor
  * dictionary) of every term with at least one substring occurrence —
  * exactly `terms.filter(text.contains)`, which is what the oracle
  * re-derives naively; matching is case-sensitive (callers lower both
  * sides for the case-insensitive gates, the q173 convention).
  *
  * Shape: the dictionary ships inside the expression (one copy per task
  * binary, like any literal); the automaton — goto trie, BFS failure
  * links with path compression into the transition maps, output-link
  * chains — builds lazily ONCE per executor JVM and is immutable
  * thereafter; the scan is a straight method call inside whole-stage
  * codegen (the [[BloomMightContain]] reference-object pattern — no UDF,
  * no boxing beyond the UTF8String↔String crossing the JDK char walk
  * forces).
  */
case class DictionaryMatches(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  require(terms.nonEmpty, "dictionary_matches needs at least one term")
  require(terms.forall(_.nonEmpty), "dictionary terms must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dictionary_matches expects string, got ${child.dataType}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "dictionary_matches"

  @transient private lazy val automaton = AhoCorasick.cached(terms)

  /** Public: called from generated code. */
  def matchedIds(s: UTF8String): ArrayData =
    new GenericArrayData(automaton.search(s.toString))

  override def nullSafeEval(input: Any): Any =
    matchedIds(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dictionaryMatches", this)
    defineCodeGen(ctx, ev, c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.matchedIds($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): DictionaryMatches =
    copy(child = newChild)
}

object DictionaryMatches {
  def apply(text: Column, terms: Seq[String]): Column =
    GraftBridge.column(DictionaryMatches(GraftBridge.expression(text), terms))
}

/** The classic automaton in frozen form — ONLY the scan-time arrays live
  * on the instance (the mutable build structures are scoped to
  * [[AhoCorasick.build]], so a large dictionary doesn't pin a dead
  * duplicate trie of boxed maps on every executor). Nodes store goto
  * maps (char → node), a failure link, and the matched term ids ending
  * at the node; the BFS folds every failure chain's outputs into its
  * node (output links flattened), so the scan touches one output array
  * per character — no chain walk.
  */
private[graft] final class AhoCorasick private (
    nTerms: Int,
    gotoF: Array[java.util.HashMap[Character, Integer]],
    failF: Array[Int],
    outF: Array[Array[Int]]) {

  /** Sorted distinct ids of every term occurring in `text`. */
  def search(text: String): Array[Int] = {
    val hits = new java.util.BitSet(nTerms)
    var node = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val ch = Character.valueOf(text.charAt(i))
      var next = gotoF(node).get(ch)
      while (next == null && node != 0) {
        node = failF(node)
        next = gotoF(node).get(ch)
      }
      node = if (next == null) 0 else next.intValue()
      val o = outF(node)
      var j = 0
      while (j < o.length) { hits.set(o(j)); j += 1 }
      i += 1
    }
    val res = new Array[Int](hits.cardinality())
    var b = hits.nextSetBit(0)
    var k = 0
    while (b >= 0) { res(k) = b; k += 1; b = hits.nextSetBit(b + 1) }
    res
  }
}

private[graft] object AhoCorasick {

  /** JVM-global automaton cache keyed by the dictionary: the expression
    * ships in every task binary (the addReferenceObj pattern) and each
    * deserialized copy would otherwise re-run the O(dictionary) build —
    * per TASK, not per executor. The cache makes the build truly
    * once-per-JVM; automata are immutable after construction, so sharing
    * across concurrently-running tasks is safe.
    *
    * Bounded: a long-lived executor that sees many DISTINCT
    * dynamically-built dictionaries must not retain every automaton (plus
    * its key Seq) forever, so past [[MaxCachedAutomata]] entries the cache
    * evicts single arbitrary entries until under the cap (never a
    * wholesale clear — hot dictionaries stay resident). Automata are
    * rebuildable from their terms, so eviction only costs the
    * O(dictionary) rebuild; the common steady state (a handful of
    * long-lived dictionaries) never overflows.
    */
  private val MaxCachedAutomata = 64

  /** Observability/test hook: total automaton BUILDS in this JVM — the
    * once-per-executor contract made assertable (a 32-partition scan
    * over a fresh dictionary must increment this exactly once).
    */
  private[graft] val builds = new java.util.concurrent.atomic.AtomicInteger(0)

  private val cache =
    scala.collection.concurrent.TrieMap.empty[Seq[String], AhoCorasick]

  def cached(terms: Seq[String]): AhoCorasick = {
    cache.get(terms) match {
      case Some(a) => a
      case None =>
        // racy size check is fine: worst case two threads each evict one
        // entry, and the bound is a hygiene cap, not an exact LRU. Evict
        // ONE arbitrary entry (not clear()): a workload alternating among
        // >64 live dictionaries must not rebuild every hot automaton after
        // each overflow, and concurrent tasks must not wipe each other's
        // just-built entries wholesale.
        while (cache.size >= MaxCachedAutomata)
          cache.headOption match {
            case Some((k, _)) => cache.remove(k)
            case None => // drained concurrently
          }
        cache.getOrElseUpdate(terms, build(terms.toArray))
    }
  }

  private def build(terms: Array[String]): AhoCorasick = {
    builds.incrementAndGet()
    import scala.collection.mutable
    val goto = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val fail = mutable.ArrayBuffer(0)
    val out = mutable.ArrayBuffer(mutable.BitSet.empty)
    // trie
    terms.zipWithIndex.foreach { case (t, i) =>
      var node = 0
      t.foreach { ch =>
        node = goto(node).getOrElseUpdate(ch, {
          goto += mutable.HashMap.empty[Char, Int]
          fail += 0
          out += mutable.BitSet.empty
          goto.length - 1
        })
      }
      out(node) += i
    }
    // failure links, BFS; outputs fold along the chain
    val queue = mutable.Queue.empty[Int]
    goto(0).valuesIterator.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      goto(u).foreach { case (ch, v) =>
        // textbook: walk u's failure chain to the deepest proper-suffix
        // node with a ch-transition; v's failure target is that child
        // (root when none). The target is strictly shallower than v, so
        // cand == v is impossible; the guard is belt-and-braces.
        var f = fail(u)
        while (f != 0 && !goto(f).contains(ch)) f = fail(f)
        val cand = goto(f).getOrElse(ch, 0)
        fail(v) = if (cand == v) 0 else cand
        out(v) |= out(fail(v))
        queue += v
      }
    }
    // freeze: only these arrays survive onto the instance
    val gotoF = goto.map { m =>
      val h = new java.util.HashMap[Character, Integer](m.size * 2)
      m.foreach { case (k, v) => h.put(k, v) }
      h
    }.toArray
    new AhoCorasick(terms.length, gotoF, fail.toArray,
      out.map(_.toArray.sorted).toArray)
  }
}
