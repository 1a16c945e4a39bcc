package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoders, ExpressionEncoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-state uniform sampling — fixed-SIZE per-group samples at scale.
  *
  * q60's stratified sampler keeps a fixed RATE per stratum; the other
  * sampling shape a curation pipeline needs is a fixed SIZE per group
  * ("at most k docs per source/domain" — the classic per-domain quota of
  * web-corpus recipes). The scalable form is bottom-k-by-hash: hash every
  * id with a fixed function, keep the k smallest hashes per group. That
  * is a uniform sample without replacement, it is DETERMINISTIC (same
  * rows every run, any engine — the oracle re-derives exact membership by
  * sorting on the same md5), and it is MERGEABLE: bottom-k of a union is
  * the bottom-k of the partials' bottom-k's, so each partition folds into
  * a k-sized heap and partials merge associatively — O(k) state per group
  * where a window row_number pays a full per-group sort shuffle of every
  * row. Same union trick also gives consistent samples across tables
  * (equal ids hash equally).
  */
object Sampling {

  /** Max-heap entry ordering on (hash, id) — the heap root is the LARGEST
    * retained element, evicted first when a smaller one arrives.
    */
  private val ord: Ordering[(String, Long)] = Ordering.Tuple2[String, Long]

  /** Typed aggregator: fold (md5-hash, id) pairs into a k-bounded heap,
    * finish with the sampled ids (ascending).
    */
  final case class BottomKByHash(k: Int)
      extends Aggregator[(String, Long), mutable.PriorityQueue[(String, Long)],
        Seq[Long]] {
    require(k >= 1, s"bottomK needs k >= 1, got $k")
    def zero: mutable.PriorityQueue[(String, Long)] =
      mutable.PriorityQueue.empty(ord)
    def reduce(b: mutable.PriorityQueue[(String, Long)],
        a: (String, Long)): mutable.PriorityQueue[(String, Long)] = {
      if (b.size < k) b.enqueue(a)
      else if (ord.lt(a, b.head)) { b.dequeue(); b.enqueue(a) }
      b
    }
    def merge(b1: mutable.PriorityQueue[(String, Long)],
        b2: mutable.PriorityQueue[(String, Long)])
        : mutable.PriorityQueue[(String, Long)] = {
      b2.foreach(a => reduce(b1, a))
      b1
    }
    def finish(r: mutable.PriorityQueue[(String, Long)]): Seq[Long] =
      r.toSeq.map(_._2).sorted
    def bufferEncoder: Encoder[mutable.PriorityQueue[(String, Long)]] =
      Encoders.javaSerialization[mutable.PriorityQueue[(String, Long)]]
    def outputEncoder: Encoder[Seq[Long]] =
      AgnosticEncoders.IterableEncoder(scala.reflect.classTag[Seq[Long]],
        AgnosticEncoders.PrimitiveLongEncoder, containsNull = false,
        lenientSerialization = false)
  }

  /** The sampled-id array as an aggregation column over (hashCol, idCol). */
  def bottomKAgg(hash: Column, id: Column, k: Int): Column =
    udaf(BottomKByHash(k), ExpressionEncoder[(String, Long)]())
      .apply(hash, id)

  /** At-most-k uniform sample per group: one exchange of k-sized partials,
    * exploded back to (group, id) rows. Membership = the k smallest
    * md5(id)s per group, so an engine sorting on the same hash reproduces
    * the exact rows.
    */
  def bottomKSample(df: DataFrame, idCol: String, groupCol: String,
      k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(bottomKAgg(md5(col(idCol).cast("string")),
        col(idCol).cast("long"), k).as("__ids"))
      .select(col(groupCol), explode(col("__ids")).as(idCol))
}
