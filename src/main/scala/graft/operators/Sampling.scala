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

  /** Domain-mixture (temperature) resampling — rebalance a corpus toward
    * flattened domain shares, the multilingual/domain-mixing step of
    * published training-data recipes: target share of domain d is
    * sqrt(count_d) / Σ sqrt(count_c) (temperature τ=0.5 — sqrt because
    * IEEE sqrt is correctly rounded, so any engine reproduces the shares
    * bit-for-bit, unlike libm pow), the total budget B is the largest
    * total where no domain's quota exceeds its population
    * (B = min_d count_d / share_d), and membership is deterministic
    * Poisson sampling: keep a row iff the first 8 hex digits of
    * md5(id) fall below floor(rate_d · 2^32) (compared as fixed-width
    * hex strings — equal-length lowercase hex compares like the number).
    *
    * Scale shape: one tiny count aggregation, the per-domain rate frame
    * broadcasts back, and the corpus takes ONE filter pass — bodies never
    * shuffle, no per-domain sort. Float parity: Σ sqrt(count) folds in
    * domain order (the q34/q116 ordered-fold convention), every later
    * step is a single correctly-rounded IEEE op on identical operands.
    */
  /** Optional `weightCol`: measure domain MASS in that column's units
    * (token counts — what published mixing recipes actually balance)
    * instead of document counts. Weights fold as exact long sums, so the
    * rate math stays engine-reproducible; membership is still per-doc, so
    * expected kept mass per domain ∝ its sqrt-flattened share.
    */
  def temperatureResample(df: DataFrame, idCol: String,
      groupCol: String, weightCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // ONE stats job: per-domain counts (bounded by the domain vocabulary —
    // same driver-side class as the centroid frames of q93/q95). All rate
    // math is plain IEEE doubles on the driver: sqrt is correctly rounded,
    // the share normalizer is a sequential left fold in domain order, and
    // every later step is one correctly-rounded op — so Scala here, the
    // array-fold form, and DuckDB's ordered list_sum agree bit-for-bit.
    // rows with a null domain have no defined share — excluded, like a
    // groupBy-join pipeline would exclude them from any keyed rate table.
    // The domain key is normalized to STRING up front: the share fold is
    // defined in string domain order and the rate join is keyed on the
    // string form, so a numeric group column can't silently fold in a
    // different order (or join through implicit casts) than the contract
    // an oracle re-derives.
    val in = df.where(col(groupCol).isNotNull)
      .withColumn(groupCol, col(groupCol).cast("string"))
    val mass = weightCol
      .map(w => sum(col(w).cast("long")))
      .getOrElse(count(lit(1)))
    // CONTRACT: the group column is a language/source/domain-class key —
    // tens to thousands of groups, one slim row each. The guard exists
    // because a caller passing a near-unique column (raw URLs, doc ids)
    // would otherwise collect millions of rows to the driver; that input
    // is a modeling error (per-group shares of singleton groups are
    // meaningless), so fail loudly instead of OOMing quietly.
    val MaxGroups = 1000000
    val counts = in.groupBy(col(groupCol))
      .agg(mass.cast("double").as("__c"))
      .limit(MaxGroups + 1)
      .collect().map(r => (r.get(0).toString, r.getDouble(1))).sortBy(_._1)
    require(counts.nonEmpty, "temperatureResample on an empty frame")
    require(counts.length <= MaxGroups,
      s"temperatureResample: over $MaxGroups distinct '$groupCol' groups — " +
        "the group column must be a domain-class key (language, source), " +
        "not a high-cardinality identifier")
    val s = counts.foldLeft(0.0) { case (acc, (_, c)) => acc + math.sqrt(c) }
    val quotas = counts.map { case (g, c) =>
      val share = math.sqrt(c) / s
      (g, c, share, c / share)
    }
    val budget = quotas.map(_._4).min
    val rates = quotas.map { case (g, c, share, _) =>
      val rate = math.min(1.0, share * budget / c)
      // first-8-hex-digit cutoff: equal-length lowercase hex compares
      // like the number it encodes
      val cut = f"${math.floor(rate * 4294967296.0).toLong}%08x"
      (g, rate, cut)
    }.toSeq
    in.join(broadcast(rates.toDF(groupCol, "__rate", "__cut")), Seq(groupCol))
      .where(col("__rate") >= 1.0 ||
        substring(md5(col(idCol).cast("string")), 1, 8) < col("__cut"))
      .select(col(groupCol), col(idCol))
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): spread a total training budget as UNIFORMLY as
    * possible across languages, subject to a per-language repeat cap —
    * no language contributes more than `epochCap` epochs of its own
    * mass. The published algorithm is a waterfill; this is its exact
    * closed form over languages sorted by capacity: with capacities
    * cap_l = epochCap·n_l ascending (ties → group asc), prefix sums P
    * and L languages, language i SATURATES ⟺
    * cap_i·(L−i+1) ≤ B − P_{i−1} — saturation is provably a prefix of
    * the sort order (if i fails, B−P_i < cap_i·(L−i) ≤ cap_{i+1}·(L−i),
    * so i+1 fails) — and the k saturated languages pay P_k, leaving
    * q = (B−P_k) div (L−k) each for the rest with the remainder going
    * to the first languages in sort order (largest-remainder, total
    * allocation ≡ B exactly). An unsaturated language can never exceed
    * its cap: cap_i·(L−k) > B−P_k ⟹ cap_i ≥ q+1.
    *
    * EVERYTHING is int64 arithmetic — budget = mass·budgetNum div
    * budgetDen, integer floor division and cross-multiplied saturation
    * tests — so the allocation reproduces bit-for-bit in any engine.
    *
    * Output: (group, n_mass, capacity, allocated, capped), one row per
    * group; Σ allocated = min(B, Σ capacity) by construction.
    *
    * Scale shape: one grouped sum over the corpus (map-side combined,
    * bodies never move), then windows over the GROUP-DOMAIN-sized frame
    * (tens to thousands of rows — the unpartitioned window sorts that
    * frame, never the corpus; the q118 group-domain contract).
    */
  def unimaxAllocate(df: DataFrame, groupCol: String, weightCol: String,
      budgetNum: Long, budgetDen: Long, epochCap: Long): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0 && epochCap > 0,
      s"budget fraction and epoch cap must be positive: " +
        s"$budgetNum/$budgetDen, $epochCap")
    import org.apache.spark.sql.expressions.Window
    val counts = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as(groupCol))
      .agg(sum(col(weightCol).cast("long")).as("n_mass"))
      .withColumn("capacity", col("n_mass") * epochCap)
    val wOrd = Window.orderBy(col("capacity"), col(groupCol))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("__t", sum(col("n_mass")).over(wAll))
      .withColumn("__l", count(lit(1)).over(wAll))
      .withColumn("__i", row_number().over(wOrd).cast("long"))
      .withColumn("__pfx", sum(col("capacity")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__b", expr(s"__t * $budgetNum div $budgetDen"))
      .withColumn("capped",
        col("capacity") * (col("__l") - col("__i") + 1L) <=
          col("__b") - (col("__pfx") - col("capacity")))
      .withColumn("__k", sum(when(col("capped"), 1L).otherwise(0L)).over(wAll))
      .withColumn("__pk",
        sum(when(col("capped"), col("capacity")).otherwise(0L)).over(wAll))
      // greatest(1, L−k) keeps the div total under ANSI when everything
      // saturates (the quotient is unused on that branch)
      .withColumn("__q",
        expr("(__b - __pk) div greatest(1L, __l - __k)"))
      .withColumn("__r",
        expr("(__b - __pk) % greatest(1L, __l - __k)"))
      .withColumn("allocated",
        when(col("capped"), col("capacity"))
          .otherwise(col("__q") +
            when(col("__i") - col("__k") <= col("__r"), 1L).otherwise(0L)))
      .select(col(groupCol), col("n_mass"), col("capacity"),
        col("allocated"), col("capped"))
  }

  /** APPLY a [[unimaxAllocate]] budget — the selection step that turns
    * the per-group character allocation into an actual corpus subset
    * (Chung et al. 2023 §3.2 samples each language to its UniMax budget;
    * this is that draw made deterministic): within each group, rows take
    * the budget in md5-hash order (the [[bottomKSample]] convention — a
    * uniform, reproducible, extension-stable order) and a row survives
    * iff its INCLUSIVE running weight still fits the group's allocation.
    * Exact int64 arithmetic throughout; re-running on the same corpus —
    * or any engine — reproduces the identical subset.
    *
    * Returns the kept rows only: (group, id, weight, cum_weight). A
    * group's kept mass is the largest hash-prefix sum ≤ its allocation
    * (an epoch-capped group keeps everything: cum ≤ mass ≤ capacity).
    *
    * Scale shape: only (group, id, weight) tuples move — one running-sum
    * window per group (a group-partitioned sort of slim tuples, the
    * [[graft.operators.Curation.tokenBudgetSelect]] posture) and a
    * broadcast of the group-domain-sized allocation frame. Bodies never
    * shuffle; the kept-id set joins back to bodies downstream by id.
    * KNOWN CEILING, shared with the whole per-group running-sum family:
    * one group's slim tuples sort in one window task, so at the scale
    * where a single language's (id, weight) pairs stop fitting a task
    * (~10⁹ rows), swap the window for the two-pass scan (range-sort by
    * (group, hash, id), per-partition partials, broadcast the
    * partition-prefix offsets — the q145/q177 contiguous-range
    * discipline, with sums in place of ranks).
    */
  def unimaxTake(df: DataFrame, idCol: String, groupCol: String,
      weightCol: String, alloc: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(groupCol).cast("string").as(groupCol), col(idCol),
        col(weightCol).cast("long").as(weightCol))
      .withColumn("cum_weight", sum(col(weightCol)).over(w))
      .join(broadcast(alloc.select(col(groupCol).cast("string").as(groupCol),
        col("allocated"))), Seq(groupCol))
      .filter(col("cum_weight") <= col("allocated"))
      .select(col(groupCol), col(idCol), col(weightCol), col("cum_weight"))
  }

  /** EPOCH-REPEAT schedule — the artifact a trainer actually consumes
    * when [[unimaxAllocate]] runs with `epochCap` > 1 (Chung et al. 2023
    * train each language for UP TO its epoch cap; a multi-epoch
    * allocation is consumed as whole-corpus repeats plus one partial
    * pass): per group, the allocation factors exactly into
    *
    *  - `n_full_epochs` = allocated div n_mass — whole-corpus repeats
    *    (≤ epochCap by construction, = epochCap for capped groups);
    *  - `partial_target` = allocated mod n_mass — the leftover mass,
    *    taken as ONE deterministic hash-order prefix (the [[unimaxTake]]
    *    convention: uniform, reproducible, extension-stable), reported
    *    as `partial_docs` / `partial_mass` (largest prefix with
    *    inclusive running weight ≤ the target).
    *
    * Exact int64 throughout; Σ consumed = n_full_epochs·n_mass +
    * partial_mass ≤ allocated, with the shortfall < the first excluded
    * document's weight (prefix-take semantics). Zero-mass groups guard
    * the division (greatest(1, n_mass)) and schedule nothing.
    *
    * Scale shape: the schedule derives from the group-domain-sized
    * allocation frame (broadcast); the partial prefix is [[unimaxTake]]'s
    * slim-tuple per-group running-sum window; bodies never move.
    */
  def unimaxEpochSchedule(df: DataFrame, idCol: String, groupCol: String,
      weightCol: String, alloc: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sched = alloc
      .select(col(groupCol).cast("string").as(groupCol), col("n_mass"),
        col("allocated"))
      .withColumn("n_full_epochs",
        expr("allocated div greatest(1L, n_mass)"))
      .withColumn("partial_target",
        expr("allocated % greatest(1L, n_mass)"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // join the (broadcast, group-domain) targets BEFORE the window and
    // drop zero-target groups first: with a high epoch cap most groups
    // saturate, and their docs must not pay the md5 sort + running sum
    // just to be filtered — the window runs only over groups that
    // actually take a partial pass
    val partialTargets = sched
      .filter(col("partial_target") > 0)
      .select(col(groupCol), col("partial_target"))
    val partial = df
      .select(col(groupCol).cast("string").as(groupCol),
        col(idCol), col(weightCol).cast("long").as("__w"))
      .join(broadcast(partialTargets), Seq(groupCol))
      .withColumn("__cum", sum(col("__w")).over(w))
      .filter(col("__cum") <= col("partial_target"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("partial_docs"), sum(col("__w")).as("partial_mass"))
    sched.join(partial, Seq(groupCol), "left")
      .select(col(groupCol), col("n_mass"), col("allocated"),
        col("n_full_epochs"), col("partial_target"),
        coalesce(col("partial_docs"), lit(0L)).as("partial_docs"),
        coalesce(col("partial_mass"), lit(0L)).as("partial_mass"))
  }

  /** EMIT the epoch schedule — [[unimaxEpochSchedule]] ships the ledger;
    * this ships the membership a trainer iterates: one (group, epoch,
    * id, weight) row per scheduled occurrence. Epochs 0 ..
    * n_full_epochs−1 each contain the ENTIRE group (whole-corpus
    * repeats — a capped group appears exactly epochCap times); epoch
    * n_full_epochs, present only when the allocation has a remainder,
    * is the deterministic hash-order prefix (the [[unimaxTake]]
    * convention — the partial epoch of a bigger budget EXTENDS the
    * partial epoch of a smaller one).
    *
    * Scale shape: slim (group, id, weight) tuples explode by the
    * epoch count (≤ epochCap — the inherent emission multiplicity);
    * the partial prefix pays [[unimaxTake]]'s per-group running-sum
    * window only over groups that actually take one. Bodies never
    * move — join them back by id downstream (or via
    * [[unimaxEpochPackPayloads]], which packs them per epoch).
    */
  def unimaxEpochEmission(df: DataFrame, idCol: String, groupCol: String,
      weightCol: String, alloc: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sched = alloc
      .select(col(groupCol).cast("string").as(groupCol), col("n_mass"),
        col("allocated"))
      .withColumn("n_full_epochs",
        expr("allocated div greatest(1L, n_mass)"))
      .withColumn("partial_target",
        expr("allocated % greatest(1L, n_mass)"))
    val slim = df.select(col(groupCol).cast("string").as(groupCol),
      col(idCol), col(weightCol).cast("long").as(weightCol))
    val full = slim
      .join(broadcast(sched.filter(col("n_full_epochs") > 0)
        .select(col(groupCol), col("n_full_epochs"))), Seq(groupCol))
      .select(col(groupCol), col(idCol), col(weightCol),
        explode(sequence(lit(0L), col("n_full_epochs") - 1L)).as("epoch"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val partial = slim
      .join(broadcast(sched.filter(col("partial_target") > 0)
        .select(col(groupCol), col("n_full_epochs"), col("partial_target"))),
        Seq(groupCol))
      .withColumn("__cum", sum(col(weightCol)).over(w))
      .filter(col("__cum") <= col("partial_target"))
      .select(col(groupCol), col(idCol), col(weightCol),
        col("n_full_epochs").as("epoch"))
    full.unionByName(partial)
  }

  /** The multi-epoch TRAINING ORDER as one readable table: epoch
    * membership ([[unimaxEpochEmission]]) composed into per-epoch pack
    * payloads ([[graft.operators.Curation.packPayloads]] semantics, the
    * q182→q190 manifest/payload split) — per (group, epoch, pack): doc
    * count, token total, and the member texts concatenated in pack
    * order. Packing is PER (group, epoch), so an epoch boundary never
    * splits a pack and every full epoch of a group packs identically.
    *
    * Scale shape: membership is slim-tuple work; bodies join back by id
    * ONCE and ride one shuffle to their (group, epoch, pack) group —
    * multiplied by the epoch count, which is the artifact's inherent
    * size (a trainer reads every repeat).
    */
  /** Hashed-feature importance-ratio selection — the LINEAR-SPACE INTEGER
    * SURROGATE of DSIR, shipped under an honest name: this is NOT DSIR
    * (Xie et al. 2023). DSIR weights docs by a SUM OF LOG-ratios of
    * hashed-n-gram probabilities and resamples with Gumbel noise; `ln`
    * is not correctly-rounded across engines (the repo's oracle
    * discipline bans transcendentals — see SURVEY §2.9's DSIR note for
    * why the quantized-basis trick that rescued unigram-LM does not
    * apply), and random resampling breaks determinism. The surrogate
    * keeps DSIR's structure — hashed token features, a target-vs-raw
    * frequency ratio per feature, per-doc accumulation, top-k selection
    * — but scores in LINEAR space with exact integer arithmetic:
    *
    *   w_f   = (t_f · R · scale) div (r_f · T)   [DECIMAL(38) products]
    *   score = Σ_{token occurrences} w_{feature(token)}
    *
    * and selects the top `k` docs by (score DESC, id ASC) — the no-rand
    * discipline in place of Gumbel. Linear-space accumulation weights
    * high-ratio features more aggressively than DSIR's log-space sum —
    * a DIFFERENT estimator with the same selection intent.
    *
    * Scale shape: the feature table is bucket-domain-sized (`buckets`
    * rows) → broadcasts; scoring is one map-side join over exploded
    * (doc, feature) tokens plus a per-doc sum (one slim shuffle); the
    * top-k is a TakeOrdered. Bodies never move.
    */
  def importanceResampleIntSurrogate(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, buckets: Int, scale: Long,
      k: Int): DataFrame = {
    require(buckets > 0 && scale > 0 && k > 0,
      s"buckets/scale/k must be positive: $buckets/$scale/$k")
    import graft.functions.TextFunctions
    def feats(df: DataFrame, cols: Column*): DataFrame = df
      .select(cols :+
        explode_outer(TextFunctions.tokens(col(textCol))).as("__tok"): _*)
      .filter(col("__tok").isNotNull)
      .withColumn("__f", Curation.hashBucket(col("__tok"), buckets))
    val tf = feats(target).groupBy(col("__f"))
      .agg(count(lit(1)).as("__t"))
      .localCheckpoint(true) // feeds the total AND the weight table
    val bigT = math.max(1L, tf.agg(sum(col("__t"))).head.getLong(0))
    val rawFeats = feats(raw, col(idCol))
      .localCheckpoint(true) // feeds the totals AND the scoring join
    val rf = rawFeats.groupBy(col("__f"))
      .agg(count(lit(1)).as("__r"))
      .localCheckpoint(true)
    val bigR = math.max(1L, rf.agg(sum(col("__r"))).head.getLong(0))
    // per-feature integer weight: DECIMAL(38) cross-products (the q165
    // HUGEINT-parity posture — int64 would wrap at web-scale counts),
    // one exact floor division; features absent from the target weigh 0
    val w = rf.join(tf, Seq("__f"), "left")
      .select(col("__f"), expr(
        s"cast((cast(coalesce(__t, 0L) as decimal(38,0)) * ${bigR}L * " +
          s"${scale}L) div (cast(__r as decimal(38,0)) * ${bigT}L) " +
          "as bigint)").as("__w"))
    rawFeats.join(broadcast(w), Seq("__f"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__w")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  def unimaxEpochPackPayloads(df: DataFrame, idCol: String,
      groupCol: String, weightCol: String, textCol: String,
      alloc: DataFrame, packBudget: Long): DataFrame = {
    val em = unimaxEpochEmission(df, idCol, groupCol, weightCol, alloc)
      .join(df.select(col(idCol), col(textCol)), Seq(idCol))
      .withColumn("__stratum",
        concat(col(groupCol), lit("#"), col("epoch").cast("string")))
    Curation.packByBudget(em, idCol, weightCol, packBudget,
        "__stratum", idCol)
      .groupBy(col(groupCol), col("epoch"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(weightCol)).as("total_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(idCol), col(textCol)))),
            x => x(textCol)),
          "\n").as("payload"))
  }
}
