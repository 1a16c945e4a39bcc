package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link analysis (PageRank) in EXACT INTEGER arithmetic — the
  * graph-centrality step of corpus curation (rank documents by how
  * connected they are inside the near-dup/similarity graph; the classic
  * use is picking authoritative representatives and spotting template
  * farms, which show up as dense high-rank clusters).
  *
  * Ranks are fixed-point BIGINTs (unit = `scale`): one round is
  *
  *   r'(v) = (3·scale) div 20  +  (17 · Σ_{u→v} (r(u) div deg(u))) div 20
  *
  * i.e. damping 0.85 as the exact rational 17/20 with truncating integer
  * division — every engine reproduces the ranks bit for bit (the same
  * no-libm discipline as the q128 perceptron; all values positive, so
  * truncation ≡ floor in Spark and DuckDB alike).
  *
  * Scale shape: the edge list (with out-degree stapled on) materializes
  * ONCE and is the only corpus-sized frame; each round is one join of
  * slim (id, rank) rows against it — both hashed on the source id, so
  * they co-partition after the first exchange — and one dst-keyed sum.
  * Driver holds nothing; rounds are O(E) linear passes, the
  * duplicateClusters loop contract.
  */
object LinkRank {

  /** `nodes`: one `id` column; `edges`: directed (src, dst) — pass both
    * orientations for an undirected similarity graph. Returns one row
    * per node: (id, degree, rank) after `rounds` iterations from a flat
    * start of `scale` per node. Dangling nodes redistribute nothing
    * (standard simplification; their rank decays to the teleport term).
    *
    * Overflow safety: total rank mass never exceeds n·scale (damping
    * only shrinks it), so the largest intermediate is 17·Σ ≤ 17·n·scale.
    * That product must stay below Long.MaxValue — enforced with a
    * require against the actual node count (one bounded count job), so
    * a hub node aggregating a large in-neighborhood can never wrap
    * negative silently under non-ANSI Spark. The default scale (1e6,
    * i.e. micro-rank fixed point) leaves room for ~5·10¹¹ nodes;
    * truncation error per division is ≤ 1/scale relative.
    */
  def integerPageRank(nodes: DataFrame, edges: DataFrame, rounds: Int,
      scale: Long = 1000000L): DataFrame = {
    require(rounds >= 1 && scale >= 1000, s"need rounds >= 1; got $rounds")
    val n = nodes.count()
    require(n > 0 && scale <= Long.MaxValue / 17 / math.max(n, 1L),
      s"17 * n * scale must fit in a Long: n=$n, scale=$scale — lower scale")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // the loop's only corpus-sized frame, materialized once (see
    // Dedup.duplicateClusters for the same contract)
    val ed = edges.join(deg, "src").localCheckpoint(true)
    // NO per-round checkpoints (r21): unlike duplicateClusters, whose
    // convergence probe fires an ACTION every round (and therefore
    // needs each round pinned), this loop runs a FIXED round count
    // with one terminal action — the rounds unroll into one plan whose
    // exchanges each materialize exactly once, and the per-round
    // checkpoint jobs were pure dispatch floor (~2 jobs/round).
    var ranks = nodes.select(col("id"), lit(scale).as("rank"))
    for (_ <- 1 to rounds) {
      val contrib = ed.join(ranks, ed("src") === ranks("id"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("c"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (expr(s"${3L * scale} div 20") +
            expr("(17 * coalesce(c, 0)) div 20")).as("rank"))
    }
    ranks.join(deg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("degree"),
        col("rank"))
  }
}
