package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction and index-shaped retrieval.
  *
  * The reference exposes its lake to search engines (Athena/Trino full-text
  * predicates over the flattened view); a training-data pipeline needs the
  * same capability natively — term→postings for corpus search, phrase
  * queries for boilerplate mining and contamination lookups.
  *
  * Scale design (the 100 TB story):
  *   - postings are ONE posexplode + hash shuffle on the term. Payload is
  *     (term, doc, pos) — document bodies never move. At 100 TB the index
  *     build is the same shape as a word-count: pure map then one exchange,
  *     with map-side combine on the stats aggregate.
  *   - phrase search never materializes the full index: the phrase frame
  *     (a handful of rows) broadcast-joins against the postings, so the
  *     scan keeps only matching terms' postings (predicate on the join key
  *     — a Bloom/DPP-prunable pattern on a term-bucketed index table), and
  *     match detection is a groupBy on (doc, start) of the few surviving
  *     rows. No self-join of the corpus, no positions array blowup.
  *   - the phrase-match rule (count distinct ordinals == phrase length at a
  *     common start offset) is pure integer arithmetic → oracle-exact.
  */
object InvertedIndex {

  /** Shared tokenized frame: (doc, tk). Tokenizing is the dominant map
    * cost of the index/span family — queries that need both postings AND
    * shingle/span derivations should build ONE of these, persist it for
    * the query's lifetime, and derive every consumer from it instead of
    * re-tokenizing the corpus per consumer (the q104/q110 double-scan).
    */
  def tokenized(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc"), tokens(col(textCol)).as("tk"))

  /** Token postings from a [[tokenized]] frame: one row per
    * (term, doc, pos), positions 1-based in token space.
    */
  def postingsFromTokens(tok: DataFrame): DataFrame =
    // posexplode_outer + isNotNull keeps any token derivation out of the
    // inferred pre-Generate filter (the generator-pushdown trap,
    // Curation.scala:92)
    tok.select(col("doc"), posexplode_outer(col("tk")))
      .filter(col("col").isNotNull)
      .select(col("col").as("term"), col("doc"), (col("pos") + 1).as("pos"))

  /** Token postings straight from a corpus frame (single-consumer path —
    * multi-consumer queries should share a persisted [[tokenized]] frame).
    */
  def postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    postingsFromTokens(tokenized(df, idCol, textCol))

  /** Per-term index statistics: document frequency, collection frequency,
    * and the doc-id span of the posting list. One exchange on the term with
    * partial aggregation map-side — the canonical index-build job.
    */
  def indexStats(post: DataFrame): DataFrame =
    post.groupBy(col("term"))
      .agg(
        countDistinct(col("doc")).as("df_docs"),
        count(lit(1)).as("cf"),
        min(col("doc")).as("min_doc"),
        max(col("doc")).as("max_doc"))

  /** Term frequencies per (term, doc): the scoring-side view of the index
    * (one exchange; rows are already distinct docs per term, so document
    * frequency is a plain count over this frame).
    */
  def termFrequencies(post: DataFrame): DataFrame =
    post.groupBy(col("term"), col("doc")).agg(count(lit(1)).as("tf"))

  /** Phrase occurrences via the inverted index: `phrase` is a frame of
    * (ord, term) with ord 0..k-1 in phrase order. A posting (doc, pos) for
    * the ord'th term anchors a candidate start at pos − ord; a start where
    * ALL k ordinals appear is a phrase occurrence. Returns (doc, start).
    *
    * The phrase frame is tiny → broadcast; only postings of the phrase's
    * terms survive the join. Counting distinct ordinals (not rows) keeps a
    * phrase with repeated terms correct: "the the" at start s needs term
    * "the" at both s and s+1, each matching a different ordinal.
    */
  def phraseMatches(post: DataFrame, phrase: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "phraseMatches needs phrase length k >= 1")
    post.join(broadcast(phrase), "term")
      .select(col("doc"), (col("pos") - col("ord")).as("start"), col("ord"))
      .filter(col("start") >= 1)
      .groupBy(col("doc"), col("start"))
      .agg(countDistinct(col("ord")).as("__k"))
      .filter(col("__k") === k)
      .select(col("doc"), col("start"))
  }
}
