package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** WordPiece tokenizer TRAINING + ENCODE (Schuster & Nakajima 2012; the
  * BERT tokenizer recipe) — the third published tokenizer family next to
  * [[Bpe]] (greedy pair-count merges) and [[Unigram]] (likelihood-pruned
  * vocabulary): WordPiece merges like BPE but picks each round's pair by
  * LIKELIHOOD GAIN, score(a,b) = count(ab) / (count(a) · count(b)), and
  * encodes with greedy longest-match-first against the final vocabulary
  * (no merge replay), marking non-word-initial pieces with the published
  * `##` continuation prefix and mapping words with no vocabulary path to
  * `[UNK]`.
  *
  * EXACT-ARITHMETIC VARIANT (the repo's oracle discipline; deviations
  * from float practice are deliberate and documented):
  *
  *  - The score comparison is INTEGER: score_q = (cnt · 10¹⁸) div
  *    (cnt_l · cnt_r), one exact floor division per candidate pair —
  *    both engines reproduce it bit for bit (Spark `div` over
  *    DECIMAL(38,0), DuckDB HUGEINT `//`). cnt ≤ min(cnt_l, cnt_r)
  *    bounds the quotient by 10¹⁸ (Long-safe), and the numerator
  *    cnt · 10¹⁸ stays inside DECIMAL(38)/HUGEINT up to corpus pair
  *    counts of 10²⁰ — far past any real corpus. True scores closer
  *    than 10⁻¹⁸ quantize equal and fall to the deterministic
  *    (score DESC, cnt DESC, l, r) tie-break — the [[Unigram]]
  *    quantized-basis precedent.
  *  - The `##` convention carries the published ambiguity: a corpus
  *    word literally beginning "##" produces word-initial pieces that
  *    collide with continuation-marked pieces (BERT vocab files share
  *    exactly this property). Both engines resolve it identically, so
  *    the oracle gate is unaffected.
  *
  * Scale shape (the [[Bpe.trainBpe]] convention): the corpus collapses
  * to the distinct-pretoken frequency table once; every round is one
  * slim symbol-count aggregation plus one pair-count aggregation over
  * that table (symbol/pair tables are alphabet-sized — broadcast joins),
  * and the model is driver-sized by construction. Encoding is a pure
  * codegen'd projection: the vocabulary rides the plan as a map literal
  * and the greedy scan is ONE `aggregate` HOF over character positions
  * (linear expression tree — the [[Unigram.viterbiSegment]] lesson).
  */
object WordPiece {

  /** Fixed-point basis of the quantized pair scores (floor division). */
  val ScoreScale = "1000000000000000000" // 10^18

  /** One learned merge: at `round`, (left, right) maximized the
    * quantized likelihood score; `fused` = left + right-without-##.
    */
  final case class WpMerge(round: Int, left: String, right: String,
      fused: String, cnt: Long, score: Long)

  /** A trained model: the merge table plus the word-initial/continuation
    * single-character alphabet it grew from (the encode vocabulary is
    * `singles ++ merges.map(_.fused)`).
    */
  final case class WpModel(singles: Seq[String], merges: Seq[WpMerge]) {
    def vocab: Seq[String] = singles ++ merges.map(_.fused)
  }

  /** Position-aware round-0 symbols: first character plain, every later
    * character `##`-prefixed — the WordPiece in-word state (1-based
    * char positions, identical in any engine).
    */
  def initialSymbols(tok: Column): Column =
    transform(sequence(lit(1), length(tok)), i =>
      when(i === 1, tok.substr(i, lit(1)))
        .otherwise(concat(lit("##"), tok.substr(i, lit(1)))))

  /** The continuation marker stripped — for building a merge's fused
    * symbol (the right side of an adjacent pair is always `##`-marked
    * by the in-word invariant, but strip defensively).
    */
  private def stripCont(s: String): String =
    if (s.startsWith("##")) s.substring(2) else s

  /** Apply ONE learned merge to a symbol array: every adjacent
    * (l, r) occurrence fuses to `fused` (= l + r-without-##), left to
    * right, non-overlapping — [[Bpe.applyMerge]]'s fold with the
    * continuation-marker algebra.
    */
  def applyMerge(syms: Column, m: WpMerge): Column =
    aggregate(syms, lit(Array.empty[String]), (acc, s) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(m.left) && s === lit(m.right),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(m.fused))))
        .otherwise(concat(acc, array(s))))

  /** Train `rounds` WordPiece merges over a (tok, freq) pretoken table.
    * Per round: frequency-weighted symbol counts and adjacent-pair
    * counts over the current symbol arrays, the quantized-score argmax
    * with the deterministic (score DESC, cnt DESC, l, r) tie-break,
    * then the merge applied everywhere. Pair and symbol tables are
    * alphabet-sized, so the scoring join broadcasts; the vocabulary
    * carries a lazy localCheckpoint materialized by the round's argmax
    * (the [[Bpe.trainBpe]] one-job-per-round shape).
    */
  def trainWordPiece(pretokens: DataFrame, rounds: Int): WpModel = {
    require(rounds >= 1)
    var vocab = pretokens
      .select(col("tok"), col("freq").cast("long").as("freq"),
        initialSymbols(col("tok")).as("syms"))
      .localCheckpoint(false)
    val singles = vocab
      .select(explode(col("syms")).as("sym"))
      .groupBy(col("sym")).agg(count(lit(1)).as("__n"))
      .orderBy(col("sym"))
      .collect().map(_.getString(0)).toSeq
    val merges = Seq.newBuilder[WpMerge]
    var round = 0
    var exhausted = false
    while (round < rounds && !exhausted) {
      round += 1
      val symCounts = vocab
        .select(col("freq"), explode(col("syms")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("freq")).as("c"))
      val pairCounts = vocab.filter(size(col("syms")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(0), size(col("syms")) - 2), i =>
            struct(element_at(col("syms"), i + 1).as("l"),
              element_at(col("syms"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
      val top = pairCounts
        .join(broadcast(symCounts.select(col("sym").as("l"),
          col("c").as("cl"))), "l")
        .join(broadcast(symCounts.select(col("sym").as("r"),
          col("c").as("cr"))), "r")
        .withColumn("score", expr(
          s"cast(cnt as decimal(38,0)) * cast('$ScoreScale' as decimal(38,0))" +
            " div (cast(cl as decimal(38,0)) * cast(cr as decimal(38,0)))"))
        .orderBy(col("score").desc, col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // every pretoken fully fused
      else {
        val r = top(0)
        val (l, rr) = (r.getAs[String]("l"), r.getAs[String]("r"))
        val m = WpMerge(round, l, rr, l + stripCont(rr),
          r.getAs[Long]("cnt"), r.getAs[Long]("score"))
        merges += m
        val next = vocab
          .withColumn("syms", applyMerge(col("syms"), m))
          .localCheckpoint(false)
        vocab.unpersist(false)
        vocab = next
      }
    }
    vocab.unpersist(false)
    WpModel(singles, merges.result())
  }

  /** Greedy longest-match-first encode of a (tok, freq) pretoken table
    * against a FROZEN vocabulary (the published WordPiece encode — no
    * merge replay): at each position take the longest vocabulary piece
    * (word-initial plain, continuation `##`-marked); a word with no
    * path maps whole to `[UNK]` (the BERT behavior). One `aggregate`
    * HOF over character positions with a (pos, seg) struct state; the
    * vocabulary rides the plan as a map literal. `maxPieceChars` bounds
    * the per-position probe — pass the model's longest raw piece (for
    * an R-round model that is at most R + 1).
    *
    * Returns (tok, freq, seg, n_pieces, is_unk).
    */
  def encodeGreedy(pretokens: DataFrame, vocab: Seq[String],
      maxPieceChars: Int): DataFrame = {
    require(vocab.nonEmpty, "empty vocabulary")
    require(maxPieceChars >= 1)
    // distinct: a trained vocab CAN repeat a string — a corpus word
    // literally starting "##" puts its full form in `singles` while a
    // merge can fuse to the same string — and a duplicate key in the map
    // literal throws at runtime under the default EXCEPTION dedup policy
    val mapLit = map(vocab.distinct.flatMap(p => Seq(lit(p), lit(1))): _*)
    val tok = col("tok")
    val init = struct(lit(1).as("pos"),
      lit(null).cast(StringType).as("seg"))
    val fin = aggregate(
      sequence(lit(1), length(tok)),
      init,
      (st, i) => {
        val pos = st.getField("pos")
        val seg = st.getField("seg")
        val prefix = when(i === 1, lit("")).otherwise(lit("##"))
        val cands = (1 to maxPieceChars).map { k =>
          when(i + lit(k) - 1 <= length(tok) &&
            try_element_at(mapLit,
              concat(prefix, tok.substr(i, lit(k)))).isNotNull, lit(k))
        }
        val bestK = if (cands.size == 1) cands.head else greatest(cands: _*)
        val piece = concat(prefix, tok.substr(i, bestK))
        // positions the previous match already consumed pass through;
        // pos −1 is the dead (UNK) state and never equals a position
        when(i =!= pos, st)
          .otherwise(when(bestK.isNotNull,
            struct((i + bestK).as("pos"),
              concat_ws(" ", seg, piece).as("seg")))
            .otherwise(struct(lit(-1).as("pos"),
              lit(null).cast(StringType).as("seg"))))
      })
    val ok = fin.getField("pos") === length(tok) + 1
    pretokens
      .select(tok, col("freq").cast("long").as("freq"),
        when(ok, fin.getField("seg")).otherwise(lit("[UNK]")).as("seg"),
        when(ok, size(split(fin.getField("seg"), " ")))
          .otherwise(lit(1)).cast("long").as("n_pieces"),
        (!ok).as("is_unk"))
  }

  /** Encode with a trained model (the apply half): greedy
    * longest-match-first against `model.vocab`, probe width = the
    * model's longest raw piece.
    */
  def encodeWordPiece(pretokens: DataFrame, model: WpModel): DataFrame = {
    val maxRaw = model.vocab
      .map(p => if (p.startsWith("##")) p.length - 2 else p.length)
      .foldLeft(1)(math.max)
    encodeGreedy(pretokens, model.vocab, maxRaw)
  }
}
