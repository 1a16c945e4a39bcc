package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as a distributed iterative job —
  * the model-side counterpart of [[graft.functions.TextFunctions.bpePreTokens]]
  * (which segments text into the units BPE merges within, never across).
  *
  * The loop runs on the DISTINCT-pretoken frequency table, not the corpus:
  * that is the published trainer shape (count each pretoken once, weight
  * every pair by its frequency), and it is also the 100 TB move — the
  * corpus collapses to a vocabulary of distinct pretokens (millions of
  * rows at web scale) in ONE exact groupBy, and every Lloyd-style round
  * after that touches only the vocabulary. All arithmetic is integer
  * counts with lexicographic tie-breaks, so a SQL engine reproduces the
  * merge table round for round (the q102 oracle unrolls the loop the way
  * the q95 oracle unrolls integer Lloyd).
  */
object Bpe {

  /** One merge learned by [[trainBpe]]: at `round`, the adjacent symbol
    * pair (`left`, `right`) had the highest frequency-weighted count.
    */
  final case class BpeMerge(round: Int, left: String, right: String, cnt: Long)

  /** A pretoken as its character symbols — the round-0 state every BPE
    * trainer starts from. Pure per-character substring arithmetic,
    * identical in any engine (1-based char positions).
    */
  def charSymbols(tok: Column): Column =
    transform(sequence(lit(1), length(tok)), i => tok.substr(i, lit(1)))

  /** A pretoken as its UTF-8 BYTE symbols — the round-0 state of the
    * byte-level BPE variant (GPT-2's production form, Radford et al.
    * 2019 §2.2; Llama's default): merges operate on bytes, so the base
    * alphabet is ≤256 symbols and NO input is out-of-vocabulary by
    * construction. Symbols are uppercase hex pairs ("C3", "A9"), so the
    * existing merge machinery applies untouched: fusing is string
    * concatenation (hex pairs are fixed-width, so concatenation of hex
    * IS concatenation of bytes), and the (cnt DESC, l, r) tie-break is a
    * deterministic ASCII compare in any engine. A multi-byte character
    * may split ACROSS merges — an intermediate symbol need not be valid
    * UTF-8 on its own; only the full concatenation round-trips (the
    * decode side is [[bytesToString]]).
    */
  def byteSymbols(tok: Column): Column = {
    val h = hex(encode(tok, "UTF-8"))
    transform(sequence(lit(1), (length(h) / lit(2)).cast("int")),
      i => h.substr(i * lit(2) - lit(1), lit(2)))
  }

  /** Decode a byte-symbol array (uppercase hex-pair strings, possibly
    * multi-byte after merges) back to the original string: concatenation
    * of the hex symbols IS the UTF-8 byte stream. The round-trip
    * invariant `bytesToString(encodeWithMerges(byteSymbols(t), m)) = t`
    * holds for EVERY merge list — merges only regroup the byte stream.
    */
  def bytesToString(syms: Column): Column =
    decode(unhex(concat_ws("", syms)), "UTF-8")

  /** Apply ONE learned merge to a symbol array: every adjacent (l, r)
    * occurrence fuses, left to right, non-overlapping — "aaa" under
    * (a, a) becomes [aa, a], and the fused symbol never re-merges within
    * the same round. A single left fold gives exactly that semantics
    * (the fused symbol sits in the accumulator as `l || r`, which can
    * only match the pair again if it EQUALS l — impossible for non-empty
    * r), and the same fold runs on the oracle side as a list_reduce.
    */
  def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, lit(Array.empty[String]), (acc, s) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(element_at(acc, -1), s))))
        .otherwise(concat(acc, array(s))))

  /** Encode a symbol array with a TRAINED merge list — the apply half of
    * the BPE loop (train on the corpus once, encode everything with the
    * frozen merges, exactly how a production tokenizer ships): the
    * merges fold in training order, each with [[applyMerge]]'s
    * left-to-right non-overlapping semantics, so encode(train corpus)
    * reproduces the final training vocabulary state. One codegen-staged
    * expression per merge — no shuffle, no state; the merge list is
    * driver-sized (it IS the model).
    */
  def encodeWithMerges(syms: Column, merges: Seq[BpeMerge]): Column =
    merges.foldLeft(syms)((s, m) => applyMerge(s, m.left, m.right))

  /** Train `rounds` greedy BPE merges over a (tok, freq) pretoken table.
    * Per round: frequency-weighted adjacent-pair counts over the current
    * symbol arrays, argmax with the deterministic (cnt DESC, l, r)
    * tie-break, then the merge applied everywhere. Returns the merge
    * table — the model artifact, `rounds` rows, driver-sized by
    * construction (like the trained k-means centroid set).
    *
    * Scale shape, per round: ONE job — the vocabulary carries a lazy
    * `localCheckpoint`, and the round's pair-count argmax (a map-side
    * combined groupBy + TakeOrdered(1)) both materializes it and picks
    * the merge, the [[Dedup]] connected-components convention. The
    * vocabulary never grows (merges only shrink symbol arrays), and the
    * corpus is never touched after the initial pretoken groupBy.
    */
  def trainBpe(pretokens: DataFrame, rounds: Int): Seq[BpeMerge] =
    train(pretokens, charSymbols, rounds)

  /** [[trainBpe]] over UTF-8 byte symbols — the byte-level production
    * variant ([[byteSymbols]]): identical greedy loop, identical
    * determinism, but the base alphabet is bytes so the trained model
    * has no OOV path. Merge symbols are uppercase hex strings.
    */
  def trainByteBpe(pretokens: DataFrame, rounds: Int): Seq[BpeMerge] =
    train(pretokens, byteSymbols, rounds)

  private def train(pretokens: DataFrame, symsOf: Column => Column,
      rounds: Int): Seq[BpeMerge] = {
    var vocab = pretokens
      .select(col("tok"), col("freq").cast("long").as("freq"),
        symsOf(col("tok")).as("syms"))
      .localCheckpoint(false)
    val merges = Seq.newBuilder[BpeMerge]
    var round = 0
    var exhausted = false
    while (round < rounds && !exhausted) {
      round += 1
      val top = vocab.filter(size(col("syms")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(0), size(col("syms")) - 2), i =>
            struct(element_at(col("syms"), i + 1).as("l"),
              element_at(col("syms"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // every pretoken fully merged
      else {
        val (l, r, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += BpeMerge(round, l, r, cnt)
        val next = vocab
          .withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(false)
        vocab.unpersist(false)
        vocab = next
      }
    }
    vocab.unpersist(false)
    merges.result()
  }

  /** Tokenizer FERTILITY and cross-language parity metrics under a frozen
    * merge list — the published tokenizer-evaluation battery (Rust et al.
    * 2021, "How Good is Your Tokenizer?": fertility = mean subwords per
    * word; Petrov et al. 2023, "Language Model Tokenizers Introduce
    * Unfairness": the per-language token-premium relative to a reference
    * language). Every metric is exact integer sums with at most ONE IEEE
    * division at the end (the q116 convention):
    *
    *  - `fertility`        = n_tokens / n_pretokens
    *  - `chars_per_token`  = n_chars / n_tokens (compression rate)
    *  - `premium_vs_en`    = (n_tokens · en_chars) / (n_chars · en_tokens)
    *    — the tokens-per-char premium over the reference language; the
    *    cross-products compute in DECIMAL(38) (≡ the oracle's HUGEINT),
    *    exact far past the trillion-token corpora where int64 products
    *    would silently wrap, then ONE division (decimal→double is IEEE
    *    round-to-nearest in both engines).
    *
    * The reference language (`refLang`, default `en`) must be present —
    * an absent reference fails LOUDLY rather than silently erasing every
    * language's ledger through the empty reference join.
    *
    * Trained-on-`en` merges rarely fire on other scripts, so OOV-heavy
    * languages read fertility ≈ mean pretoken length — exactly the
    * unfairness the battery measures.
    *
    * Scale shape: the corpus collapses to its DISTINCT pretokens (Heaps-
    * bounded), each encoded ONCE with the frozen merges and broadcast back
    * (the q136 vocab-cache shape); the per-language aggregation ships
    * (lang, doc, tok-key) tuples — never text bodies — and the en
    * reference row broadcasts to the language-domain-sized frame.
    */
  def fertilityByLang(df: DataFrame, idCol: String, langCol: String,
      textCol: String, merges: Seq[BpeMerge],
      refLang: String = "en"): DataFrame = {
    import graft.functions.TextFunctions
    // explode_outer + isNotNull: the decontaminate lesson — a plain
    // explode invites InferFiltersFromGenerate to clone the pretokenize
    // regex into the scan's data filters
    val pts = df.select(col(langCol).as("lang"), col(idCol).as("__doc"),
        explode_outer(TextFunctions.bpePreTokens(col(textCol))).as("tok"))
      .filter(col("tok").isNotNull)
    val enc = pts.select(col("tok")).distinct()
      .select(col("tok"), length(col("tok")).cast("long").as("__nc"),
        size(encodeWithMerges(charSymbols(col("tok")), merges))
          .cast("long").as("__nb"))
    // the ledger feeds BOTH the output frame and the en reference row —
    // an eager checkpoint of the language-domain-sized frame keeps the
    // corpus aggregation from running twice
    val agg = pts.join(broadcast(enc), "tok")
      .groupBy(col("lang"))
      .agg(countDistinct(col("__doc")).as("n_docs"),
        count(lit(1)).as("n_pretokens"),
        sum(col("__nc")).as("n_chars"),
        sum(col("__nb")).as("n_tokens"))
      .localCheckpoint(true)
    val en = agg.filter(col("lang") === refLang)
      .select(col("n_chars").as("__ec"), col("n_tokens").as("__et"))
    // the reference row gates the whole ledger through a cross join — an
    // absent reference must fail loudly, not emit an empty frame (the
    // checkpointed agg is language-domain-sized, so this probe is free)
    require(!en.isEmpty,
      s"fertilityByLang: reference language '$refLang' has no rows — " +
        "every ledger row would silently vanish through the empty join")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    agg.crossJoin(broadcast(en))
      .select(col("lang"), col("n_docs"), col("n_pretokens"),
        col("n_chars"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_pretokens"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_tokens"))
          .as("chars_per_token"),
        // DECIMAL(38) cross-products: int64 · int64 wraps silently in
        // non-ANSI Spark (and raises in the oracle) right at the
        // trillion-char scale this operator documents
        ((col("n_tokens").cast(dec) * col("__ec").cast(dec)).cast("double") /
          (col("n_chars").cast(dec) * col("__et").cast(dec)).cast("double"))
          .as("premium_vs_en"))
  }
}
