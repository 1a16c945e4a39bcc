package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis for training-data pipelines: language ID, quality scoring,
  * token statistics, fingerprinting. All ratios are exact integer divisions
  * surfaced as doubles (engine-portable); everything is codegen'd
  * expressions over one pass of the text column.
  */
object TextAnalysis {

  /** Small English stopword set used by the n-gram/stopword language
    * heuristic (the managed-source vocabulary is English-centric).
    */
  val enStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "on", "for", "it")

  /** Stopword-ratio language ID: en if the stopword share of tokens clears
    * `threshold`, else unk. (A real pipeline adds per-language lists; the
    * operator shape — token-set ratio against a broadcast lexicon — is the
    * same. See [[languageIdMulti]] for the multi-language form.)
    */
  def languageId(df: DataFrame, textCol: String, threshold: Double = 0.08): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isin(enStopwords: _*)))
    df.withColumn("n_tokens", nTok.cast(LongType))
      .withColumn("en_ratio", nStop.cast(DoubleType) / nTok)
      .withColumn("lang_pred", when(col("en_ratio") >= threshold, "en").otherwise("unk"))
  }

  /** Per-language function-word lexicons for [[languageIdMulti]]. Function
    * words (articles, prepositions, conjunctions, pronouns) are the
    * canonical langid features: they are the most frequent words of every
    * language, closed-class (no domain drift), and short texts still hit
    * them. Words may legitimately appear in several lexicons (es/pt "de",
    * fr/es "la") — each language's ratio is computed independently, so
    * shared words raise both and the argmax still separates on the
    * language-exclusive ones.
    */
  val lexicons: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "on", "for", "it",
      "that", "with", "as", "was", "are"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
      "del", "se", "por", "con", "no"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "en",
      "est", "que", "dans", "pour", "qui"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "den", "im", "ein",
      "eine", "mit", "zu", "auf", "nicht", "sich"),
    "pt" -> Seq("o", "a", "de", "que", "e", "do", "da", "em", "um", "uma",
      "para", "com", "os", "não", "por"),
    "it" -> Seq("il", "la", "di", "che", "e", "un", "una", "per", "con", "del",
      "non", "si", "sono", "le", "da"))

  /** [[lexicons]] extended with a space-free script: the zh entries are
    * function CHARACTERS (的/是/了/在 …, the highest-frequency hanzi —
    * closed-class, like function words), matched against character
    * unigrams when `zh` is routed through `charGramLangs` in
    * [[languageIdMulti]]. Kept separate from [[lexicons]] so existing
    * word-ratio callers are byte-for-byte unchanged.
    */
  val lexiconsCjk: Map[String, Seq[String]] =
    lexicons + ("zh" -> Seq("的", "一", "是", "了", "我", "不", "在", "人",
      "有", "他", "这", "中", "大", "来", "上"))

  /** Multi-language language ID: per-language lexicon-hit ratio, argmax
    * language + confidence. Emits `n_tokens`, one `r_<lang>` ratio column
    * per language, `lang_conf` (the winning ratio) and `lang_pred` (the
    * winning language, or `unk` below `threshold`).
    *
    * The lexicons ship to executors as literal `isin` sets inside one
    * codegen'd projection — a closed-class lexicon is tens of words per
    * language, so this is a zero-shuffle, zero-join, single-pass operator
    * (the 100 TB shape: pure map, scales with input bytes).
    *
    * Determinism: the argmax is `greatest` over `(ratio, lang)` structs —
    * field-by-field comparison picks the max ratio and breaks exact ties
    * toward the LARGEST language code, the same rule as DuckDB's
    * `list_max` over structs, so oracles reproduce the argmax
    * byte-for-byte (ratios are single IEEE divisions of the same ints in
    * either engine). Empty texts pin every ratio to 0.0 (never NaN).
    */
  def languageIdMulti(df: DataFrame, textCol: String,
      langLexicons: Map[String, Seq[String]] = lexicons,
      threshold: Double = 0.08,
      charGramLangs: Set[String] = Set.empty,
      charGramN: Int = 1): DataFrame = {
    require(langLexicons.size >= 2, "languageIdMulti needs >= 2 lexicons")
    // tokens stage as their own projection (lambdas get no CSE)
    val staged0 = df.withColumn("__tk", tokens(col(textCol)))
    // languages in `charGramLangs` score their lexicon against character
    // n-grams instead of whitespace words (space-free scripts have no
    // word boundaries to split on); both token arrays stage once and the
    // operator stays a zero-shuffle single pass
    val staged =
      if (charGramLangs.isEmpty) staged0
      else staged0.withColumn("__cg", charNGrams(col(textCol), charGramN))
    val nTok = size(col("__tk"))
    val nCg = size(col("__cg"))
    def ratio(lang: String, words: Seq[String]): Column =
      if (charGramLangs(lang))
        when(nCg > 0,
          size(filter(col("__cg"), t => t.isin(words: _*))).cast(DoubleType) / nCg)
          .otherwise(lit(0.0))
      else
        when(nTok > 0,
          size(filter(col("__tk"), t => t.isin(words: _*))).cast(DoubleType) / nTok)
          .otherwise(lit(0.0))
    val byLang = langLexicons.toSeq.sortBy(_._1)
    val withRatios = byLang.foldLeft(
      staged.withColumn("n_tokens", nTok.cast(LongType))) {
      case (d, (lang, words)) => d.withColumn(s"r_$lang", ratio(lang, words))
    }
    val best = greatest(byLang.map { case (lang, _) =>
      struct(col(s"r_$lang").as("r"), lit(lang).as("l")) }: _*)
    withRatios
      .withColumn("__best", best)
      .withColumn("lang_conf", col("__best.r"))
      .withColumn("lang_pred",
        when(col("lang_conf") >= threshold, col("__best.l")).otherwise("unk"))
      .drop("__tk", "__cg", "__best")
  }

  /** Quality metrics + a composite score in [0,1]:
    * length credit (tokens/100 capped at 1) and alphabetic density.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nTok = size(toks).cast(LongType)
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val alpha = length(regexp_replace(lower(text), "[^a-z]", ""))
    df.withColumn("n_tokens", nTok)
      .withColumn("avg_token_len", sumLen.cast(DoubleType) / nTok)
      .withColumn("alpha_ratio", alpha.cast(DoubleType) / length(text))
      .withColumn("quality_score",
        least(lit(1.0), nTok.cast(DoubleType) / 100.0) * 0.5 + col("alpha_ratio") * 0.5)
  }

  /** Token statistics: whitespace tokens, regex (BPE-ish) tokens, distinct
    * tokens, type-token ratio.
    */
  def tokenStats(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("ws_tokens", size(toks).cast(LongType))
      .withColumn("re_tokens", regexTokenCount(col(textCol)).cast(LongType))
      .withColumn("distinct_tokens", size(array_distinct(toks)).cast(LongType))
      .withColumn("ttr",
        size(array_distinct(toks)).cast(DoubleType) / size(toks))
  }

  /** Document fingerprints: exact content hash + min-shingle rolling hash.
    * Tokens stage as their own projection (no CSE inside shingle lambdas).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("__tk"))
      .select(col(idCol),
        md5(array_join(col("__tk"), " ")).as("content_fp"),
        minhashMd5(array_distinct(wordShingles(col("__tk"), 4)), 0).as("shingle_fp"))

  /** Intra-document repetition (the "repeated boilerplate inside one doc"
    * quality signal): over NON-distinct n-grams, the duplicate-gram ratio
    * (1 − distinct/total) and the share of the single most frequent gram.
    * Docs shorter than the shingle width have no grams and drop.
    *
    * Scale shape: per-gram histogram via one (doc, gram) shuffle with
    * map-side partial counts, folded to one row per doc by a second
    * doc-keyed shuffle of gram-count rows — no row ever carries the text.
    * explode_outer + isNotNull keeps the shingle derivation out of scan
    * filters (see [[Curation.decontaminate]]).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3): DataFrame =
    df.select(col(idCol).as("doc"), tokens(col(textCol)).as("__tk"))
      .select(col("doc"), wordShingles(col("__tk"), shingleN).as("__g"))
      .select(col("doc"), size(col("__g")).as("__n"), explode_outer(col("__g")).as("gram"))
      .filter(col("gram").isNotNull)
      .groupBy(col("doc"), col("__n"), col("gram"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("doc").as(idCol))
      .agg(max(col("__n")).cast(LongType).as("n_grams"),
        count(lit(1)).as("n_distinct"),
        max(col("__c")).as("__top"))
      .withColumn("dup_ratio",
        lit(1.0) - col("n_distinct").cast(DoubleType) / col("n_grams"))
      .withColumn("top_gram_share", col("__top").cast(DoubleType) / col("n_grams"))
      .drop("__top")

  /** Corpus-frequency token scoring (the distributed analogue of unigram
    * LM quality): per document, the sum / average / minimum of the CORPUS
    * occurrence counts of its tokens (with multiplicity). Common-token
    * documents score high, rare-token (noisy, misencoded, codeish)
    * documents score low — the classic cheap quality prior next to
    * [[qualityScore]]'s shape heuristics.
    *
    * Everything is integer arithmetic until one final division, so any
    * engine reproduces scores bit-for-bit (no double-summation order
    * dependence). Scale shape: corpus reduces to (doc, token) pairs once;
    * the per-token corpus count is a window over the token key (one
    * exchange — NOT a groupBy+join, which would tokenize twice), then one
    * doc-keyed fold. Bodies never move. Empty documents have no tokens
    * and drop (as with the gram operators).
    */
  def tokenRarity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc"), tokens(col(textCol)).as("__tk"))
      .select(col("doc"), size(col("__tk")).as("__n"),
        explode_outer(col("__tk")).as("tok"))
      .filter(col("tok").isNotNull)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))
    toks.withColumn("__cnt", count(lit(1)).over(w))
      .groupBy(col("doc").as(idCol))
      .agg(max(col("__n")).cast(LongType).as("n_tokens"),
        sum(col("__cnt")).as("freq_sum"),
        min(col("__cnt")).as("min_freq"))
      .withColumn("avg_token_freq",
        col("freq_sum").cast(DoubleType) / col("n_tokens"))
  }

  /** Distinctive-token extraction (keyword signal): per document, the
    * token with the highest tf/df ratio — frequent in THIS document,
    * rare across the corpus. tf and df are exact integers (df = number
    * of documents containing the token, a distinct-pair count), the
    * ratio is one IEEE division, and the argmax is the same
    * `greatest`-over-(ratio, token) struct rule as [[languageIdMulti]]
    * (max ratio, exact ties → largest token) — so any engine reproduces
    * the extraction byte-for-byte, no log/idf smoothing to diverge on.
    *
    * Scale shape: one (doc, token) shuffle; df is a window count over the
    * DISTINCT pairs (no second tokenize, no join back); the argmax is a
    * per-doc struct max — map-side combinable.
    */
  def distinctiveTokens(df: DataFrame, idCol: String, textCol: String,
      langCol: Option[String] = None, charGramN: Int = 1): DataFrame = {
    // with a language column, space-free scripts tokenize as char n-grams
    // (tokensByLang); the default keeps the whitespace form byte-for-byte
    val tokExpr = langCol match {
      case Some(lc) => tokensByLang(col(textCol), col(lc), charGramN)
      case None     => tokens(col(textCol))
    }
    val tf = df.select(col(idCol).as("doc"), tokExpr.as("__tk"))
      .select(col("doc"), explode_outer(col("__tk")).as("tok"))
      .filter(col("tok").isNotNull)
      .groupBy(col("doc"), col("tok")).agg(count(lit(1)).as("tf"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))
    tf.withColumn("df", count(lit(1)).over(w)) // (doc,tok) rows are distinct
      .withColumn("__best",
        struct((col("tf").cast(DoubleType) / col("df")).as("r"), col("tok").as("t")))
      .groupBy(col("doc").as(idCol))
      .agg(max(col("__best")).as("__m"), count(lit(1)).as("n_distinct_tokens"))
      .select(col(idCol), col("__m.t").as("top_token"), col("__m.r").as("tfdf"),
        col("n_distinct_tokens"))
  }

  /** Per-stratum corpus profile — the data-card operator: document count,
    * exact length distribution (sum/avg/min/max + interpolated p50/p90,
    * Spark's exact `percentile`, bit-identical to `quantile_cont`), and
    * source diversity. One shuffle keyed on the stratum; the exact
    * percentile's per-group value buffer is bounded by stratum size (for
    * open-ended cardinality strata switch to `percentile_approx`, which
    * folds into fixed-size sketches).
    */
  def corpusProfile(df: DataFrame, strataCol: String, lenCol: String,
      sourceCol: String): DataFrame =
    df.groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(lenCol)).as("total_len"),
        (sum(col(lenCol)).cast(DoubleType) / count(lit(1))).as("avg_len"),
        min(col(lenCol)).as("min_len"),
        max(col(lenCol)).as("max_len"),
        percentile(col(lenCol), lit(0.5)).as("p50_len"),
        percentile(col(lenCol), lit(0.9)).as("p90_len"),
        countDistinct(col(sourceCol)).as("n_sources"))

  /** Inter-document duplicate-text coverage (the C4/RefinedWeb-style
    * boilerplate signal): per document, the fraction of its DISTINCT
    * n-gram shingles that appear in at least one OTHER document.
    *
    * Scale shape: the corpus reduces to (doc, gram) pairs ONCE — the
    * per-gram document count is a window over the gram key, not a
    * groupBy+join (which would evaluate the tokenize+shingle pass twice:
    * the aggregate's partial-combine exchange differs from the join
    * exchange, so the planner cannot reuse one for the other). One gram
    * shuffle, one doc-keyed fold; bodies never move.
    */
  def duplicateCoverage(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5): DataFrame = {
    val grams = Dedup.shingleFrame(df, idCol, textCol, shingleN)
      .select(col("doc"), col("n_sh"), explode_outer(col("sh")).as("gram"))
      .filter(col("gram").isNotNull)
    // (doc, gram) is unique (distinct sets) → count per gram = doc count
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
    grams.withColumn("__docs", count(lit(1)).over(w))
      .groupBy(col("doc").as(idCol))
      .agg(max(col("n_sh")).cast(LongType).as("n_shingles"),
        sum(when(col("__docs") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("dup_coverage",
        col("n_shared").cast(DoubleType) / col("n_shingles"))
  }

  /** C4-style content gates — the per-document web-corpus filter decision:
    * badword share against a broadcast lexicon, URL count + first domain
    * (the blocklist key), and the deterministic keep rule (badwords under
    * 1/`badFrac` of tokens, at most `maxUrls` URLs, at least `minTokens`
    * tokens). One staged-projection map pass, zero shuffle; every gate is
    * integer arithmetic so the decision reproduces exactly cross-engine.
    */
  def contentGates(df: DataFrame, idCol: String, textCol: String,
      badwords: Seq[String], badFrac: Int = 5, maxUrls: Int = 2,
      minTokens: Int = 5): DataFrame = {
    val urlDomain = "https?://([^/\\s]+)"
    df.select(col(idCol), col(textCol),
        tokens(col(textCol)).as("__tk"),
        regexp_extract_all(col(textCol), lit(urlDomain), lit(1)).as("__dom"))
      .select(col(idCol),
        size(col("__tk")).cast(LongType).as("n_tokens"),
        size(filter(col("__tk"), t => t.isin(badwords: _*)))
          .cast(LongType).as("n_bad"),
        size(col("__dom")).cast(LongType).as("n_urls"),
        coalesce(try_element_at(col("__dom"), lit(1)), lit("")).as("first_domain"))
      .withColumn("keep",
        col("n_bad") * badFrac < col("n_tokens") &&
          col("n_urls") <= maxUrls && col("n_tokens") >= minTokens)
  }

  /** Ordered (entity, replacement) pairs for the five standard HTML
    * escapes. `&amp;` is deliberately LAST so a double-escaped entity
    * (`&amp;lt;`) unescapes exactly one level per pass — the ordering both
    * engines must share for the oracle to reproduce.
    */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&amp;" -> "&")

  /** HTML/boilerplate removal — the web-corpus hygiene pass an LLM
    * pipeline runs before any quality/dedup stage: drop script/style
    * blocks WITH their contents, strip remaining tags, unescape the
    * standard entities, collapse whitespace. One codegen'd chain of
    * regexp/replace expressions, zero shuffle, linear in bytes — the
    * perfect cluster-scale map. The entity patterns contain no regex
    * metacharacters and the replacements no `$`/`\`, so Spark
    * regexp_replace ≡ DuckDB replace() exactly.
    */
  def stripHtml(c: Column): Column = {
    val noBlocks = regexp_replace(c,
      "<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", "")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", "")
    val unescaped = htmlEntities.foldLeft(noTags) {
      case (acc, (ent, ch)) => regexp_replace(acc, ent, ch)
    }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** [[stripHtml]] preserving LINE structure — the pipeline variant: a
    * web-curation chain's later stages (Gopher line/paragraph rules,
    * CCNet paragraph dedup, C4 line rules) consume newlines as structure,
    * so the hygiene pass must not collapse them the way [[stripHtml]]'s
    * final `\s+ → ' '` does. Same block/tag/entity chain; horizontal
    * whitespace collapses, spaces adjacent to newlines drop, newlines
    * stay. Still one codegen'd expression chain, zero shuffle.
    */
  def stripHtmlKeepLines(c: Column): Column = {
    val noBlocks = regexp_replace(c,
      "<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", "")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", "")
    val unescaped = htmlEntities.foldLeft(noTags) {
      case (acc, (ent, ch)) => regexp_replace(acc, ent, ch)
    }
    trim(regexp_replace(
      regexp_replace(unescaped, "[ \t]+", " "), " ?\n ?", "\n"))
  }

  /** Bigram language-model familiarity — the LM-based quality filter of
    * the published web-curation recipes (score each document by how
    * predictable its token sequence is under a corpus-trained n-gram
    * model; outliers are gibberish, boilerplate, or wrong-language).
    * Model = add-one-smoothed bigram conditionals trained on the corpus
    * itself: P(w2|w1) = (c(w1w2)+1) / (prefix(w1)+V), familiarity = the
    * per-doc MEAN of P over its bigrams in position order.
    *
    * Scale shape: bigram/prefix count tables are word-count aggregations
    * (map-side combined) keyed by the 64-bit xxhash of the gram — every
    * exchange ships 8-byte keys, never gram text; the score join touches
    * (doc, pos, gramhash) tuples only — bodies never shuffle; V is a
    * one-row broadcast. Determinism: every count is an exact integer, so
    * each per-bigram P is ONE IEEE division of exact integers, and the
    * per-doc sum folds the position-sorted array sequentially — DuckDB's
    * list_sum over the same ordered list reproduces it bit-for-bit (the
    * q34 cosine convention).
    */
  def bigramFamiliarity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("doc"), tokens(col(textCol)).as("tk"))
    // DICTIONARY-ENCODED keys: every count is keyed by the 64-bit xxhash
    // of the gram/word, not the string — the big (doc,pos,gram) exchange
    // before the bcount join ships 8-byte keys instead of bigram text,
    // and the count-side partial aggs hash longs. The familiarity output
    // depends only on the COUNTS, so this is result-neutral unless two
    // distinct grams collide in 64 bits (≈ n²/2⁶⁵ — ~5·10⁻⁸ at a
    // million-bigram vocabulary; a collision would merge two gram counts,
    // which the sf0.1 string-keyed oracle would catch). The w1 hash rides
    // the same projection via substring_index, NOT split()[0]: the inner
    // joins infer isnotnull and push it through this projection — a
    // split would re-derive an array inside the Filter (the plan-shape
    // guard's generator-pushdown class); substring_index stays scalar.
    val bg = tok
      .select(col("doc"), posexplode_outer(wordShingles(col("tk"), 2)))
      .filter(col("col").isNotNull)
      .select(col("doc"), (col("pos") + 1).as("pos"),
        xxhash64(col("col")).as("gh"),
        xxhash64(substring_index(col("col"), " ", 1)).as("wh"))
    val bcount = bg.groupBy(col("gh")).agg(count(lit(1)).as("b"))
    val pcount = bg.groupBy(col("wh")).agg(count(lit(1)).as("p"))
    val vocab = tok.select(explode_outer(col("tk")).as("t"))
      .filter(col("t").isNotNull)
      .agg(countDistinct(xxhash64(col("t"))).as("V"))
    // pcount is UNIGRAM-vocabulary-sized (one slim (hash, count) row per
    // distinct first word — Heaps'-law sublinear in corpus size), so it
    // broadcasts; that turns the second (doc,pos,gh) exchange into a
    // map-side hash join, leaving one big shuffle (on gh) before the
    // per-doc fold. bcount is BIGRAM-vocabulary-sized and stays a
    // shuffle join.
    bg.join(bcount, "gh").join(broadcast(pcount), "wh")
      .crossJoin(broadcast(vocab))
      .withColumn("r",
        (col("b") + 1).cast("double") / (col("p") + col("V")).cast("double"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_bigrams"),
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("r")))),
            s => s.getField("r")),
          lit(0.0), (a, x) => a + x).as("__sum"))
      .select(col("doc").as(idCol), col("n_bigrams"),
        (col("__sum") / col("n_bigrams")).as("familiarity"))
  }

  /** Registrable domain (eTLD+1) of a host under a configurable public-
    * suffix list — the key of every URL-level curation decision
    * (RefinedWeb §3.1's blocklist filtering; C4's badword domains): the
    * longest suffix in `suffixes` that the host ends with, plus the one
    * label left of it. Longest-match-wins is the publicsuffix.org
    * algorithm ('co.uk' beats 'uk', so 'media.news.co.uk' →
    * 'news.co.uk'); a host matching no listed suffix falls back to its
    * last two labels (single-label hosts pass through whole). IDN hosts
    * pass through in punycode form — 'xn--' labels are ordinary labels,
    * never decoded (decoding would make the key engine- and
    * locale-dependent).
    *
    * A pure codegen'd when-cascade sized by the suffix LIST (config,
    * not data) — usable inside higher-order-function lambdas, so callers
    * can map it over per-doc URL arrays without any shuffle.
    */
  def registrableDomain(host: Column, suffixes: Seq[String]): Column = {
    require(suffixes.nonEmpty, "registrableDomain needs a suffix list")
    val labs = split(host, "\\.")
    val fallback = when(size(labs) >= 2,
      array_join(slice(labs, -2, 2), ".")).otherwise(host)
    // longest first (label count, then char length): 'co.uk' before 'uk'
    val ordered = suffixes.distinct
      .sortBy(s => (-s.count(_ == '.'), -s.length, s))
    ordered.foldRight(fallback) { (s, acc) =>
      val k = s.count(_ == '.') + 1 // labels in the suffix
      when(host.endsWith("." + s),
        array_join(slice(labs, -(k + 1), k + 1), ".")).otherwise(acc)
    }
  }

  /** URL/domain filtering — the curation stage upstream of the content
    * gates (RefinedWeb §3.1; C4's domain blocklist): extract every URL
    * from the text, key each on its [[registrableDomain]], and block on
    * (a) registrable-domain membership in `blockedDomains` and (b) URL
    * SUBSTRING hits against `blockedSubstrings` via the Aho-Corasick
    * automaton ([[graft.plans.DictionaryMatches]] — one pass per URL at
    * O(bytes + matches), dictionary-size independent; measured flat at
    * 10k terms). Returns one ledger row per doc: URL count, sorted
    * distinct registrable domains as CSV, per-blocklist hit counts, and
    * the keep decision (no URL blocked either way).
    *
    * Scale shape: ZERO shuffle — URL extraction, the domain cascade, and
    * both block checks all run inside per-row array lambdas (the
    * registrable-domain cascade and the automaton scan are plain
    * expressions, so they compose into `transform`/`filter`), making the
    * stage a pure map pass like [[stripHtml]].
    */
  def urlDomainFilter(df: DataFrame, idCol: String, textCol: String,
      suffixes: Seq[String], blockedDomains: Seq[String],
      blockedSubstrings: Seq[String]): DataFrame = {
    val urls = regexp_extract_all(col(textCol), lit("https?://[^\\s]+"), lit(0))
    val doms = transform(col("__urls"), u =>
      registrableDomain(regexp_extract(u, "https?://([^/?#]+)", 1), suffixes))
    val blockedSub =
      if (blockedSubstrings.isEmpty) lit(0)
      else size(filter(col("__urls"), u =>
        size(graft.plans.DictionaryMatches(u, blockedSubstrings)) > 0))
    df.select(col(idCol), urls.as("__urls"))
      .select(col(idCol), col("__urls"), doms.as("__doms"),
        blockedSub.cast(LongType).as("n_blocked_substring"))
      .select(col(idCol),
        size(col("__urls")).cast(LongType).as("n_urls"),
        array_join(array_sort(array_distinct(col("__doms"))), ",")
          .as("domains_csv"),
        (if (blockedDomains.isEmpty) lit(0)
         else size(filter(col("__doms"), d => d.isin(blockedDomains: _*))))
          .cast(LongType).as("n_blocked_domain"),
        col("n_blocked_substring"))
      .withColumn("keep",
        col("n_blocked_domain") === 0L && col("n_blocked_substring") === 0L)
  }
}
