package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** PII detection + redaction for training corpora: emails, IPv4 addresses,
  * and NANP-style phone numbers are counted and masked with typed
  * placeholders. Pure codegen'd column expressions (regexp_count /
  * regexp_replace) — one pass over the text, no UDFs, trivially
  * distributable; the patterns use only syntax with identical semantics in
  * Java regex and RE2, so an external engine reproduces both counts and
  * redacted text byte-for-byte.
  *
  * A production deployment extends `patterns` (SSNs, IBANs, secrets) — the
  * operator shape (ordered masked rewrite + per-kind counts) is the same.
  */
object Privacy {

  /** Pattern set, applied in order (emails first: they contain dots and
    * digits that the later patterns must not see as their own matches).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  val patterns: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "<EMAIL>"),
    ("ip", Ipv4Re, "<IP>"),
    ("phone", PhoneRe, "<PHONE>"))

  /** Adds `n_emails`, `n_ips`, `n_phones` (counts over the ORIGINAL text)
    * and `redacted` (all three kinds masked, in pattern order).
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val counted = patterns.foldLeft(df) { case (d, (kind, re, _)) =>
      d.withColumn(s"n_${kind}s", regexp_count(text, lit(re)).cast(LongType))
    }
    val redacted: Column = patterns.foldLeft(text) {
      case (c, (_, re, mask)) => regexp_replace(c, re, mask)
    }
    counted.withColumn("redacted", redacted)
  }

  // ---- extended kinds -------------------------------------------------------

  /** SSN with the SSA issuance exclusions (area not 000/666/900+, group not
    * 00, serial not 0000) encoded as pure alternation — RE2 has no
    * lookahead, so exclusion-by-alternation is what keeps the pattern
    * byte-identical between Java regex and an RE2 oracle.
    */
  val SsnRe: String =
    "\\b(00[1-9]|0[1-9]\\d|[1-5]\\d{2}|6[0-57-9]\\d|66[0-57-9]|[78]\\d{2})" +
      "-(0[1-9]|[1-9]\\d)-(000[1-9]|00[1-9]\\d|0[1-9]\\d{2}|[1-9]\\d{3})\\b"

  /** Card-shaped candidate: 13–19 digits, each optionally followed by one
    * space/dash. Candidates are only COUNTED when they pass [[luhnValid]];
    * redaction masks every candidate (conservative — a leaked PAN with a
    * typo'd digit should still not survive into a training corpus).
    * A CONTIGUOUS run longer than 19 digits matches nowhere (every
    * candidate end falls inside the run, failing the trailing `\b`);
    * a separator-punctuated longer run CAN yield a 13–19-digit prefix
    * whose last group boundary provides the `\b` — conservative
    * over-matching that the Luhn gate keeps out of the counts. Words
    * break digit runs, so free text does not chain into candidates.
    */
  val CcRe: String = "\\b(?:\\d[ -]?){12,18}\\d\\b"

  /** IPv6: full 8-group form, or single-`::` compressed with one trailing
    * group (the dominant textual forms in logs). Leftmost-first alternation
    * behaves identically in Java regex and RE2.
    */
  val Ipv6Re: String =
    "\\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\\b|" +
      "\\b(?:[0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}\\b"

  /** Extended pattern set; order matters for redaction (emails first —
    * they contain digits and dots; SSN before the card pattern so an SSN
    * is never absorbed into a card-shaped digit run; IPv6 before IPv4).
    */
  val extendedPatterns: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "<EMAIL>"),
    ("ssn", SsnRe, "<SSN>"),
    ("cc", CcRe, "<CC>"),
    ("ipv6", Ipv6Re, "<IPV6>"),
    ("ip", Ipv4Re, "<IP>"),
    ("phone", PhoneRe, "<PHONE>"))

  /** Luhn checksum over a card candidate (separators stripped), as a pure
    * codegen'd expression — `transform` over digit positions of the
    * REVERSED string (position 1 = check digit), doubling even positions
    * with the >9 ⇒ −9 fold, then one `aggregate` sum. Exact integer
    * arithmetic, bit-identical in any engine.
    */
  def luhnValid(cand: Column): Column = {
    val digits = reverse(regexp_replace(cand, "[ -]", ""))
    val vals = transform(sequence(lit(1), length(digits)), i => {
      val d = ascii(substr(digits, i, lit(1))) - lit(48)
      when(i % 2 === 0, when(d > 4, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    aggregate(vals, lit(0), (a, x) => a + x) % 10 === 0
  }

  /** [[redactPii]] over [[extendedPatterns]]: per-kind counts on the
    * ORIGINAL text (`n_emails`, `n_ssns`, `n_ccs`, `n_ipv6s`, `n_ips`,
    * `n_phones`) and a `redacted` rewrite masking all six kinds in order.
    * The card count is Luhn-gated (candidates that fail the checksum are
    * masked but not counted). Still one codegen'd pass, zero shuffles.
    */
  def redactPiiExtended(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val counted = extendedPatterns.foldLeft(df) {
      case (d, ("cc", re, _)) =>
        d.withColumn("n_ccs",
          size(filter(regexp_extract_all(text, lit(re), lit(0)), luhnValid(_)))
            .cast(LongType))
      case (d, (kind, re, _)) =>
        d.withColumn(s"n_${kind}s", regexp_count(text, lit(re)).cast(LongType))
    }
    val redacted: Column = extendedPatterns.foldLeft(text) {
      case (c, (_, re, mask)) => regexp_replace(c, re, mask)
    }
    counted.withColumn("redacted", redacted)
  }

  /** k-anonymity suppression over quasi-identifier columns — the
    * publishing gate a training corpus with joined user metadata needs
    * BEFORE release: any row whose quasi-identifier combination is shared
    * by fewer than k rows is suppressed (the combination is identifying).
    * One grouped count on the quasi columns plus a slim join of (keys, n)
    * back onto the rows — bodies never shuffle; the marking frame is
    * group-cardinality-sized. Returns the input rows with `__group_n` and
    * `__k_kept`; callers filter or audit.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1, s"need quasi columns and k>=1")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__group_n"))
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) :+ col("__group_n"): _*)
    // NULL quasi values form real groups (groupBy already counts them as
    // one), so the count join must be null-safe: a plain using-columns
    // equi-join would silently drop null-keyed rows — neither kept,
    // suppressed, nor audited — the worst failure direction for a
    // publishing gate. `<=>` is still a hash-joinable equality key.
    val cond = quasiCols.map(c => df(c) <=> counts(s"__q_$c")).reduce(_ && _)
    df.join(counts, cond)
      .select(df.columns.map(df(_)) :+ col("__group_n"): _*)
      .withColumn("__k_kept", col("__group_n") >= k)
  }

  /** Null-safe slim join of per-quasi-group stats back onto the rows —
    * the shared shape of every suppression gate here: bodies never
    * shuffle beyond the one grouped aggregation; the stats frame is
    * group-cardinality-sized.
    */
  private def joinGroupStats(df: DataFrame, quasiCols: Seq[String],
      stats: DataFrame): DataFrame = {
    val renamed = stats.select(
      quasiCols.map(c => col(c).as(s"__q_$c")) ++
        stats.columns.filterNot(quasiCols.contains).map(col): _*)
    val cond = quasiCols.map(c => df(c) <=> renamed(s"__q_$c")).reduce(_ && _)
    df.join(renamed, cond)
      .select(df.columns.map(df(_)) ++
        stats.columns.filterNot(quasiCols.contains).map(col): _*)
  }

  /** l-diversity suppression — k-anonymity's necessary complement: a
    * quasi-identifier group can be large yet still leak the SENSITIVE
    * attribute when every member shares one value (the homogeneity
    * attack — "all 50 rows with this (zip, age) have the same
    * diagnosis"). Distinct l-diversity requires ≥ l distinct sensitive
    * values per quasi group. One grouped count-distinct plus the slim
    * null-safe stats join; NULL sensitive values count as one value
    * (they are an observable outcome like any other). Returns the rows
    * with `__l_distinct` and `__l_kept`; callers filter or audit.
    */
  def lDiversify(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty && l >= 1, "need quasi columns and l>=1")
    require(!quasiCols.contains(sensitiveCol),
      "the sensitive column cannot be a quasi-identifier")
    // count_distinct ignores nulls; a null sensitive value is still an
    // observable outcome, so count the null group explicitly
    val stats = df.groupBy(quasiCols.map(col): _*)
      .agg((countDistinct(col(sensitiveCol)) +
        max(when(col(sensitiveCol).isNull, 1L).otherwise(0L)))
        .as("__l_distinct"))
    joinGroupStats(df, quasiCols, stats)
      .withColumn("__l_kept", col("__l_distinct") >= l)
  }

  /** t-closeness suppression — the distributional gate past l-diversity:
    * a group with l distinct sensitive values still leaks when its
    * DISTRIBUTION is far from the corpus's (90% of one diagnosis in a
    * group vs 2% globally is a disclosure even though other values
    * occur). For a categorical sensitive attribute the distance is
    * total variation: ½ Σ_v |p_group(v) − p_global(v)|. Exact and
    * engine-reproducible: every term is a ratio of exact counts, folded
    * in sensitive-value order. Scale shape: one (quasi, sensitive)
    * grouped count (the only pass over the rows), a broadcastable
    * global value-distribution, and the slim per-group stats join —
    * bodies never shuffle twice. Returns `__t_dist` and `__t_kept`
    * (kept iff distance ≤ t).
    *
    * NULL handling: a null sensitive value is an outcome category; null
    * quasi values are real groups (null-safe join throughout).
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, t: Double): DataFrame = {
    require(quasiCols.nonEmpty && t >= 0.0 && t <= 1.0,
      "need quasi columns and t in [0,1]")
    require(!quasiCols.contains(sensitiveCol),
      "the sensitive column cannot be a quasi-identifier")
    val s = col(sensitiveCol)
    // one pass over the rows: per-(group, value) counts; group sizes and
    // the global value distribution both derive from this slim frame.
    // Every derived frame uses globally UNIQUE column names — the grid
    // below joins three frames of shared lineage, and name-unique
    // references sidestep self-join attribute ambiguity entirely.
    val cells = df.groupBy((quasiCols.map(col) :+ s.as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val global = cells.groupBy(col("__v").as("__gv"))
      .agg(sum(col("__c")).as("__g"))
      .withColumn("__nn", sum(col("__g")).over()) // slim frame, one window
    val totals = cells
      .groupBy(quasiCols.map(c => col(c).as(s"__t_$c")): _*)
      .agg(sum(col("__c")).as("__n"))
    // full (group × value) grid: a group MISSING a value contributes
    // |0 − p_global(v)| — omitting it understates the distance exactly
    // for the most-skewed groups. The grid is (groups × distinct
    // sensitive values) of slim rows; the value table broadcasts.
    val grid = totals.crossJoin(broadcast(global))
    val cellsKeyed = cells.select(
      quasiCols.map(c => col(c).as(s"__k_$c")) :+
        col("__v").as("__kv") :+ col("__c"): _*)
    val joined = grid.join(cellsKeyed,
      quasiCols.map(c => col(s"__t_$c") <=> col(s"__k_$c"))
        .reduce(_ && _) && (col("__gv") <=> col("__kv")),
      "left")
    // total variation with ORDER-FREE exact arithmetic:
    //   ½ Σ_v |c_v/n − g_v/N| = Σ_v |c_v·N − g_v·n|  /  (2·n·N)
    // The numerator is a sum of exact integers (DECIMAL so 10^9-row
    // corpora cannot overflow the c·N products), so no result ever
    // depends on double summation order; the one division at the end is
    // a correctly-rounded IEEE op both engines reproduce bit-for-bit.
    val term = abs(coalesce(col("__c"), lit(0L)).cast("decimal(38,0)")
      * col("__nn").cast("decimal(38,0)")
      - col("__g").cast("decimal(38,0)") * col("__n").cast("decimal(38,0)"))
    val dist = joined
      .select(quasiCols.map(c => col(s"__t_$c")) ++
        Seq(col("__n"), col("__nn"), term.as("__term")): _*)
      .groupBy(quasiCols.map(c => col(s"__t_$c").as(c)): _*)
      .agg(first(col("__n")).as("__n"), first(col("__nn")).as("__tot"),
        sum(col("__term")).as("__num"))
      .select(quasiCols.map(col) :+
        (col("__num").cast("double") /
          (lit(2.0) * col("__n").cast("double") * col("__tot").cast("double")))
          .as("__t_dist"): _*)
    joinGroupStats(df, quasiCols, dist)
      .withColumn("__t_kept", col("__t_dist") <= t)
  }

  /** CDF thresholds of the two-sided geometric noise distribution
    * (mass(z) ∝ α^|z|, α = e^−ε), at z = −maxNoise … maxNoise−1, each
    * formatted as a 13-hex-digit string: equal-length lowercase hex
    * compares like the number it encodes (the q115 convention), so the
    * inverse-CDF draw below is pure string comparisons that Spark and
    * any SQL oracle evaluate identically — no cross-engine float math
    * ever happens (the doubles here become fixed literals embedded in
    * BOTH plans). Exposed so oracle SQL can be generated from the same
    * constants.
    */
  private[graft] def dpThresholds(
      epsilon: Double, maxNoise: Int): Seq[String] = {
    val alpha = math.exp(-epsilon)
    val w0 = (1 - alpha) / (1 + alpha)
    (-maxNoise until maxNoise).map { z =>
      // closed-form CDF of the untruncated two-sided geometric:
      //   z < 0:  F(z) = w0 α^(−z) / (1−α)
      //   z ≥ 0:  F(z) = 1 − w0 α^(z+1) / (1−α)
      val f =
        if (z < 0) w0 * math.pow(alpha, -z) / (1 - alpha)
        else 1.0 - w0 * math.pow(alpha, z + 1) / (1 - alpha)
      // 16^13 = 2^52: the scaled CDF is an exactly-representable
      // integer. Cap at 16^13 − 1: a CDF value that rounds to exactly
      // 1.0 would scale to 2^52, whose hex form is FOURTEEN digits and
      // compares lexicographically SMALLER than any 13-digit uniform —
      // the capped all-f threshold keeps that bucket unreachable
      // (mass < 2^−52) instead of always-reached.
      val scaled = math.min(math.floor(f * 4503599627370496.0),
        4503599627370495.0).toLong
      f"$scaled%013x"
    }
  }

  /** Release-key format version, hashed into every DP noise draw.
    * v2 = len:value component framing (round 15+); v1 (round 14) was
    * the unframed pipe join. Bump on ANY change to the key framing so
    * old and new releases can never share (and thus average out) noise
    * draws. */
  val ReleaseKeyVersion = "v2"

  /** ε-differentially-private count release — the publication step past
    * the suppression gates (k-anonymity/l-diversity/t-closeness bound
    * LINKAGE; a released exact count still leaks presence, which only
    * noise addition bounds). Per-group noisy counts under the geometric
    * mechanism (the discrete Laplace — ε-DP for counting queries,
    * sensitivity 1), clamped to ±maxNoise (clamping is post-processing,
    * so ε-DP is preserved; α^maxNoise tail mass is negligible at the
    * defaults).
    *
    * The draw is DETERMINISTIC given `seed`: the group's uniform is the
    * first 13 hex digits of md5(groupKey ⊕ seed) and the noise is an
    * inverse-CDF lookup via [[dpThresholds]] — equal-length hex string
    * comparisons, so the release is reproducible across engines and
    * re-runs (a re-released dataset must not get FRESH noise: averaging
    * releases would cancel it). The group key is COLLISION-FREE framed:
    * each component is length-prefixed (`len:value`) before the `|`
    * join, so `("a|b","c")` and `("a","b|c")` — identical under a naive
    * pipe join — frame as `3:a|b|1:c` vs `1:a|3:b|c` and draw
    * independent noise. NULL components hash as a \u0001 sentinel
    * (concat_ws drops nulls — without the sentinel, (a,NULL) and
    * (a,"") would share one draw, correlating two groups' noise; a real
    * data value of exactly \u0001 is assumed absent).
    *
    * The key also carries an explicit RELEASE-KEY VERSION component
    * (`v2` = the len:value framing; v1 was round 14's unframed pipe
    * join). Determinism cuts both ways: a re-release under the same
    * seed must reproduce the SAME noise, while any framing change
    * silently reshuffles every draw -- so releases made under different
    * framings must never be treated as re-releases of one another
    * (averaging them would cancel the noise). Folding the version into
    * the hashed key makes the key spaces of different framings disjoint
    * BY CONSTRUCTION; any future framing change MUST bump the tag.
    *
    * Returns one row per group: groupCols, `__dp_released`
    * (count + noise; may be negative for near-empty groups — standard,
    * consumers clamp at will) and `__dp_noise` (audit only — publishing
    * noise alongside the release reveals the true count; emit ONLY
    * `__dp_released`). Scale shape: one grouped count; the noise is a
    * codegen'd projection over the slim group frame, no extra shuffle.
    */
  def dpCountRelease(df: DataFrame, groupCols: Seq[String],
      epsilon: Double, seed: Long, maxNoise: Int = 20): DataFrame = {
    require(groupCols.nonEmpty, "need group columns")
    require(epsilon > 0, "epsilon must be positive")
    require(maxNoise >= 1, "maxNoise must be at least 1")
    val thresholds = dpThresholds(epsilon, maxNoise)
    // len:value framing makes the joined key injective over the
    // component tuple; the sentinel is the VISIBLE escape (a raw 0x01
    // byte in source renders as lit("") and invites deletion).
    def framed(c: Column): Column =
      concat(length(c).cast("string"), lit(":"), c)
    val keyed = groupCols.map(c =>
      framed(coalesce(col(c).cast("string"), lit("\u0001"))))
    val u = substring(
      md5(concat_ws("|", (keyed :+ framed(lit(ReleaseKeyVersion)) :+
          framed(lit(seed.toString))): _*)
        .cast("binary")),
      1, 13)
    // inverse-CDF lookup as ONE array-literal filter, not a chain of
    // per-threshold CASE terms: a 2·maxNoise-deep `when` sum generates
    // pathologically large codegen (measured 2.3 s steady at maxNoise=60
    // vs 0.1 s for this form — superlinear in ladder length)
    val noise = (size(filter(lit(thresholds.toArray),
      t => u >= t)) - lit(maxNoise)).cast(LongType)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .select((groupCols.map(col) :+
        (col("__n") + noise).as("__dp_released") :+
        noise.as("__dp_noise")): _*)
  }

  /** ε-differentially-private SUM release — completes the private-
    * publication family past counts: per-group sums of an integer
    * contribution CLAMPED to [clampLo, clampHi] per row (clamping is
    * what bounds the sensitivity: one record's presence moves the sum
    * by at most Δ = max(|clampLo|, |clampHi|), so the geometric
    * mechanism with α = e^(−ε/Δ) is ε-DP for the clamped sum).
    *
    * Same deterministic inverse-CDF ladder as [[dpCountRelease]] (the
    * 13-hex-digit [[dpThresholds]] convention, α = e^(−ε/Δ)), same
    * collision-free `len:value` key framing with the \u0001 NULL
    * sentinel and `v2` release-key version component — plus a
    * `sum:<valueCol>` domain component so a count and
    * a sum released over the SAME groups and seed draw independent
    * noise. Noise support is ±maxNoise steps; choose maxNoise ≳ 4·Δ/ε
    * so the truncated tail mass stays negligible (truncation is
    * post-processing and preserves ε-DP regardless).
    *
    * NULL contributions are SKIPPED (absent contribution, not minimum
    * contribution — see the inline note); an all-NULL group releases
    * noise over a zero sum.
    *
    * Returns one row per group: groupCols, `__dp_released`
    * (clamped sum + noise) and `__dp_noise` (audit only — do not
    * publish). Scale shape: one codegen'd clamp projection + one
    * grouped sum; the noise is a projection over the slim group frame.
    */
  def dpSumRelease(df: DataFrame, groupCols: Seq[String], valueCol: String,
      epsilon: Double, clampLo: Long, clampHi: Long, seed: Long,
      maxNoise: Int = 60): DataFrame = {
    require(groupCols.nonEmpty, "need group columns")
    require(epsilon > 0, "epsilon must be positive")
    require(clampHi > clampLo, "clamp bounds must be a non-empty range")
    require(maxNoise >= 1, "maxNoise must be at least 1")
    val delta = math.max(math.abs(clampLo), math.abs(clampHi))
    require(delta >= 1, "clamp bounds must give sensitivity >= 1")
    val thresholds = dpThresholds(epsilon / delta, maxNoise)
    def framed(c: Column): Column =
      concat(length(c).cast("string"), lit(":"), c)
    val keyed = groupCols.map(c =>
      framed(coalesce(col(c).cast("string"), lit("\u0001"))))
    val u = substring(
      md5(concat_ws("|", (keyed :+ framed(lit(s"sum:$valueCol")) :+
          framed(lit(ReleaseKeyVersion)) :+
          framed(lit(seed.toString))): _*)
        .cast("binary")),
      1, 13)
    // array-literal filter, not a 2·maxNoise CASE chain — see
    // dpCountRelease (codegen size)
    val noise = (size(filter(lit(thresholds.toArray),
      t => u >= t)) - lit(maxNoise)).cast(LongType)
    // NULL contributions are SKIPPED, not clamped: greatest/least
    // IGNORE nulls, so a bare clamp would turn a NULL row into a
    // clampLo contribution (with a negative clampLo, every NULL row
    // silently DRAGS the released sum down). The DP reading is that an
    // absent contribution is not a minimum contribution -- a NULL row
    // adds nothing to the sum (the sensitivity argument is over record
    // PRESENCE; a record contributing nothing is indistinguishable
    // from an absent one). A group whose every contribution is NULL
    // releases noise alone (sum = 0).
    val clamped = when(col(valueCol).isNotNull,
      least(greatest(col(valueCol).cast(LongType),
        lit(clampLo)), lit(clampHi)))
    df.groupBy(groupCols.map(col): _*)
      .agg(coalesce(sum(clamped), lit(0L)).as("__s"))
      .select((groupCols.map(col) :+
        (col("__s") + noise).as("__dp_released") :+
        noise.as("__dp_noise")): _*)
  }

  /** ε-differentially-private HISTOGRAM release — completes the
    * private-publication family (count, sum, histogram): per-group
    * noisy bucket counts over a PUBLIC fixed bucket domain. A row's
    * bucket is ⌊value / binWidth⌋ clamped into [binLo, binHi] (the
    * clamp keeps the domain closed: out-of-range values land in the
    * edge buckets, standard DP-histogram practice). Each record
    * contributes to exactly ONE bucket, so per-bucket sensitivity is 1
    * and the geometric ladder with α = e^(−ε) is ε-DP for the whole
    * histogram — the buckets partition the data, so this is parallel
    * composition, not sequential: no ε split across buckets.
    *
    * EVERY bucket of the public domain is released for every observed
    * group, including empty ones (an absent bucket row would reveal
    * exact emptiness; an empty bucket here releases pure noise over
    * zero). Group rows come from the DATA's distinct group values — the
    * [[dpCountRelease]] convention (the group domain is as-observed;
    * releases over a public group domain should pre-union it in).
    *
    * Same deterministic inverse-CDF ladder and collision-free
    * `len:value` key framing as the count/sum releases, with the bucket
    * id framed into the key plus a `hist:<valueCol>:<binWidth>` domain
    * component, so a histogram never shares draws with a count or sum
    * over the same groups and seed. NULL contributions are SKIPPED (the
    * [[dpSumRelease]] absent-contribution reading); a group whose every
    * contribution is NULL releases pure noise across the whole domain.
    *
    * Returns one row per (group, bucket): groupCols, `__dp_bucket`,
    * `__dp_released` (count + noise; may be negative) and `__dp_noise`
    * (audit only — do not publish). Scale shape: one grouped count on
    * (group, bucket), one per-group map fold, one bounded
    * (binHi−binLo+1)-wide explode — no join, and the noise is a
    * codegen'd projection over the slim released frame.
    */
  def dpHistogramRelease(df: DataFrame, groupCols: Seq[String],
      valueCol: String, binWidth: Long, binLo: Long, binHi: Long,
      epsilon: Double, seed: Long, maxNoise: Int = 20): DataFrame = {
    require(groupCols.nonEmpty, "need group columns")
    require(binWidth >= 1, "binWidth must be at least 1")
    require(binHi >= binLo, "bucket domain must be non-empty")
    require(binHi - binLo < 65536,
      "bucket domain too wide — every group releases every bucket")
    require(epsilon > 0, "epsilon must be positive")
    require(maxNoise >= 1, "maxNoise must be at least 1")
    val thresholds = dpThresholds(epsilon, maxNoise)
    def framed(c: Column): Column =
      concat(length(c).cast("string"), lit(":"), c)
    val v = col(valueCol).cast(LongType)
    // floor division via pmod (correct for negative values too), then
    // the public-domain clamp; NULL contributions keep a NULL bucket
    // and are dropped from the per-group map below — never counted
    // the quotient must be computed exactly: Long/Long division in Spark
    // promotes to Double, which loses integer exactness above 2^53 and
    // can land a value one bucket off the oracle's integer `//`; the
    // numerator is an exact multiple of binWidth, so dividing in
    // DECIMAL(38,0) keeps the full Long range bucket-exact
    val rawBucket = ((v - pmod(v, lit(binWidth))).cast(DecimalType(38, 0)) /
      binWidth).cast(LongType)
    val bucket = when(v.isNotNull,
      least(greatest(rawBucket, lit(binLo)), lit(binHi)))
    val counts = df
      .groupBy((groupCols.map(col) :+ bucket.as("__b")): _*)
      .agg(count(lit(1)).as("__n"))
    val full = counts
      .groupBy(groupCols.map(col): _*)
      .agg(map_from_entries(filter(
        collect_list(struct(col("__b").as("key"), col("__n").as("value"))),
        e => e.getField("key").isNotNull)).as("__m"))
      .select((groupCols.map(col) :+ col("__m") :+
        explode(sequence(lit(binLo), lit(binHi))).as("__dp_bucket")): _*)
    val keyed = groupCols.map(c =>
      framed(coalesce(col(c).cast("string"), lit("\u0001"))))
    val u = substring(
      md5(concat_ws("|", (keyed :+
          framed(col("__dp_bucket").cast("string")) :+
          framed(lit(s"hist:$valueCol:$binWidth")) :+
          framed(lit(ReleaseKeyVersion)) :+
          framed(lit(seed.toString))): _*)
        .cast("binary")),
      1, 13)
    val noise = (size(filter(lit(thresholds.toArray),
      t => u >= t)) - lit(maxNoise)).cast(LongType)
    full.select((groupCols.map(col) :+ col("__dp_bucket") :+
      (coalesce(try_element_at(col("__m"), col("__dp_bucket")), lit(0L)) +
        noise).as("__dp_released") :+
      noise.as("__dp_noise")): _*)
  }
}
