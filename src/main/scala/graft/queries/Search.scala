package graft.queries

import graft.Tables
import graft.lake.Snapshots
import graft.operators.{Dedup, InvertedIndex}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-search, substring-level-dedup, and text-hygiene queries:
  * inverted-index construction, index-shaped phrase retrieval, ranked
  * retrieval, duplicated-substring span detection and removal (the
  * suffix-array-style exact-substring dedup family), winnowing (MOSS)
  * fingerprint similarity, count-min heavy hitters, and HTML boilerplate
  * cleaning. All arithmetic is integer/md5/exact-string → every query is
  * oracle-exact in DuckDB.
  */
object Search {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private val indexFoldDirs = scala.collection.concurrent.TrieMap.empty[String, String]

  /** q109's incremental fold, reusable by the Scale probe: split `d` into
    * three id-ordered batches and fold each into the term-keyed lake index
    * at `table` — append the first, then per batch compute partial stats
    * and merge-upsert ONLY the touched terms (df/cf sums are exact on
    * doc-disjoint batches; min/max merge the doc span).
    */
  def indexFold(s: SparkSession, d: DataFrame, table: String): Unit = {
    val maxId = d.agg(max(col("doc_id"))).head.getLong(0)
    val cuts = Seq(
      col("doc_id") < maxId / 3,
      col("doc_id") >= maxId / 3 && col("doc_id") < 2 * maxId / 3,
      col("doc_id") >= 2 * maxId / 3)
    val ts0 = lit("2024-01-01 00:00:00").cast("timestamp")
    cuts.zipWithIndex.foreach { case (cut, i) =>
      val part = InvertedIndex.indexStats(
        InvertedIndex.postings(d.filter(cut), "doc_id", "text"))
      if (i == 0) Snapshots.append(part.withColumn("ts", ts0), table)
      else {
        val ex = Snapshots.read(s, table).select(col("term"),
          col("df_docs").as("__df0"), col("cf").as("__cf0"),
          col("min_doc").as("__mn0"), col("max_doc").as("__mx0"))
        // touched terms only: untouched index rows never move
        val merged = part.join(ex, Seq("term"), "left")
          .select(col("term"),
            (col("df_docs") + coalesce(col("__df0"), lit(0L))).as("df_docs"),
            (col("cf") + coalesce(col("__cf0"), lit(0L))).as("cf"),
            least(col("min_doc"), col("__mn0")).as("min_doc"),
            greatest(col("max_doc"), col("__mx0")).as("max_doc"))
        Snapshots.mergeUpsert(s, table, merged.withColumn("ts", ts0), "term")
      }
    }
  }

  /** Shared one-shot index-stats oracle (all-docs corpus, top-20 by df):
    * q103 gates the one-shot build, q109 gates the incremental lake fold
    * against the SAME text — the fold must be batch-cut-independent.
    */
  private def sqlIndexTop20: String = s"""
        WITH tk AS (SELECT doc_id, $sqlToks AS tk FROM documents),
        post AS (SELECT doc_id, unnest(tk) AS term FROM tk)
        SELECT term,
               COUNT(DISTINCT doc_id)::BIGINT AS df_docs,
               COUNT(*)::BIGINT AS cf,
               MIN(doc_id) AS min_doc,
               MAX(doc_id) AS max_doc
        FROM post GROUP BY term
        ORDER BY df_docs DESC, term LIMIT 20"""

  /** Shared DuckDB scaffolding (the TextPipeline conventions). */
  private def sqlToks =
    raw"list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"
  private def sqlGram(n: Int): String =
    (1 to n).map(j => s"tk[i+$j]").mkString(" || ' ' || ")

  def defs: Seq[QueryDef] = Seq(

    // ---- q103: inverted-index construction — term→postings statistics.
    // The index build IS a word count with positions: one posexplode
    // (map), one exchange on the term with map-side partial aggregation.
    // At 100 TB the payload is (term, doc, pos) — bodies never shuffle —
    // and the stats row per term is what a query planner's term
    // dictionary holds. Top-k by document frequency gates the result.
    QueryDef(
      "q103_inverted_index",
      (s, dir) => {
        val post = InvertedIndex.postings(docs(s, dir), "doc_id", "text")
        InvertedIndex.indexStats(post)
          .orderBy(col("df_docs").desc, col("term"))
          .limit(20)
      },
      Some(sqlIndexTop20)),

    // ---- q104: phrase search THROUGH the index — the corpus's most
    // frequent bigram is the phrase (self-contained + deterministic:
    // cnt DESC, gram ASC argmax), matched by position-adjacency: a
    // posting for ordinal o anchors start = pos − o, and a (doc, start)
    // where every ordinal appears is an occurrence. The tiny phrase
    // frame broadcasts; only the phrase terms' postings survive the
    // join, so the corpus is scanned once and never self-joined.
    QueryDef(
      "q104_phrase_search",
      (s, dir) => {
        val en = docs(s, dir).filter(col("lang") === "en")
        // ONE tokenize pass, shared by postings and the bigram argmax —
        // tokenizing dominates this query's map cost, so the two
        // consumers must not each re-scan/re-split the corpus
        val tok = InvertedIndex.tokenized(en, "doc_id", "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val post = InvertedIndex.postingsFromTokens(tok)
        val top = tok
          .select(explode_outer(wordShingles(col("tk"), 2)).as("gram"))
          .filter(col("gram").isNotNull)
          .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("gram")).limit(1)
        val phrase = top
          .select(posexplode(split(col("gram"), " ")))
          .select(col("pos").cast("int").as("ord"), col("col").as("term"))
        val out = InvertedIndex.phraseMatches(post, phrase, k = 2)
          .groupBy(col("doc"))
          .agg(count(lit(1)).as("n_matches"))
          .orderBy(col("n_matches").desc, col("doc"))
          .limit(20)
          .select(col("doc").as("doc_id"), col("n_matches"))
          .localCheckpoint(true) // scoped cache: tiny result, then release
        tok.unpersist(false)
        out
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, $sqlToks AS tk FROM documents
                    WHERE lang = 'en'),
        post0 AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) + 1),
                    i -> {'pos': i, 'term': tk[i]})) AS pr FROM tk),
        post AS (SELECT doc_id, pr.pos AS pos, pr.term AS term FROM post0),
        grams AS (SELECT unnest(list_transform(range(0, len(tk) - 1),
                    i -> ${sqlGram(2)})) AS g FROM tk),
        top AS (SELECT g FROM (SELECT g, COUNT(*) AS cnt FROM grams GROUP BY g)
                ORDER BY cnt DESC, g LIMIT 1),
        phr AS (SELECT 0 AS ord, string_split(g, ' ')[1] AS term FROM top
                UNION ALL
                SELECT 1 AS ord, string_split(g, ' ')[2] AS term FROM top),
        m AS (SELECT post.doc_id, post.pos - phr.ord AS start
              FROM post JOIN phr ON post.term = phr.term
              WHERE post.pos - phr.ord >= 1
              GROUP BY 1, 2
              HAVING COUNT(DISTINCT phr.ord) = 2)
        SELECT doc_id, COUNT(*)::BIGINT AS n_matches
        FROM m GROUP BY doc_id
        ORDER BY n_matches DESC, doc_id LIMIT 20""")),

    // ---- q105: duplicated-substring span detection — the exact-substring
    // half of dedup (document-level fingerprints miss repeated
    // boilerplate INSIDE otherwise-distinct docs; the published recipe is
    // a suffix array, whose Spark-native substitute is fixed-width window
    // hashing). Every 8-token window is hashed (map), windows occurring
    // >= 2 times corpus-wide are flagged (one count-shuffle on the
    // 8-byte xxhash64 key — the q116 dictionary-encoding convention; the
    // oracle keeps md5 keys, counts identical modulo 64-bit collisions),
    // and per-doc coverage is the union of flagged [start, start+8)
    // intervals — exploded only for the flagged spans.
    QueryDef(
      "q105_dup_spans",
      (s, dir) => {
        val w = 8
        // pinned repartition BEFORE the tokenize+shingle+hash expansion:
        // the bench corpus is one parquet row group, so without it the
        // whole span derivation serializes on a single task (raced by the
        // three persist consumers); at lake scale the scan is already
        // parallel and this is one cheap narrow-input shuffle. Explicit
        // numPartitions → AQE never coalesces it (the q55 lesson).
        val spans = Dedup.spanTable(
            docs(s, dir).repartition(
              s.sparkContext.defaultParallelism, col("doc_id")),
            "doc_id", "text", w)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // EAGER materialization (the q86 lesson, r22): the final plan
        // fans this frame into THREE consumers before any action, and a
        // lazy persist's first materialization races across them — the
        // tokenize+shingle+hash pass ran up to 3x in parallel (stage
        // profile showed three ~5-8 s-task-sum derivation stages).
        // count() materializes the cache once and keeps its size
        // statistics (a localCheckpoint would lose them).
        spans.count()
        val nspans = spans.groupBy(col("doc"))
          .agg(count(lit(1)).as("n_spans"))
        val dups = Dedup.duplicatedSpans(spans)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        dups.count() // two consumers below — same race, same fix
        // ONE aggregation over the dup spans (r22): counts, cross-doc
        // split, and the coverage union — the native per-doc interval
        // sweep (SpanCoverage) replaces the exploded ×w position rows +
        // countDistinct exchange, and fusing it here drops a second
        // (doc)-keyed exchange and a third join
        val perDoc = dups.groupBy(col("doc")).agg(
          count(lit(1)).as("n_dup_spans"),
          sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_crossdoc_spans"),
          graft.plans.SpanCoverage(collect_list(col("start")), w)
            .as("covered_tokens"))
        val out = nspans
          .join(perDoc, Seq("doc"), "left")
          .select(col("doc").as("doc_id"), col("n_spans"),
            coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
            coalesce(col("n_crossdoc_spans"), lit(0L)).as("n_crossdoc_spans"),
            coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
          .orderBy(col("doc_id"))
          .localCheckpoint(true) // scoped cache: release both shared frames
        dups.unpersist(false)
        spans.unpersist(false)
        out
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, $sqlToks AS tk FROM documents),
        sp0 AS (SELECT doc_id, unnest(list_transform(range(0, len(tk) - 7),
                  i -> {'start': i + 1, 'h': md5(${sqlGram(8)})})) AS sp FROM tk),
        spans AS (SELECT doc_id, sp.start AS start, sp.h AS h FROM sp0),
        hh AS (SELECT h, COUNT(*)::BIGINT AS n_occ,
                      COUNT(DISTINCT doc_id)::BIGINT AS ndocs
               FROM spans GROUP BY h HAVING COUNT(*) >= 2),
        dsp AS (SELECT spans.doc_id, spans.start, hh.ndocs
                FROM spans JOIN hh USING (h)),
        ns AS (SELECT doc_id, COUNT(*)::BIGINT AS n_spans
               FROM spans GROUP BY doc_id),
        pd AS (SELECT doc_id, COUNT(*)::BIGINT AS n_dup_spans,
                      SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END)::BIGINT
                        AS n_crossdoc_spans
               FROM dsp GROUP BY doc_id),
        cov AS (SELECT doc_id, COUNT(DISTINCT p)::BIGINT AS covered_tokens
                FROM (SELECT doc_id, unnest(range(start, start + 8)) AS p
                      FROM dsp)
                GROUP BY doc_id)
        SELECT ns.doc_id, ns.n_spans,
               COALESCE(pd.n_dup_spans, 0)::BIGINT AS n_dup_spans,
               COALESCE(pd.n_crossdoc_spans, 0)::BIGINT AS n_crossdoc_spans,
               COALESCE(cov.covered_tokens, 0)::BIGINT AS covered_tokens
        FROM ns
        LEFT JOIN pd USING (doc_id)
        LEFT JOIN cov USING (doc_id)
        ORDER BY ns.doc_id""")),

    // ---- q106: winnowing (MOSS) fingerprint similarity — the
    // guarantee-bearing sparse fingerprint: any shared token run of
    // w+k−1 tokens shares >= 1 window-min hash, at ~2/(w+1) the density
    // of full shingling. Selection is per-row array arithmetic (zero
    // shuffle); pairing is the LSH bucket shape — group by fingerprint,
    // deterministic window-count cap (mirrored in the oracle), pair
    // within bucket, count shared fingerprints per pair.
    QueryDef(
      "q106_winnow_pairs",
      (s, dir) => {
        val en = docs(s, dir).filter(col("lang") === "en")
        val fps = Dedup.winnowFingerprints(en, "doc_id", "text", k = 3, w = 4)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nfp = fps.groupBy(col("doc")).agg(count(lit(1)).as("n_fp"))
        val out = Dedup.winnowSharedPairs(fps, maxBucketSize = Some(1000))
          .join(nfp.select(col("doc").as("id1"), col("n_fp").as("n1")), "id1")
          .join(nfp.select(col("doc").as("id2"), col("n_fp").as("n2")), "id2")
          .filter(col("shared") >= 2)
          .orderBy(col("shared").desc, col("id1"), col("id2"))
          .limit(50)
          .select(col("id1"), col("id2"), col("shared"), col("n1"), col("n2"))
          .localCheckpoint(true) // scoped cache: tiny result, then release
        fps.unpersist(false)
        out
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, $sqlToks AS tk FROM documents
                    WHERE lang = 'en'),
        g AS (SELECT doc_id, list_transform(range(0, len(tk) - 2),
                i -> ${sqlGram(3)}) AS gs FROM tk),
        h AS (SELECT doc_id,
                list_transform(gs, x -> substr(md5(x), 1, 8)) AS hs FROM g),
        f AS (SELECT doc_id,
                CASE WHEN len(hs) >= 4 THEN list_distinct(
                       list_transform(range(0, len(hs) - 3),
                         i -> list_min(hs[i+1:i+4])))
                     WHEN len(hs) > 0 THEN [list_min(hs)]
                     ELSE []::VARCHAR[] END AS fps FROM h),
        fp AS (SELECT doc_id, unnest(fps) AS fp FROM f),
        bn AS (SELECT fp, COUNT(*) AS b FROM fp GROUP BY fp),
        fpb AS (SELECT fp.doc_id, fp.fp FROM fp JOIN bn USING (fp)
                WHERE bn.b <= 1000),
        n AS (SELECT doc_id, COUNT(*)::BIGINT AS n_fp FROM fp GROUP BY doc_id),
        pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                      COUNT(*)::BIGINT AS shared
               FROM fpb a JOIN fpb b ON a.fp = b.fp AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
        SELECT id1, id2, shared, n1.n_fp AS n1, n2.n_fp AS n2
        FROM pr
        JOIN n n1 ON pr.id1 = n1.doc_id
        JOIN n n2 ON pr.id2 = n2.doc_id
        WHERE shared >= 2
        ORDER BY shared DESC, id1, id2 LIMIT 50""")),

    // ---- q107: ranked retrieval (integer BM25-lite) over the index —
    // tf-saturated, idf-weighted top-k scoring with EVERY weight in the
    // integer domain so ranking reproduces bit-exactly cross-engine:
    //   idf  ~ (N − df + ½)/(df + ½) → wt = (1000·(2(N−df)+1)) div (2df+1)
    //   tf   ~ tf·(k1+1)/(tf+k1), k1 = 1.2 → (wt·tf·22) div (10·tf+12)
    // (the BM25 log and length-normalization are deliberately dropped:
    // the log is not exactly portable across engines and neither changes
    // the df-monotonicity the rank depends on; magnitudes stay int64-safe
    // past 1e9 docs at the 1000× idf scale). Query terms are the top-3
    // mid-frequency terms (5 ≤ df ≤ 50, df DESC, term ASC) — derived from
    // the corpus, so the query is self-contained; the tiny (term, wt)
    // frame broadcasts into the tf table and only matching terms' rows
    // survive. Scoring shape at 100 TB: one tf exchange + one broadcast
    // join + one groupBy on doc — no corpus self-join, no sort until the
    // final top-k.
    QueryDef(
      "q107_ranked_search",
      (s, dir) => {
        val en = docs(s, dir).filter(col("lang") === "en")
        val tfq = InvertedIndex.termFrequencies(
          InvertedIndex.postings(en, "doc_id", "text"))
        val dfq = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = en.select(count(lit(1)).as("n_docs"))
        val qt = dfq.filter(col("df").between(5, 50))
          .orderBy(col("df").desc, col("term")).limit(3)
          .crossJoin(broadcast(n))
          .select(col("term"),
            expr("(1000 * (2 * (n_docs - df) + 1)) div (2 * df + 1)").as("wt"))
        tfq.join(broadcast(qt), "term")
          .withColumn("__c", expr("(wt * tf * 22) div (10 * tf + 12)"))
          .groupBy(col("doc"))
          .agg(sum(col("__c")).as("score"), count(lit(1)).as("n_terms"))
          .orderBy(col("score").desc, col("doc"))
          .limit(10)
          .select(col("doc").as("doc_id"), col("score"), col("n_terms"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, $sqlToks AS tk FROM documents
                    WHERE lang = 'en'),
        post AS (SELECT doc_id, unnest(tk) AS term FROM tk),
        tfq AS (SELECT term, doc_id, COUNT(*)::BIGINT AS tf
                FROM post GROUP BY 1, 2),
        dfq AS (SELECT term, COUNT(*)::BIGINT AS df FROM tfq GROUP BY 1),
        n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents
              WHERE lang = 'en'),
        qt AS (SELECT term,
                      (1000 * (2 * (n_docs - df) + 1)) // (2 * df + 1) AS wt
               FROM (SELECT term, df FROM dfq WHERE df BETWEEN 5 AND 50
                     ORDER BY df DESC, term LIMIT 3)
               CROSS JOIN n),
        sc AS (SELECT tfq.doc_id,
                      SUM((wt * tf * 22) // (10 * tf + 12))::BIGINT AS score,
                      COUNT(*)::BIGINT AS n_terms
               FROM tfq JOIN qt USING (term) GROUP BY 1)
        SELECT doc_id, score, n_terms FROM sc
        ORDER BY score DESC, doc_id LIMIT 10""")),

    // ---- q108: count-min heavy hitters — frequency estimation with d×m
    // cells of FIXED state (d=4, m=256) no matter the vocabulary: the
    // 100 TB shape for hot-key detection when the exact term table is
    // itself huge, and the additive-merge state a streaming profile
    // carries. Hashing is the salted md5-chunk family, so the sketch —
    // and every estimate — rebuilds bit-exactly in the oracle; the output
    // pairs each top-20 true count with its estimate and slack (est −
    // true ≥ 0 by construction: min of per-row overcounts).
    QueryDef(
      "q108_heavy_hitters",
      (s, dir) => {
        import graft.operators.CountMin
        val d = 4
        val m = 256
        val en = docs(s, dir).filter(col("lang") === "en")
        val tc = en.select(explode_outer(tokens(col("text"))).as("term"))
          .filter(col("term").isNotNull)
          .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cells = CountMin.counters(tc, "term", "cnt", d, m)
        val top = tc.orderBy(col("cnt").desc, col("term")).limit(20)
        val out = CountMin.estimate(cells, top.select(col("term")), "term", d, m)
          .join(broadcast(top), "term")
          .select(col("term"), col("cnt").as("true_cnt"), col("cm_est"),
            (col("cm_est") - col("cnt")).as("slack"))
          .orderBy(col("true_cnt").desc, col("term"))
          .localCheckpoint(true) // scoped cache: tiny result, then release
        tc.unpersist(false)
        out
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, $sqlToks AS tk FROM documents
                    WHERE lang = 'en'),
        tc AS (SELECT unnest(tk) AS term FROM tk),
        cnts AS (SELECT term, COUNT(*)::BIGINT AS cnt FROM tc GROUP BY term),
        rr AS (SELECT unnest([0, 1, 2, 3]) AS r),
        cells AS (SELECT r,
                    ('0x' || substr(md5(term || '#cm' || r), 1, 8))::BIGINT % 256
                      AS bucket,
                    SUM(cnt)::BIGINT AS cell
                  FROM cnts CROSS JOIN rr
                  GROUP BY 1, 2),
        top AS (SELECT term, cnt FROM cnts ORDER BY cnt DESC, term LIMIT 20),
        probes AS (SELECT term, r,
                     ('0x' || substr(md5(term || '#cm' || r), 1, 8))::BIGINT % 256
                       AS bucket
                   FROM top CROSS JOIN rr),
        est AS (SELECT term, MIN(cell)::BIGINT AS cm_est
                FROM probes JOIN cells USING (r, bucket)
                GROUP BY term)
        SELECT top.term, top.cnt AS true_cnt, est.cm_est,
               (est.cm_est - top.cnt)::BIGINT AS slack
        FROM top JOIN est USING (term)
        ORDER BY true_cnt DESC, top.term""")),

    // ---- q109: INCREMENTAL index maintenance through the lake — the
    // production posture: a corpus arrives in batches and the index must
    // accumulate without rescanning history. Three id-ordered batches
    // fold into a term-keyed lake table; each round computes the BATCH's
    // partial stats (one small exchange), reads the current index, and
    // merge-upserts only the touched terms (df/cf sums — exact because
    // batches are doc-disjoint; min/max merge for the doc span). The gate
    // is batch-cut independence: the folded index must equal q103's
    // one-shot oracle bit for bit. At 100 TB each round's cost is the NEW
    // batch's size plus a join against only its own terms' index rows —
    // history is never rescanned (the q96/q81 composition pattern).
    QueryDef(
      "q109_index_incremental",
      (s, dir) => {
        val tmp = graft.util.Fingerprint.memo(indexFoldDirs, dir,
            Seq("documents"), "", graft.util.Fingerprint.deleteDir)({
          val t = java.nio.file.Files
            .createTempDirectory("graft_index_fold").toString
          indexFold(s, docs(s, dir), s"$t/index")
          t
        })
        Snapshots.read(s, s"$tmp/index")
          .select(col("term"), col("df_docs"), col("cf"),
            col("min_doc"), col("max_doc"))
          .orderBy(col("df_docs").desc, col("term"))
          .limit(20)
      },
      Some(sqlIndexTop20)),

    // ---- q110: substring-dedup EMISSION — the deletion half of q105
    // (the published recipe removes the repeated substrings themselves;
    // document-level dedup can't touch boilerplate inside otherwise-
    // distinct docs). Canonical copy = lexicographically-first
    // (doc, start) occurrence per span text; every token position covered
    // by a non-canonical duplicated 8-token span is dropped; cleaned docs
    // rebuild from the surviving postings. Output gates the rebuilt text
    // via md5 plus exact kept/removed counts. All-langs corpus, total
    // (doc_id) order.
    QueryDef(
      "q110_despan_emit",
      (s, dir) => {
        val w = 8
        val d = docs(s, dir)
        // ONE tokenize pass shared by the postings (rebuild side) and the
        // span hashing (detection side) — the persisted frame is the token
        // arrays, cheaper to hold than the exploded postings and feeding
        // both derivations without re-splitting the corpus
        // pinned repartition before tokenizing (q105's rationale): the
        // single-row-group bench corpus would otherwise serialize the
        // tokenize pass — and every array-mask consumer of it — on 1 task
        val tok = InvertedIndex.tokenized(
            d.repartition(s.sparkContext.defaultParallelism, col("doc_id")),
            "doc_id", "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // EAGER (q86 lesson, r22): three consumers fan off this frame in
        // ONE final plan — a lazy persist's first materialization races
        // across the branches and re-runs the tokenize per branch
        tok.count()
        // the span-hash frame feeds BOTH detection sides (the occurrence
        // count and the join-back that re-attaches (doc, start)) — without
        // a persist the posexplode+md5 pass runs twice (the q104
        // shared-frame lesson applied here too)
        val spans = Dedup.spanTableFromTokens(tok, w)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        spans.count() // two consumers — same race, same fix
        val clean = Dedup.removeDuplicatedSpansFromTokens(tok,
          Dedup.duplicatedSpansLite(spans), w)
        // per-doc token count straight off the cached token arrays — no
        // explode, no count-shuffle. size>0 filter keeps parity with the
        // postings-groupBy form (a token-less doc has no postings rows)
        val nTok = tok.filter(size(col("tk")) > 0)
          .select(col("doc"), size(col("tk")).cast("long").as("n_tokens"))
        // q32's scoped-cache convention: materialize the (small) result
        // eagerly, then release both shared frames — library callers must
        // not inherit two corpus-sized cache entries per invocation
        val out = nTok.join(clean, Seq("doc"), "left")
          .select(col("doc").as("doc_id"), col("n_tokens"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
            md5(coalesce(col("clean_text"), lit(""))).as("clean_md5"))
          .orderBy(col("doc_id"))
          .localCheckpoint(true)
        spans.unpersist(false)
        tok.unpersist(false)
        out
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, $sqlToks AS tk FROM documents),
        post0 AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) + 1),
                    i -> {'pos': i, 'term': tk[i]})) AS pr FROM tk),
        post AS (SELECT doc_id, pr.pos AS pos, pr.term AS term FROM post0),
        sp0 AS (SELECT doc_id, unnest(list_transform(range(0, len(tk) - 7),
                  i -> {'start': i + 1, 'h': md5(${sqlGram(8)})})) AS sp FROM tk),
        spans AS (SELECT doc_id, sp.start AS start, sp.h AS h FROM sp0),
        hh AS (SELECT h FROM spans GROUP BY h HAVING COUNT(*) >= 2),
        dsp AS (SELECT spans.doc_id, spans.start, spans.h,
                       ROW_NUMBER() OVER (PARTITION BY spans.h
                         ORDER BY spans.doc_id, spans.start) AS rn
                FROM spans JOIN hh USING (h)),
        covered AS (SELECT DISTINCT doc_id, pos FROM
                      (SELECT doc_id, unnest(range(start, start + 8)) AS pos
                       FROM dsp WHERE rn > 1)),
        kept AS (SELECT post.doc_id, post.pos, post.term
                 FROM post LEFT JOIN covered
                   ON post.doc_id = covered.doc_id AND post.pos = covered.pos
                 WHERE covered.pos IS NULL),
        clean AS (SELECT doc_id, COUNT(*)::BIGINT AS n_kept,
                         string_agg(term, ' ' ORDER BY pos) AS clean_text
                  FROM kept GROUP BY doc_id),
        nt AS (SELECT doc_id, COUNT(*)::BIGINT AS n_tokens
               FROM post GROUP BY doc_id)
        SELECT nt.doc_id, nt.n_tokens,
               COALESCE(clean.n_kept, 0)::BIGINT AS n_kept,
               (nt.n_tokens - COALESCE(clean.n_kept, 0))::BIGINT AS n_removed,
               md5(COALESCE(clean.clean_text, '')) AS clean_md5
        FROM nt LEFT JOIN clean USING (doc_id)
        ORDER BY nt.doc_id""")),

    // ---- q111: HTML/boilerplate cleaning — the web-corpus hygiene pass
    // that precedes every quality/dedup stage. Script/style blocks drop
    // WITH contents, remaining tags strip, the five standard entities
    // unescape in a fixed order (&amp; last — one level per pass), then
    // whitespace collapses. The corpus is plain text, so a deterministic
    // HTML wrapper is spliced onto every 3rd doc (every 9th also gets a
    // script block) — identical on the oracle side, the q98 fixture
    // pattern. One codegen'd regexp chain, zero shuffle, linear in bytes.
    QueryDef(
      "q111_html_clean",
      (s, dir) => {
        import graft.operators.TextAnalysis
        val wrapped = concat(lit("<div class=\"wrap\"><p>"), col("text"),
          lit("</p> &amp; <b>tail</b></div>"))
        val raw = when(col("doc_id") % 9 === 0,
            concat(lit("<script type=\"text/javascript\">var x = 1;</script>"),
              wrapped))
          .when(col("doc_id") % 3 === 0, wrapped)
          .otherwise(col("text"))
        docs(s, dir)
          .select(col("doc_id"), raw.as("__raw"))
          .select(col("doc_id"), col("__raw"),
            TextAnalysis.stripHtml(col("__raw")).as("__clean"))
          .select(col("doc_id"),
            length(col("__raw")).cast("long").as("raw_len"),
            size(regexp_extract_all(col("__raw"), lit("<[^>]*>"), lit(0)))
              .cast("long").as("n_tags"),
            length(col("__clean")).cast("long").as("clean_len"),
            md5(col("__clean")).as("clean_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH r AS (SELECT doc_id,
          CASE WHEN doc_id % 9 = 0
               THEN '<script type="text/javascript">var x = 1;</script><div class="wrap"><p>'
                    || text || '</p> &amp; <b>tail</b></div>'
               WHEN doc_id % 3 = 0
               THEN '<div class="wrap"><p>' || text
                    || '</p> &amp; <b>tail</b></div>'
               ELSE text END AS raw
          FROM documents),
        c AS (SELECT doc_id, raw,
          trim(regexp_replace(
            replace(replace(replace(replace(replace(
              regexp_replace(regexp_replace(raw,
                '<script[^>]*>.*?</script>|<style[^>]*>.*?</style>', '', 'g'),
                '<[^>]*>', '', 'g'),
              '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
              '&amp;', '&'),
            '\s+', ' ', 'g')) AS clean
          FROM r)
        SELECT doc_id, length(raw)::BIGINT AS raw_len,
               len(regexp_extract_all(raw, '<[^>]*>'))::BIGINT AS n_tags,
               length(clean)::BIGINT AS clean_len,
               md5(clean) AS clean_md5
        FROM c ORDER BY doc_id""")),

    // ---- q112: C4-style content gates — badword share, URL count, first
    // domain (the blocklist key), and the deterministic keep decision.
    // The plain-text corpus gets URLs spliced onto every 5th doc (every
    // 10th gets two extra spam links and fails the URL gate) — identical
    // on the oracle side. The badword lexicon draws from the corpus's own
    // vocabulary so the share gate actually fires. Zero shuffle: one map
    // pass per doc; the decision is pure integer arithmetic.
    QueryDef(
      "q112_content_gates",
      (s, dir) => {
        import graft.operators.TextAnalysis
        val spliced = docs(s, dir).select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 10 === 0,
              concat(lit(" see https://ex"), col("doc_id") % 7,
                lit(".example.com/path?q=1 ok"),
                lit(" http://spam.example.net/x http://spam.example.net/y")))
              .when(col("doc_id") % 5 === 0,
                concat(lit(" see https://ex"), col("doc_id") % 7,
                  lit(".example.com/path?q=1 ok")))
              .otherwise(lit(""))).as("text"))
        TextAnalysis.contentGates(spliced, "doc_id", "text",
            badwords = Seq("slow", "dup", "scan"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH r AS (SELECT doc_id,
          text || CASE
            WHEN doc_id % 10 = 0
            THEN ' see https://ex' || (doc_id % 7)::VARCHAR
                 || '.example.com/path?q=1 ok'
                 || ' http://spam.example.net/x http://spam.example.net/y'
            WHEN doc_id % 5 = 0
            THEN ' see https://ex' || (doc_id % 7)::VARCHAR
                 || '.example.com/path?q=1 ok'
            ELSE '' END AS text
          FROM documents),
        t AS (SELECT doc_id, $sqlToks AS tk,
                     regexp_extract_all(text, 'https?://([^/\\s]+)', 1) AS dom
              FROM r)
        SELECT doc_id,
               len(tk)::BIGINT AS n_tokens,
               len(list_filter(tk, x -> x IN ('slow', 'dup', 'scan')))::BIGINT
                 AS n_bad,
               len(dom)::BIGINT AS n_urls,
               COALESCE(dom[1], '') AS first_domain,
               (len(list_filter(tk, x -> x IN ('slow', 'dup', 'scan'))) * 5
                  < len(tk)
                AND len(dom) <= 2 AND len(tk) >= 5) AS keep
        FROM t ORDER BY doc_id""")),

    // ---- q113: the curation pipeline COMPOSED — exact dedup canonical ∧
    // quality gate ∧ percentile length trim folded into one per-doc
    // decision (the q95-style composition gate for the text family: each
    // stage is oracle-verified alone — q30/q37/q91 — and here their
    // conjunction must reproduce). Shapes: fingerprint canonical is one
    // hash-shuffle of (fp, id) pairs; the quality gate is map-only; the
    // length bounds are a one-row broadcast — no corpus self-join
    // anywhere, the same plans the standalone queries ship.
    QueryDef(
      "q113_curation_pipeline",
      (s, dir) => {
        import graft.operators.TextAnalysis
        val d = docs(s, dir)
        // canonical = min doc_id of the normalized-content fingerprint
        val canon = d.select(col("doc_id"),
            graft.functions.TextFunctions.contentFingerprint(col("text")).as("__fp"))
          .withColumn("__min_id", min(col("doc_id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))))
          .select(col("doc_id"), (col("doc_id") === col("__min_id")).as("is_canonical"))
        val quality = TextAnalysis.qualityScore(d, "text")
          .select(col("doc_id"), (col("quality_score") >= 0.5).as("q_ok"))
        val bounds = d.agg(
          percentile(col("n_chars"), lit(0.05)).as("__lo"),
          percentile(col("n_chars"), lit(0.95)).as("__hi"))
        val lenOk = d.crossJoin(broadcast(bounds))
          .select(col("doc_id"),
            (col("n_chars") >= col("__lo") && col("n_chars") <= col("__hi"))
              .as("len_ok"))
        canon.join(quality, "doc_id").join(lenOk, "doc_id")
          .select(col("doc_id"), col("is_canonical"), col("q_ok"), col("len_ok"),
            (col("is_canonical") && col("q_ok") && col("len_ok")).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH t AS (SELECT doc_id, text, n_chars, $sqlToks AS tk FROM documents),
        fp AS (SELECT doc_id, n_chars, text, tk,
                      md5(array_to_string(tk, ' ')) AS f
               FROM t),
        canon AS (SELECT doc_id,
                         doc_id = MIN(doc_id) OVER (PARTITION BY f)
                           AS is_canonical
                  FROM fp),
        q AS (SELECT doc_id,
                     (LEAST(1.0, len(tk)::DOUBLE / 100.0) * 0.5
                      + length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE
                        / length(text) * 0.5) >= 0.5 AS q_ok
              FROM t),
        b AS (SELECT quantile_cont(n_chars, 0.05) AS lo,
                     quantile_cont(n_chars, 0.95) AS hi
              FROM documents),
        l AS (SELECT doc_id, (n_chars >= b.lo AND n_chars <= b.hi) AS len_ok
              FROM documents, b)
        SELECT canon.doc_id, is_canonical, q_ok, len_ok,
               (is_canonical AND q_ok AND len_ok) AS keep
        FROM canon
        JOIN q USING (doc_id)
        JOIN l USING (doc_id)
        ORDER BY canon.doc_id""")),

    // ---- q159: HYBRID retrieval — lexical (integer BM25-lite,
    // more-like-this over the query doc's own terms) and vector (exact
    // double cosine over the aligned embeddings) shortlists fused by
    // reciprocal-rank fusion: rrf = Σ 1000000 div (60 + rank) over the
    // modalities that shortlisted the candidate (integer division —
    // fused scores exact int64, engine-portable; k0=60 is the published
    // default). The modern retrieval stack in one gated query: each
    // modality ranks top-20 per query (self excluded, ties id-asc),
    // fusion keeps top-5 by (rrf desc, id). At 100 TB each modality's
    // shortlist is per-query-bounded, so fusion cost ∝ queries·R — the
    // corpus is touched only by the two retrieval paths themselves.
    QueryDef(
      "q159_hybrid_rrf",
      (s, dir) => {
        import graft.operators.Ranking
        import graft.functions.VectorFunctions
        import org.apache.spark.sql.expressions.Window
        val d = docs(s, dir)
        val qids = Seq(3L, 4L, 5L)
        // lexical: tf/df over the corpus, query terms = the query doc's
        // own distinct terms, q107's saturating integer tf·idf
        val tfq = InvertedIndex.termFrequencies(
            InvertedIndex.postings(d, "doc_id", "text"))
          .localCheckpoint(true) // read for query terms AND candidates
        val nDocs = d.count()
        val dfq = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
          .withColumn("wt",
            expr(s"(1000 * (2 * ($nDocs - df) + 1)) div (2 * df + 1)"))
        val qt = tfq.filter(col("doc").isin(qids: _*))
          .select(col("doc").as("qid"), col("term"))
          .join(dfq.select(col("term"), col("wt")), Seq("term"))
        val wl = Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("id"))
        val lex = tfq.join(broadcast(qt), Seq("term"))
          .filter(col("doc") =!= col("qid"))
          .withColumn("__c", expr("(wt * tf * 22) div (10 * tf + 12)"))
          .groupBy(col("qid"), col("doc").as("id"))
          .agg(sum(col("__c")).as("score"))
          .withColumn("rank", row_number().over(wl))
          .filter(col("rank") <= 20)
          .select(col("qid"), col("id"), col("rank"))
        // vector: exact double cosine on the id-aligned embeddings
        val v = Tables.load(s, dir, "embeddings")
          .select(col("vec_id").as("id"),
            VectorFunctions.asDouble(col("embedding")).as("vec"))
        val qv = v.filter(col("id").isin(qids: _*))
          .select(col("id").as("qid"), col("vec").as("qvec"))
        val wv = Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("id"))
        val vec = v.crossJoin(broadcast(qv))
          .filter(col("id") =!= col("qid"))
          .withColumn("cos", VectorFunctions.cosine(col("qvec"), col("vec")))
          .withColumn("rank", row_number().over(wv))
          .filter(col("rank") <= 20)
          .select(col("qid"), col("id"), col("rank"))
        Ranking.rrfFuse(Seq("lex" -> lex, "vec" -> vec), topK = 5)
          .select(col("qid"), col("id").as("doc_id"), col("rrf"),
            col("lex_rank"), col("vec_rank"))
          .orderBy(col("qid"), col("rrf").desc, col("doc_id"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, $sqlToks AS tk FROM documents),
        post AS (SELECT doc_id, unnest(tk) AS term FROM tk),
        tfq AS (SELECT term, doc_id, COUNT(*)::BIGINT AS tf
                FROM post GROUP BY 1, 2),
        n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents),
        dfq AS (SELECT term, COUNT(*)::BIGINT AS df,
                       (1000 * (2 * ((SELECT n_docs FROM n) - COUNT(*)) + 1))
                         // (2 * COUNT(*) + 1) AS wt
                FROM tfq GROUP BY term),
        q AS (SELECT unnest([3, 4, 5]) AS qid),
        qt AS (SELECT tfq.doc_id AS qid, tfq.term, dfq.wt
               FROM tfq JOIN q ON tfq.doc_id = q.qid
               JOIN dfq ON dfq.term = tfq.term),
        lexs AS (SELECT qt.qid, tfq.doc_id AS id,
                        SUM((qt.wt * tfq.tf * 22) // (10 * tfq.tf + 12))::BIGINT AS score
                 FROM qt JOIN tfq ON tfq.term = qt.term
                 WHERE tfq.doc_id <> qt.qid
                 GROUP BY 1, 2),
        lexr AS (SELECT qid, id, r FROM (
                   SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY score DESC, id) AS r FROM lexs)
                 WHERE r <= 20),
        v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
        qv AS (SELECT v.id AS qid, v.vec AS qvec FROM v JOIN q ON v.id = q.qid),
        coss AS (SELECT qv.qid, v.id,
                   list_sum(list_transform(range(1, 65), i -> qvec[i] * vec[i])) /
                   (sqrt(list_sum(list_transform(range(1, 65), i -> qvec[i] * qvec[i]))) *
                    sqrt(list_sum(list_transform(range(1, 65), i -> vec[i] * vec[i])))) AS cos
                 FROM v CROSS JOIN qv WHERE v.id <> qv.qid),
        vecr AS (SELECT qid, id, r FROM (
                   SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY cos DESC, id) AS r FROM coss)
                 WHERE r <= 20),
        fused AS (SELECT COALESCE(l.qid, ve.qid) AS qid,
                         COALESCE(l.id, ve.id) AS id,
                         (COALESCE(1000000 // (60 + l.r), 0) +
                          COALESCE(1000000 // (60 + ve.r), 0))::BIGINT AS rrf,
                         l.r AS lex_rank, ve.r AS vec_rank
                  FROM lexr l FULL OUTER JOIN vecr ve
                    ON l.qid = ve.qid AND l.id = ve.id)
        SELECT qid, id AS doc_id, rrf, lex_rank, vec_rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY rrf DESC, id) AS rk FROM fused)
        WHERE rk <= 5
        ORDER BY qid, rrf DESC, doc_id""")),

    // ---- q160: Unicode-NFC-normalized exact dedup — the curation
    // primitive crawled corpora need before keying: combining-mark
    // variants of the same text (`e`+U+0301 vs precomposed U+00E9) hash
    // apart and survive exact dedup unless keys normalize first. The
    // corpus is unioned with a variant copy of itself whose appended
    // marker differs ONLY in composition form (plus case and whitespace
    // noise); the dedup key = whitespace-collapsed lower(NFC(text)), so
    // each variant pair collapses to one group iff the custom
    // [[graft.plans.NfcNormalize]] expression (codegen'd
    // java.text.Normalizer) agrees byte-for-byte with DuckDB's
    // nfc_normalize. Output: one row per key group (canonical = min id,
    // n = 2 everywhere when normalization works; any 1-count group is a
    // normalization miss caught by the hash gate).
    QueryDef(
      "q160_nfc_dedup",
      (s, dir) => {
        import graft.plans.NfcNormalize
        val d = docs(s, dir).select(col("doc_id"), col("text"))
        // original: decomposed marker, spaced + upper-cased noise
        val a = d.select(col("doc_id"),
          concat(col("text"), lit(" CAFÉ  X")).as("t"))
        // variant copy: precomposed marker, single-spaced lower noise
        val b = d.select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" café x")).as("t"))
        a.unionAll(b)
          .withColumn("key", regexp_replace(
            lower(NfcNormalize(col("t"))), "\\s+", " "))
          .groupBy(col("key"))
          .agg(min(col("doc_id")).as("canonical"),
            count(lit(1)).as("n"))
          .select(col("canonical"), col("n"),
            length(col("key")).as("key_len"))
          .orderBy(col("canonical"))
      },
      Some("""
        WITH a AS (SELECT doc_id, text || ' CAFÉ  X' AS t FROM documents
                   UNION ALL
                   SELECT doc_id + 1000000, text || ' café x' FROM documents),
        k AS (SELECT doc_id, regexp_replace(lower(nfc_normalize(t)),
                                            '\s+', ' ', 'g') AS key
              FROM a)
        SELECT MIN(doc_id) AS canonical, COUNT(*)::BIGINT AS n,
               length(key)::BIGINT AS key_len
        FROM k
        GROUP BY key
        ORDER BY canonical"""))
  )
}
