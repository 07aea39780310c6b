package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextHash._

/**
 * Text analysis for training-data pipelines (SURVEY.md §2.5): token
 * counting, quality scoring, language identification, and document
 * fingerprinting. All pure built-in-function pipelines — codegen'd,
 * deterministic, and replayable by the DuckDB oracle.
 *
 * Scale: every operator here is a narrow per-row map (no shuffle at all)
 * except the bottom-k fingerprint, which is one explode + one per-document
 * window — both linear.
 */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword LangId
    * heuristic. Real pipelines would load fastText-style models; the
    * operator shape (profile intersect + argmax) is the same. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"))

  private def toks(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(toks(text)).cast("long")

  /** BPE-ish subword piece count: alpha runs + digit runs + single
    * punctuation marks, approximating a byte-pair tokenizer's piece count
    * without a vocabulary. */
  def pieceCount(text: Column): Column =
    (size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))))
      .cast("long")

  /** Mean token length in characters (separators excluded). */
  def meanTokenLength(text: Column): Column = {
    val n = size(toks(text))
    (length(text) - (n - lit(1))).cast("double") / n.cast("double")
  }

  /** Fraction of tokens that are English stopwords (frequency-weighted). */
  def stopwordRatio(text: Column): Column = {
    val profile = typedLit(langProfiles.head._2)
    size(filter(toks(text), t => array_contains(profile, t))).cast("double") /
      size(toks(text)).cast("double")
  }

  /** Fraction of characters that are alphanumeric or space. */
  def alnumRatio(text: Column): Column =
    (length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))).cast("double") /
      length(text).cast("double")

  /** Composite quality score in [0, 1]: length credit + structure credits.
    * The exact arithmetic order is part of the contract (oracle replays it
    * term-for-term). */
  def qualityScore(text: Column): Column = {
    val lenCredit = least(tokenCount(text).cast("double") / lit(100.0), lit(1.0))
    lit(0.4) * lenCredit +
      lit(0.3) * alnumRatio(text) +
      lit(0.3) * (lit(1.0) - stopwordRatio(text))
  }

  /** Stopword-profile language ID: argmax of distinct-profile-word hits,
    * first-profile-wins ties, 'und' when nothing matches. */
  def languageId(text: Column): Column = {
    val distinctToks = array_distinct(toks(text))
    val scores = langProfiles.map { case (lang, words) =>
      lang -> size(array_intersect(distinctToks, typedLit(words)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Language ID with CONFIDENCE: a struct of (lang, best_hits,
    * second_hits, margin, is_mixed) — the top-2 profile hit counts and
    * their gap, plus a mixed-language flag (another profile matches and
    * trails the winner by <= 1 distinct hit). This is the signal real
    * pipelines act on AFTER coarse langid: 'und' drops, low-margin docs
    * route to a stronger model or a mixed-language track. Exact integer
    * hit counts, first-profile-wins ties like [[languageId]]; one narrow
    * codegen projection. */
  def languageIdDetail(text: Column): Column = {
    val distinctToks = array_distinct(toks(text))
    val scores = langProfiles.map { case (lang, words) =>
      lang -> size(array_intersect(distinctToks, typedLit(words))).cast("long")
    }
    val sorted = array_sort(array(scores.map(_._2): _*))
    val best = element_at(sorted, -1)
    val second = element_at(sorted, -2)
    val lang = scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    struct(lang.as("lang"), best.as("best_hits"), second.as("second_hits"),
      (best - second).as("margin"),
      (second > 0 && best - second <= 1 && best > 0).as("is_mixed"))
  }

  /**
   * Per-document n-gram NOVELTY: the fraction of a doc's distinct word
   * n-grams occurring in NO other document (corpus df == 1) — the
   * soft-dedup sampling signal: a page stitched together from text that
   * exists elsewhere adds little to a training mix even when no single
   * near-dup pair fires, and down-weighting by novelty is the graded
   * version of dropping it. Short docs fall back to one whole-text gram
   * (the [[TextHash.wordShingles]] contract, same as decontamination).
   *
   * Shape: one gram-keyed exchange shared by the df count and the
   * join-back (repartition before both consumers), then one doc-keyed
   * aggregate — the duplicated-spans cost profile at n-gram (not
   * stride-1 window) cardinality. Exact integer counts.
   */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, "ngramNovelty: n >= 1")
    val grams = docs.select(col(idCol).as("doc_id"),
        explode(TextHash.wordShingles(col(textCol), n)).as("gram"))
      .repartition(col("gram"))
    // Grams are distinct within a doc, so a plain count IS the doc
    // frequency.
    val dfs = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    grams.join(dfs, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("novel_grams"))
      .withColumn("novelty",
        round(col("novel_grams").cast("double") / col("n_grams"), 6))
  }

  /**
   * BM25 ranked retrieval for a bounded keyword query — the classic
   * corpus-search scoring (Robertson/Sparck Jones):
   *
   *   score(d) = sum over query terms of
   *     idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
   *   idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)
   *
   * Scale shape: per-term tf is a NARROW per-row filter count (query terms
   * are a handful of literals — no token explode, no shuffle); N/avgdl/df
   * are one constant-size aggregate broadcast back as a 1-row cross join;
   * the final top-k is a TakeOrdered (no global sort materialization).
   * The only data-sized movement is the corpus scan itself.
   *
   * Scores are rounded to 6 decimals: ln() is the one operation here
   * whose last ulp may differ across engines' libm.
   */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: need at least one query term")
    val tk = toks(col(textCol))
    val withTf = docs.select(
      (col(idCol).as("doc_id") +: size(tk).cast("double").as("dl") +:
        queryTerms.zipWithIndex.map { case (t, i) =>
          size(filter(tk, x => x === lit(t))).cast("double").as(s"tf$i")
        }): _*)
    bm25Rank(withTf, queryTerms.size, k, k1, b)
  }

  /** The shared BM25 ranking tail over (doc_id, dl, tf0..tfn) rows:
    * corpus stats as a 1-row broadcast, the fixed left-fold score
    * expression, positive filter, TakeOrdered top-k. Every aggregate is
    * integer-valued in double (dl/tf/df/N are counts), so the result is
    * bit-identical however the rows were produced — the property that
    * lets [[bm25FromPostings]] equal [[bm25TopK]] exactly. */
  private def bm25Rank(withTf: DataFrame, nTerms: Int, k: Int,
      k1: Double, b: Double): DataFrame = {
    val statAggs = count(lit(1)).cast("double").as("n") +:
      avg(col("dl")).as("avgdl") +:
      (0 until nTerms).map(i =>
        sum(when(col(s"tf$i") > 0, 1.0).otherwise(0.0)).as(s"df$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val score = (0 until nTerms).map { i =>
      val idf = log((col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5) + 1.0)
      val tf = col(s"tf$i")
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 6).as("score"))
      .where(col("score") > 0.0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Flat per-doc-term postings (doc_id, term, tf) — the append-only
    * unit [[graft.streaming.RetrievalStream.incrementalPostings]] folds:
    * pure per-doc, and everything BM25 needs derives from it (dl =
    * sum tf per doc since every token lands in exactly one term group;
    * N = distinct docs; df = postings per term). */
  def termPostings(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /**
   * BM25 top-k served from a MATERIALIZED postings table
   * ([[termPostings]] rows, e.g. the accumulated state of the streaming
   * fold) instead of scanning raw text: per-term tf comes from an
   * equi-join probe of the query's handful of term literals, dl/N/avgdl
   * from a doc-keyed roll-up. Output is bit-identical to [[bm25TopK]]
   * over the same corpus — every aggregate is an integer count in
   * double, so accumulation order cannot perturb it.
   */
  def bm25FromPostings(postings: DataFrame, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25FromPostings: need a query term")
    val dls = postings.groupBy("doc_id")
      .agg(sum(col("tf")).cast("double").as("dl"))
    val joined = queryTerms.zipWithIndex.foldLeft(dls) {
      case (acc, (t, i)) =>
        acc.join(postings.where(col("term") === t)
            .select(col("doc_id"), col("tf").cast("double").as(s"__t$i")),
          Seq("doc_id"), "left")
    }
    val withTf = joined.select(
      (col("doc_id") +: col("dl") +: queryTerms.indices.map(i =>
        coalesce(col(s"__t$i"), lit(0.0)).as(s"tf$i"))): _*)
    bm25Rank(withTf, queryTerms.size, k, k1, b)
  }

  /**
   * Overlapping token-window document chunking — the training-prep / RAG
   * staple: chunk i covers tokens [i*stride, i*stride + window), so
   * consecutive chunks share `window - stride` tokens. Chunks tile the
   * whole document (the last one may be short); a doc with <= window
   * tokens yields exactly one chunk.
   *
   * Output: (doc_id, chunk_id, start_tok, n_toks, chunk_text).
   *
   * Scale: a pure narrow explode — each row expands to ~n/stride chunk
   * rows with no shuffle at all; chunk count arithmetic is integer-only
   * (truncating division on a non-negative numerator, so the DuckDB
   * replay's floor-division agrees).
   */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"chunkByTokens: need 0 < stride <= window, got ($window, $stride)")
    val tk = toks(col(textCol))
    val n = size(tk)
    // 1 + ceil(max(0, n - window) / stride); the numerator is non-negative
    // so floor-of-exact-double == both engines' integer division.
    val nChunks = floor(
      (greatest(lit(0), n - window) + lit(stride - 1)) / lit(stride))
      .cast("int") + lit(1)
    docs.select(col(idCol).as("doc_id"), tk.as("tk"),
        posexplode(sequence(lit(0), nChunks - 1)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        (col("col") * stride).cast("long").as("start_tok"),
        least(lit(window), size(col("tk")) - col("col") * stride)
          .cast("long").as("n_toks"),
        concat_ws(" ", slice(col("tk"), col("col") * stride + 1, lit(window)))
          .as("chunk_text"))
  }

  /**
   * N-gram language-model counts — the classic LM training-prep table:
   * one row per (n-1 word prefix, next word) with its occurrence count
   * (every occurrence counts, unlike the dedup shingles). `minCount`
   * prunes the singleton tail, the standard LM vocabulary trim.
   *
   * Scale: one narrow explode (~tokens per row), one count aggregate with
   * map-side partials keyed by (prefix, next) — the same shape at any
   * corpus size; minCount keeps the output table from being dominated by
   * hapax n-grams.
   */
  def ngramNextCounts(docs: DataFrame, textCol: String, n: Int,
      minCount: Long = 2L): DataFrame = {
    require(n >= 2, "ngramNextCounts: n >= 2 (need a prefix and a next)")
    // Grams come from the WordGramsAll codegen expression (one narrow
    // call per row — the interpreted struct-building transform lambda it
    // replaced dominated this operator's runtime); the prefix/next split
    // is two codegen'd substring_index calls per gram.
    val grams = org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
      graft.functions.WordGramsAll(
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(
          col(textCol)), n))
    docs.select(explode(grams).as("g"))
      .groupBy(substring_index(col("g"), " ", n - 1).as("prefix"),
        substring_index(col("g"), " ", -1).as("next"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }

  /**
   * Per-document repetition signals, the Gopher-class quality filters
   * that catch degenerate/templated text whole-document dedup misses:
   *
   *   - `dup_frac`        = 1 - distinct_tokens / tokens (token mass in
   *                         repeats; near 1 for "spam spam spam ...")
   *   - `top_frac`        = most frequent token's share of all tokens
   *   - `top_bigram_frac` = most frequent word bigram's share of all
   *                         bigrams (0.0 for docs under 2 tokens)
   *
   * Shape: two word-count aggregations (explode -> count per gram ->
   * per-doc roll-up) joined on doc_id — the canonical map-side-partial
   * word-count plan, linear at any corpus size; bigrams come from the
   * WordGramsAll codegen expression (duplicates kept). All ratios are a
   * single two-exact-integer division (plus one subtraction), so both
   * engines produce bit-identical doubles.
   */
  def repetitionSignals(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val uni = docs
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("__topc"))
    val bigrams = org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
      graft.functions.WordGramsAll(
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(
          col(textCol)), 2))
    val bi = docs
      .select(col(idCol).as("doc_id"), explode(bigrams).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("__nb"), max(col("c")).as("__topb"))
    uni.join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (lit(1.0) - col("n_distinct").cast("double") /
          col("n_tokens").cast("double")).as("dup_frac"),
        (col("__topc").cast("double") /
          col("n_tokens").cast("double")).as("top_frac"),
        coalesce(col("__topb").cast("double") / col("__nb").cast("double"),
          lit(0.0)).as("top_bigram_frac"))
  }

  /**
   * Inverted index build — the IR structure behind ranked retrieval at
   * scale (BM25 here scans; a deployed engine probes this index):
   * one row per term with document frequency, corpus frequency, and the
   * posting list as an array of (doc_id, tf) structs sorted by doc_id
   * (the order merge-joins and skip-lists need).
   *
   * Shape: explode -> (term, doc) count -> per-term list aggregation —
   * two keyed shuffles with map-side partials. The posting-list
   * collect_list is the one unbounded aggregation: `minDf`/stop-term
   * capping (same dial as the n-gram dedup cap) bounds it in practice,
   * and at extreme scale posting lists shard by (term, doc_id range).
   */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 1L): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(toks(col(textCol))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        array_sort(collect_list(struct(col("doc_id"), col("tf"))))
          .as("postings"))
      .where(col("df") >= minDf)

  /**
   * Top-k characteristic terms per document by smoothed TF-IDF
   * (idf = ln((N+1)/(df+1)) + 1, the sklearn-style smooth variant that
   * never goes negative). Ties break alphabetically, so the result is a
   * total order both engines replay; scores round to 6 decimals (ln last
   * ulp may differ across libms).
   *
   * Shape: term-count shuffle + a per-doc rank window + a 1-row (N)
   * broadcast — no corpus-sized movement beyond the word count itself.
   */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(toks(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val weight = col("tf") *
      (log((col("__n") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(weight.desc, col("term").asc)
    tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), round(weight, 6).as("score"))
  }

  // ---- PII / URL scrubbing -------------------------------------------------

  /** Redaction patterns, deliberately kept inside the regex subset that
    * Java regex and RE2 (DuckDB, Go, many scanners) interpret identically:
    * character classes, counted repetition, alternation — no backrefs, no
    * lookaround. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val UrlRe = "https?://[^ ]+"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Occurrences of a redaction pattern (narrow per-row count). */
  def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** Compliance scrub: replaces URLs, then emails, then phone numbers with
    * typed placeholder tokens (URL first — emails/digits inside a URL
    * belong to it). A narrow per-row map; at corpus scale this is a free
    * rider on whatever scan already touches the text. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Unicode canonicalization for multilingual corpora: NFC, accent strip
    * (NFD + drop combining marks), lowercase — the pre-tokenization
    * normalize every multilingual pipeline runs first. Narrow codegen
    * expression (graft.functions.NormalizeText); ligatures/full-width
    * compatibility chars survive by design (NFC, not NFKC). */
  def normalizeText(text: Column): Column =
    org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
      graft.functions.NormalizeText(
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(text)))

  /** Polynomial rolling hash of the whole text: fold (acc*31 + codepoint)
    * mod 2147483647 — a native codegen expression
    * (graft.functions.RollingHash); the interpreted HOF form below is its
    * test oracle. Overflow-free (acc < 2^31). */
  def rollingHash(text: Column): Column =
    org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
      graft.functions.RollingHash(
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(text)))

  /** Interpreted HOF form of `rollingHash` — test oracle only. */
  def rollingHashHof(text: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(text)), i => ascii(text.substr(i, lit(1)))),
      lit(0L), (acc, c) => (acc * 31 + c.cast("long")) % 2147483647L)

  /** Bottom-k sketch fingerprint over distinct char n-grams: the k smallest
    * hash60 values per document (winnowing-style content signature).
    * Output: (doc_id, rnk 1..k, h).
    *
    * Computed by the BottomKHashes codegen expression in ONE narrow map —
    * the earlier explode-all-grams + per-document window shuffled ~2000
    * rows per document just to keep 4 (2.9s -> narrow at sf0.1). */
  def bottomKFingerprint(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, k: Int = 4): DataFrame = {
    val bk = org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
      graft.functions.BottomKHashes(
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(col(textCol)),
        n, k))
    docs.select(col(idCol).as("doc_id"), posexplode(bk))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("col").as("h"))
  }

  /** The explode + window form of `bottomKFingerprint` — test oracle only
    * (TextAnalysisSpec asserts equality with the narrow expression). */
  def bottomKFingerprintHof(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, k: Int = 4): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"),
      explode(charGrams(col(textCol), n)).as("g"))
      .withColumn("h", hash60(col("g")))
    val w = Window.partitionBy("doc_id").orderBy(col("h"), col("g"))
    grams.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("doc_id", "rnk", "h")
  }

  /**
   * Per-document perplexity-class LM score under an in-engine-trained
   * add-one-smoothed word n-gram model — the model-based quality signal
   * ("how surprising is this doc under the corpus LM") that heuristic
   * ratio filters can't give. For each n-gram in a document:
   *
   *   logp = ln((count(prefix, next) + 1) / (count(prefix) + V))
   *
   * with V = distinct next-word vocabulary size, and the per-doc score is
   * the mean negative log-prob (lower = more typical of the corpus).
   *
   * Determinism contract: each gram's logp is ONE ln() on a ratio of
   * exact integers, floor-quantized to 1e-6 fixed point; per-doc totals
   * are exact BIGINT sums (order-independent), and the final mean is one
   * division rounded to 6 — the same fixed-point discipline as
   * QualityModel.trainLogReg, so the DuckDB oracle replays it exactly.
   *
   * Scale shape: the LM count tables are vocabulary-sized (aggregates of
   * one narrow gram explode, map-side partial); scoring is two keyed
   * equi-joins of the gram stream against those tables plus one per-doc
   * re-aggregation — every stage linear in corpus size, nothing quadratic,
   * no driver loops. Output: (doc_id, n_grams, nll_scaled, avg_nll).
   */
  def lmPerplexity(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 2, "lmPerplexity: n >= 2 (need a prefix and a next)")
    val gramsCol = org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
      graft.functions.WordGramsAll(
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(
          col(textCol)), n))
    val grams = docs.select(col(idCol).as("doc_id"), explode(gramsCol).as("g"))
      .select(col("doc_id"),
        substring_index(col("g"), " ", n - 1).as("prefix"),
        substring_index(col("g"), " ", -1).as("next"))
    // Persisted: prefixCnt and vocab both derive from pairCnt, and without
    // materialization Catalyst re-expands the lineage into three more
    // full corpus scans + gram explodes. pairCnt is VOCABULARY-sized
    // (distinct n-grams), so caching it is metadata-class storage while
    // the corpus is scanned exactly twice (once for counts, once for the
    // scoring stream) — the minimum for a train-then-score pass.
    val pairCnt = grams.groupBy("prefix", "next").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prefixCnt = pairCnt.groupBy("prefix").agg(sum(col("cnt")).as("pcnt"))
    val vocab = pairCnt.agg(count_distinct(col("next")).as("v"))
    val logp = log((col("cnt") + lit(1L)).cast("double") /
      (col("pcnt") + col("v")).cast("double"))
    grams.join(pairCnt, Seq("prefix", "next"))
      .join(prefixCnt, Seq("prefix"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        floor(logp * lit(1000000.0)).cast("long").as("lp_scaled"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        (-sum(col("lp_scaled"))).as("nll_scaled"))
      .withColumn("avg_nll", round(col("nll_scaled").cast("double") /
        (col("n_grams") * lit(1000000L)).cast("double"), 6))
  }

  /**
   * CCNet-style perplexity bucketing: within each language, rank
   * documents by LM perplexity ([[lmPerplexity]]) and cut the ranking
   * into `buckets` equal tiles — head (most fluent), middle, tail. Real
   * pipelines train on head+middle and drop or down-weight the tail;
   * the per-(lang, bucket) roll-up here is the decision table for that
   * cut.
   *
   * Determinism contract: the tile assignment orders by `avg_nll`
   * (computed identically in both engines — exact integer sums, one
   * final division) with `doc_id` as total-order tiebreak, and NTILE's
   * SQL-standard distribution rule fixes every boundary. Sums are exact
   * BIGINTs.
   *
   * Scale shape: on top of lmPerplexity's cost this adds one per-language
   * window (languages partition the corpus — parallel across, sequential
   * within only at the sort, which is the shuffle's sort anyway) and one
   * keyed roll-up. At 100 TB you'd swap the exact per-language NTILE for
   * per-language KLL quantile cuts ([[Sketches]]) — same decision table,
   * sketch-sized state; the exact form is the oracle-replayable contract.
   */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, n: Int = 3, buckets: Int = 3): DataFrame = {
    require(buckets >= 2, "perplexityBuckets: buckets >= 2")
    val w = Window.partitionBy("lang")
      .orderBy(col("avg_nll"), col("doc_id"))
    lmPerplexity(docs, idCol, textCol, n)
      .join(docs.select(col(idCol).as("doc_id"), col(langCol).as("lang")),
        "doc_id")
      .withColumn("bucket", ntile(buckets).over(w).cast("long"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nll_scaled")).as("nll_scaled_sum"),
        sum(col("n_grams")).as("n_grams_sum"))
  }

  /**
   * Pointwise mutual information over nearby word pairs (forward windows
   * of gap 1 and 2) — the word2vec-era phrase/collocation signal: high
   * PMI pairs ("new york") are phrases a tokenizer should keep together;
   * PMI against frequency separates collocation from coincidence.
   *
   *   pmi = ln( (c_ab / P) / ((c_a / T) * (c_b / T)) )
   *       = ln( (c_ab * T * T) / (P * c_a * c_b) )
   *
   * computed as ONE ln() on a ratio of two exact Long products (both
   * engines cast the same integers, so IEEE rounding agrees even when
   * the products exceed 2^53), floor-quantized to 1e-6 — the
   * lmPerplexity discipline. Pairs below `minCount` are cut (standard:
   * PMI of rare pairs is noise).
   *
   * Scale shape: the pair stream is a narrow HOF projection (two shifted
   * zips — no self-join on positions); one (a, b) keyed count with
   * map-side partials over it, one vocabulary-sized unigram count, two
   * vocabulary-keyed joins to attach c_a/c_b, and two 1-row totals
   * broadcast into the scoring projection. The minCount cut happens
   * BEFORE the joins, so only surviving pairs shuffle twice.
   */
  def wordPmi(docs: DataFrame, textCol: String, minCount: Long = 5L)
      : DataFrame = {
    require(minCount >= 1, "wordPmi: minCount >= 1")
    val base = docs.select(toks(col(textCol)).as("t"))
    def gapPairs(g: Int) = base.where(size(col("t")) > g)
      .select(explode(expr(
        s"transform(sequence(0, size(t) - ${g + 1}), " +
          s"i -> struct(t[i] as a, t[i + $g] as b))")).as("p"))
      .select(col("p.a"), col("p.b"))
    val pairs = gapPairs(1).unionAll(gapPairs(2))
    val pc = pairs.groupBy("a", "b").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
    val words = docs.select(explode(toks(col(textCol))).as("w"))
    val uni = words.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = words.agg(count(lit(1)).as("t"))
    val ptot = pairs.agg(count(lit(1)).as("p"))
    pc
      .join(uni.select(col("w").as("a"), col("c").as("ca")), "a")
      .join(uni.select(col("w").as("b"), col("c").as("cb")), "b")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(ptot))
      .select(col("a"), col("b"), col("cnt"),
        // Each factor cast to double BEFORE multiplying (left-assoc, same
        // order in the oracle SQL): a Long product cnt*t*t would overflow
        // past ~2e9 total tokens (ANSI throw / silent wrap), while the
        // double product is exact IEEE in both engines at any corpus size.
        floor(log((col("cnt").cast("double") * col("t").cast("double") *
            col("t").cast("double")) /
          (col("p").cast("double") * col("ca").cast("double") *
            col("cb").cast("double"))) *
          lit(1000000.0)).cast("long").as("pmi_scaled"))
  }

  /**
   * Tokenizer-vocabulary coverage: build the top-`vocabSize` word
   * vocabulary by corpus frequency (ties break toward the
   * lexicographically smaller word), then report each document's
   * out-of-vocabulary token mass — the standard pre-tokenizer health
   * check before committing a vocab to a training run.
   *
   * Scale shape: the word-count aggregate is the canonical map-side
   * partial word count; the top-V cut is a window over the VOCABULARY
   * (not the corpus) — bounded data, single partition is fine at any
   * corpus size; scoring joins the per-doc word counts against the
   * broadcast vocab. Output: (doc_id, n_tokens, n_oov, oov_rate).
   */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabCoverage: vocabSize must be > 0")
    val words = docs.select(col(idCol).as("doc_id"),
      explode(toks(col(textCol))).as("w"))
    val docCnt = words.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val vocab = docCnt.groupBy("w").agg(sum(col("c")).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("cnt").desc, col("w"))))
      .where(col("rn") <= vocabSize)
      .select(col("w"), lit(true).as("in_vocab"))
    docCnt.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("c")).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", round(
        col("n_oov").cast("double") / col("n_tokens").cast("double"), 6))
  }
}
