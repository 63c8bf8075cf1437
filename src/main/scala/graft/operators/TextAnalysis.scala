package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Text-analysis operators for training-data curation: language ID, quality
 * scoring, token counting, and document fingerprinting. Everything is
 * built-in-function composition (codegen'd, no UDFs), narrow per-row maps
 * — zero shuffles, scales linearly with corpus size.
 */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword-overlap
    * language heuristic. Deterministic, vocabulary-based — the point is the
    * operator shape (profile scoring + argmax), not linguistic accuracy. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  private def profileHits(words: Column, profile: Seq[String]): Column =
    size(array_intersect(words, array(profile.map(lit): _*)))

  /** (predicted_lang, lang_score) as composable COLUMNS over a text
    * column — the building block that lets curation pipelines stack
    * language ID with other per-row features in ONE projection/scan
    * instead of joining derived frames of the same corpus (a full-corpus
    * self-join shuffle at scale). */
  def languageIdCols(textCol: Column): (Column, Column) = {
    val words = array_distinct(split(textCol, " "))
    val scored = langProfiles.zipWithIndex.map { case ((lang, profile), i) =>
      struct(profileHits(words, profile).as("hits"), lit(i).as("ord"),
        lit(lang).as("lang"))
    }
    // argmax: sort by (hits desc, ord asc) — element_at after array_sort
    // with a custom comparator keeps it all in one codegen'd expression
    val best = array_sort(array(scored: _*),
      (l, r) => when(l.getField("hits") > r.getField("hits"), -1)
        .when(l.getField("hits") < r.getField("hits"), 1)
        .when(l.getField("ord") < r.getField("ord"), -1)
        .otherwise(1))
    (when(element_at(best, 1).getField("hits") > 0,
      element_at(best, 1).getField("lang")).otherwise(lit("und")),
      element_at(best, 1).getField("hits"))
  }

  /**
   * Language ID: score = |distinct words ∩ profile| per language; predict
   * the argmax (ties broken by profile order; no hits → "und"). One
   * projection.
   */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (lang, score) = languageIdCols(col(textCol))
    docs.select(col(idCol), lang.as("predicted_lang"),
      score.as("lang_score"))
  }

  /** Quality metric columns over a text column (same one-projection
    * composability contract as `languageIdCols`). */
  def qualityCols(textCol: Column,
                  stopwords: Seq[String] = Seq("the", "and", "of", "a", "to", "in")): Seq[(String, Column)] = {
    val words = split(textCol, " ")
    val nWords = size(words)
    val nChars = length(textCol)
    val nStop = size(filter(words, w => w.isInCollection(stopwords)))
    val nAlpha = length(regexp_replace(textCol, "[^a-zA-Z]", ""))
    Seq(
      "n_chars" -> nChars,
      "n_words" -> nWords,
      "mean_word_len" -> (nChars.cast(DoubleType) / nWords),
      "stopword_ratio" -> (nStop.cast(DoubleType) / nWords),
      "alpha_ratio" -> (nAlpha.cast(DoubleType) / nChars))
  }

  /** Quality metrics: char/word counts, mean word length, stopword ratio,
    * alpha ratio. All exact integer ratios (single double division each)
    * → bit-reproducible. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String] = Seq("the", "and", "of", "a", "to", "in")): DataFrame =
    docs.select(col(idCol) +:
      qualityCols(col(textCol), stopwords).map { case (n, c) => c.as(n) }: _*)

  /**
   * Per-stratum quantile normalization of a quality signal: each row's
   * score becomes its percent-rank WITHIN its stratum (source, language,
   * crawl snapshot…) — the calibration step before a single global
   * quality cut, since raw scores aren't comparable across sources (one
   * crawl's 0.8 is another's 0.5). percent_rank = (rank−1)/(n−1),
   * emitted in exact ppm units (half-away integer rounding of
   * 10⁶·(rank−1)/(n−1) — [[ExactRound]], engine-portable); single-row
   * strata normalize to 0.
   *
   * Scale shape: ONE window partitioned by the stratum column — state
   * per task is a partition of one stratum, never the corpus; there is
   * no global sort and no single-partition funnel. Score ties get equal
   * percent-ranks (rank semantics), so the result is deterministic
   * without a tiebreak column.
   */
  def quantileNormalize(df: org.apache.spark.sql.DataFrame,
                        strataCol: String, scoreCol: String,
                        outCol: String = "q_norm_ppm"): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col(scoreCol))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
    df.withColumn(outCol,
      when(count(lit(1)).over(wAll) > 1,
        ExactRound.halfAwayDiv(
          (rank().over(w) - lit(1)).cast("long") * lit(1000000L),
          count(lit(1)).over(wAll).cast("long") - lit(1L)))
        .otherwise(lit(0L)))
  }

  /**
   * Per-document unigram (word) Shannon entropy in nats plus the
   * type-token ratio inputs — the information-density quality signal:
   * near-zero entropy flags boilerplate/repeated-token documents that
   * length and punctuation ratios miss, and it is the cheap proxy for
   * the compression-ratio filter (H ≈ bits/token an ideal coder needs).
   *
   * entropy = Σ_w (c_w/n)·ln(n/c_w), each term rounded to 6 dp and
   * accumulated as DECIMAL(18,6) so the sum is order-independent and
   * engine-portable (the BM25/tfidf determinism pattern).
   *
   * Shape: one explode + one (doc, word) hash-agg (map-side combinable)
   * + one doc-partitioned window for n + one doc hash-agg. No global
   * state, no corpus-wide shuffle beyond the (doc, word) keys.
   */
  def wordEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("graft_w"))
      .groupBy(col(idCol), col("graft_w"))
      .agg(count(lit(1)).as("graft_c"))
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    counts
      .withColumn("graft_n", sum(col("graft_c")).over(wDoc))
      .withColumn("graft_term",
        round((col("graft_c").cast(DoubleType) / col("graft_n")) *
          log(col("graft_n").cast(DoubleType) / col("graft_c")), 6)
          .cast(DecimalType(18, 6)))
      .groupBy(col(idCol))
      .agg(max(col("graft_n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("graft_term")).as("entropy_nats"))
  }

  /**
   * Learn a character-n-gram subword vocabulary from the corpus: the
   * `k` most frequent character n-grams of lengths 2..4 across all
   * words, weighted by word occurrence count, ties broken by n-gram
   * text — a deterministic, data-driven stand-in for a learned BPE
   * merges table (Sennrich et al. 2016: BPE's merge list is exactly a
   * frequency-learned subword vocabulary; learning by direct n-gram
   * frequency instead of iterative pair merging keeps both engines'
   * replays trivially identical). Returns the vocabulary DRIVER-SIDE —
   * it is metadata-scale by construction (≤ k strings of ≤ 4 chars),
   * the same bounded-collect contract as the isotonic bins and Bloom
   * bitmap — so [[greedyTokenCountCol]] can inline it as literals into
   * one codegen'd projection (the stopword-list pattern, not a join).
   *
   * Scale shape: one word-frequency agg, one n-gram explode keyed agg,
   * one top-k — all map-side combinable; nothing corpus-sized leaves
   * the executors.
   */
  def learnCharNgramVocab(docs: DataFrame, textCol: String,
                          k: Int = 20): Seq[String] = {
    require(k >= 1, s"vocab size must be >= 1: $k")
    val words = docs
      .select(explode(split(col(textCol), " ")).as("graft_w"))
      .filter(length(col("graft_w")) >= 1)
      .groupBy(col("graft_w")).agg(count(lit(1)).as("graft_wc"))
    val grams = (2 to 4).map { l =>
      words.filter(length(col("graft_w")) >= l)
        .select(explode(transform(
          sequence(lit(1), length(col("graft_w")) - (l - 1)),
          i => col("graft_w").substr(i, lit(l)))).as("ng"),
          col("graft_wc"))
    }.reduce(_ unionByName _)
    grams.groupBy(col("ng")).agg(sum(col("graft_wc")).as("graft_cnt"))
      .orderBy(col("graft_cnt").desc, col("ng"))
      .limit(k)
      .select("ng").collect().map(_.getString(0)).toSeq
  }

  /**
   * Greedy longest-match subword token count of a word column against a
   * fixed vocabulary (the WordPiece/BPE-apply decode loop, Sennrich et
   * al. 2016): starting at position 1, repeatedly take the LONGEST
   * vocabulary entry matching at the cursor (single character as the
   * universal fallback) and advance past it; the count of takes is the
   * subword token count. This is the number an actual LLM data pipeline
   * budgets in — whitespace counts under-count CJK and over-count
   * morphology-rich languages.
   *
   * Implementation: a runtime `aggregate` HOF folding over
   * `sequence(1, length(w))` steps (state = cursor + count; steps after
   * the cursor passes the end are no-ops), with the per-position
   * longest-match resolved by a literal-array membership chain from
   * longest vocab length down — all inside whole-stage codegen, no UDF,
   * no join. Vocabulary entries must be 2..4 chars (1-char entries are
   * the implicit fallback); empty words count 0 tokens (and the
   * `length >= 1` guard also dodges the descending-`sequence` trap).
   */
  def greedyTokenCountCol(word: Column, vocab: Seq[String]): Column = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    require(vocab.forall(v => v.length >= 2 && v.length <= 4),
      s"vocab entries must be 2..4 chars: ${vocab.filterNot(v => v.length >= 2 && v.length <= 4)}")
    val byLen = (4 to 2 by -1)
      .map(l => l -> vocab.filter(_.length == l)).filter(_._2.nonEmpty)
    def step(pos: Column): Column =
      byLen.foldLeft(when(lit(false), lit(1))) { case (acc, (l, vs)) =>
        acc.when(
          array_contains(array(vs.map(lit): _*), word.substr(pos, lit(l))),
          lit(l))
      }.otherwise(lit(1))
    when(length(word) >= 1,
      aggregate(sequence(lit(1), length(word)),
        struct(lit(1).as("pos"), lit(0).as("cnt")),
        (st, _) => when(st.getField("pos") > length(word), st)
          .otherwise(struct(
            (st.getField("pos") + step(st.getField("pos"))).as("pos"),
            (st.getField("cnt") + 1).as("cnt"))),
        st => st.getField("cnt")))
      .otherwise(lit(0))
  }

  /** Token counts: whitespace tokens and a BPE-ish regex tokenization
    * (letter runs | digit runs | single non-alnum-non-space). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(split(col(textCol), " ")).as("n_ws_tokens"),
      size(regexp_extract_all(col(textCol),
        lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).as("n_re_tokens"),
      length(col(textCol)).as("n_chars"))

  /**
   * Canonical text normalization — lowercase, strip non-alphanumerics to
   * spaces, collapse runs, trim — the preprocessing applied before exact
   * dedup so that case/punctuation variants hash identically (raw-text
   * md5 dedup misses "Hello, World!" vs "hello world"). A narrow
   * codegen'd projection; the regex constructs used ([^a-z0-9 ], ` +`)
   * behave identically under Java regex and RE2, keeping it
   * oracle-portable.
   */
  def normalized(textCol: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(textCol), "[^a-z0-9 ]", " "), " +", " "))

  /** Adds `norm_md5`/`n_chars_norm` for the normalized form of
    * `textCol` — the join key for normalization-aware exact dedup. */
  def withNormalized(docs: DataFrame, textCol: String): DataFrame = {
    val n = normalized(col(textCol))
    docs.withColumn("norm_md5", md5(n))
      .withColumn("n_chars_norm", length(n))
  }

  /**
   * PII-style pattern redaction: applies each (pattern → replacement)
   * rule in order over the text, and counts total matches against the
   * ORIGINAL text (rules whose matches overlap an earlier rule's
   * replacement are counted per-rule, not post-substitution). A narrow
   * codegen'd projection — patterns restricted to constructs with
   * identical semantics under Java regex and RE2 keep it oracle-portable.
   */
  def redact(docs: DataFrame, idCol: String, textCol: String,
             rules: Seq[(String, String)]): DataFrame = {
    val redacted = rules.foldLeft(col(textCol)) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    }
    val nMatches = rules.map(r => regexp_count(col(textCol), lit(r._1)))
      .reduce(_ + _)
    docs.select(col(idCol), redacted.as("redacted_text"),
      nMatches.as("n_redacted"))
  }

  /**
   * Gopher-style repetition/diversity signals per document: word count,
   * distinct-word ratio, the dominant word and its mass fraction, and the
   * fraction of duplicated 2-grams — the "is this page degenerate
   * boilerplate" filters of Rae et al., "Scaling Language Models" (Gopher,
   * arXiv:2112.11446), Appendix A1.1.
   *
   * Entirely narrow HOF projections over one bound word array — zero
   * shuffles, unlike the explode+groupBy formulation whose (doc, word)
   * exchange carries the whole corpus. The in-row distinct-count loop is
   * O(|words|²) per document, the right trade below ~10⁴ words; truncate
   * pathological documents (or fall back to `Relevance.termFrequencies`)
   * beyond that.
   */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = col("graft_w"); val dw = col("graft_dw")
    val cnts = col("graft_cnts"); val bg = col("graft_bg")
    val maxc = col("graft_maxc")
    docs.select(col(idCol), split(col(textCol), " ").as("graft_w"))
      .withColumn("graft_dw", array_sort(array_distinct(w)))
      .withColumn("graft_cnts", transform(dw, x => size(filter(w, y => y === x))))
      .withColumn("graft_maxc", array_max(cnts))
      .withColumn("graft_bg", when(size(w) >= 2,
          transform(sequence(lit(0), size(w) - 2),
            i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2))))
        .otherwise(array().cast(ArrayType(StringType))))
      .select(col(idCol),
        size(w).as("n_words"),
        round(size(dw).cast(DoubleType) / size(w), 6).as("distinct_ratio"),
        array_min(filter(dw, (x, i) => element_at(cnts, i + 1) === maxc))
          .as("top_word"),
        round(maxc.cast(DoubleType) / size(w), 6).as("top_word_frac"),
        when(size(bg) === 0, lit(0.0)).otherwise(
          round(lit(1.0) - size(array_distinct(bg)).cast(DoubleType) / size(bg), 6))
          .as("dup_bigram_frac"))
  }

  /** Document fingerprints: full-content md5 plus a winnowing-style
    * min-hash over w-word shingle windows (robust to local edits). */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String,
                  w: Int = 4): DataFrame = {
    // materialize the word array before the lambda: an inlined split() gets
    // no subexpression elimination inside transform (see TextDedup.shingles)
    val ws = col("graft_ws")
    val shingleHashes =
      when(size(ws) >= w,
        transform(sequence(lit(0), size(ws) - w),
          i => md5(concat_ws(" ", (0 until w).map(o => element_at(ws, i + o + 1)): _*))))
        .otherwise(array(md5(col(textCol))))
    docs.select(col(idCol), col(textCol),
        split(col(textCol), " ").as("graft_ws"))
      .select(
        col(idCol),
        md5(col(textCol)).as("content_md5"),
        array_min(shingleHashes).as("min_shingle_hash"))
  }

  /**
   * Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
   * MOSS algorithm): hash every `w`-gram, then in each window of
   * `winnow` consecutive gram hashes keep the (leftmost) minimum — the
   * selection with the GUARANTEE the q27 rolling hash lacks: any shared
   * substring of length ≥ w + winnow − 1 contributes at least one
   * COMMON fingerprint, while density stays ~2/(winnow+1). The
   * plagiarism / near-dup localization primitive at corpus scale.
   *
   * One narrow projection builds positional grams (array HOFs, no
   * self-join), one doc-keyed window takes the per-window min via an
   * int64 (hash·2048 + pos) encode — 40-bit md5-derived hashes keep the
   * encode exact — and a distinct collapses repeated picks (the same
   * minimum wins consecutive windows). Everything md5-deterministic,
   * oracle-reproducible digit by digit.
   */
  def winnowedPicks(docs: DataFrame, idCol: String, textCol: String,
                    w: Int, winnow: Int): DataFrame = {
    require(w >= 1, s"w must be >= 1: $w")
    require(winnow >= 1, s"winnow must be >= 1: $winnow")
    val words = split(col(textCol), " ")
    val nGrams = size(words) - (w - 1)
    // Spark's sequence(0, n−1) runs BACKWARDS when n−1 < 0 — guard the
    // too-short-doc case to an empty gram list (posexplode drops it)
    val grams = when(nGrams >= 1,
      transform(sequence(lit(0), nGrams - 1),
        i => array_join(slice(words, i + 1, lit(w)), " ")))
      .otherwise(array().cast("array<string>"))
    val positioned = docs
      .select(col(idCol), posexplode(grams).as(Seq("graft_pos", "graft_g")))
    val h40 = conv(substring(md5(col("graft_g")), 1, 10), 16, 10)
      .cast(LongType)
    val wWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("graft_pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        winnow - 1)
    val wCount = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
    // encode = hash·2^20 + pos: 40-bit hash + 20-bit position stays
    // int64-exact up to 2^20 grams per doc; beyond that the position
    // would bleed into the hash field and silently corrupt fp_hash, so
    // the bound is ENFORCED (un-prunable, rides the encode)
    val posChecked = when(col("graft_pos") < 1048576L, col("graft_pos"))
      .otherwise(raise_error(concat(
        lit("winnowedPicks supports at most 2^20 grams per doc, got pos "),
        col("graft_pos").cast(StringType))).cast(LongType))
    positioned
      .withColumn("graft_enc", h40 * lit(1048576L) + posChecked)
      .withColumn("graft_min", min(col("graft_enc")).over(wWin))
      .withColumn("graft_n", count(lit(1)).over(wCount))
      // only full windows select (starts 0 .. nGrams−winnow)
      .filter(col("graft_pos") <= col("graft_n") - winnow)
      .select(col(idCol), col("graft_min").as("fp_enc"),
        call_function("div", col("graft_min"), lit(1048576L)).as("fp_hash"))
      .distinct()
  }

  /**
   * KWIC concordance (keyword-in-context): every occurrence of `term`
   * with its ±`window`-word context — the search/linguistics primitive
   * behind "show me how this token is actually used", and the manual-
   * review surface for PII/redaction spot checks. One narrow projection:
   * positions come from filtering an index sequence (no self-join, no
   * explode of non-matches), the context is a bounded array slice.
   * Positions are 1-based int64; strings are carried verbatim.
   */
  def concordance(docs: DataFrame, idCol: String, textCol: String,
                  term: String, window: Int): DataFrame = {
    require(window >= 0, s"window must be >= 0: $window")
    val t = docs.select(col(idCol), split(col(textCol), " ").as("graft_ws"))
    t.select(col(idCol), col("graft_ws"),
        explode(filter(sequence(lit(1), size(col("graft_ws"))),
          i => element_at(col("graft_ws"), i) === term)).as("graft_p"))
      .select(col(idCol), col("graft_p").cast(LongType).as("pos"),
        array_join(slice(col("graft_ws"),
          greatest(col("graft_p") - window, lit(1)),
          least(col("graft_p") + window, size(col("graft_ws"))) -
            greatest(col("graft_p") - window, lit(1)) + 1), " ")
          .as("context"))
  }

  /** Per-doc fingerprint summary over [[winnowedPicks]] — the gate
    * surface: pick count, an int64 checksum over the 40-bit HASHES
    * (position-free, and safe from overflow where a sum of full
    * 60-bit encodes would not be), and the minimum encode. Dedup
    * pipelines join [[winnowedPicks]] on `fp_hash` directly. */
  def winnowedFingerprints(docs: DataFrame, idCol: String, textCol: String,
                           w: Int, winnow: Int): DataFrame =
    winnowedPicks(docs, idCol, textCol, w, winnow)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_fingerprints"),
        sum(col("fp_hash")).cast(LongType).as("fp_sum"),
        min(col("fp_enc")).as("fp_min"))

  /**
   * Multi-rule quality audit — the Gopher-style rule battery (Rae et al.
   * 2021 §A1.1: word-count bounds, mean-word-length bounds, stopword
   * presence) plus the repetition rules its successors added (C4 /
   * RefinedWeb: type-token ratio, most-frequent-word share). Unlike the
   * single composite score of [[qualityScore]], each rule is reported as
   * its own boolean so a curation pipeline can tune or ablate rules
   * individually, plus `n_failed` and the conjunctive `keep`.
   *
   * Rules (all bounds inclusive):
   *   - `r_word_count`:   minWords <= n_words <= maxWords
   *   - `r_mean_word_len`: minMeanLen <= mean word length <= maxMeanLen
   *     (mean over word string lengths — NOT chars/words, which counts
   *     separators)
   *   - `r_stopwords`:    >= minStop DISTINCT stopwords present
   *   - `r_ttr`:          type-token ratio (distinct/total words) >= minTtr
   *   - `r_top_share`:    most-frequent word's share of tokens <= maxTopShare
   *
   * Scale shape: everything except `r_top_share` is one narrow codegen'd
   * projection. The top-word share needs a per-(doc, word) count; that is
   * an explode + hash-agg keyed by (doc, word) then doc — map-side
   * combinable, state bounded by per-doc vocabulary, never corpus-global.
   * (A higher-order-function variant would be shuffle-free but O(types ×
   * tokens) per doc — quadratic in a 100k-token doc — so the doc-keyed
   * shuffle is the scale-safe choice.) Ratios are single IEEE-double
   * divisions of exact int counts → engine-portable comparisons.
   */
  def gopherRuleAudit(docs: DataFrame, idCol: String, textCol: String,
                      stopwords: Seq[String] = Seq("the", "and", "of", "a", "to", "in"),
                      minWords: Int = 30, maxWords: Int = 5000,
                      minMeanLen: Double = 3.5, maxMeanLen: Double = 10.0,
                      minStop: Int = 2, minTtr: Double = 0.5,
                      maxTopShare: Double = 0.1): DataFrame = {
    val topCnt = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("graft_w"))
      .groupBy(col(idCol), col("graft_w"))
      .agg(count(lit(1)).as("graft_c"))
      .groupBy(col(idCol))
      .agg(max(col("graft_c")).as("graft_top_cnt"))
    val words = split(col(textCol), " ")
    val nWords = size(words).cast(LongType)
    val meanLen = aggregate(words, lit(0L),
      (acc, w) => acc + length(w).cast(LongType)).cast(DoubleType) / nWords
    val nStop = size(array_intersect(array_distinct(words),
      array(stopwords.map(lit(_)): _*))).cast(LongType)
    val ttr = size(array_distinct(words)).cast(DoubleType) / nWords
    val base = docs.select(col(idCol),
      nWords.as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      nStop.as("n_stopwords"),
      round(ttr, 6).as("ttr"))
    val rules = Seq(
      "r_word_count" -> (col("n_words") >= minWords &&
        col("n_words") <= maxWords),
      "r_mean_word_len" -> (col("mean_word_len") >= minMeanLen &&
        col("mean_word_len") <= maxMeanLen),
      "r_stopwords" -> (col("n_stopwords") >= minStop),
      "r_ttr" -> (col("ttr") >= minTtr),
      "r_top_share" -> (col("top_share") <= maxTopShare))
    val nFailed = rules.map { case (n, _) =>
      when(col(n), 0).otherwise(1)
    }.reduce(_ + _)
    base.join(topCnt, Seq(idCol))
      .withColumn("top_share",
        round(col("graft_top_cnt").cast(DoubleType) / col("n_words"), 6))
      .select((col(idCol) +: Seq("n_words", "mean_word_len", "n_stopwords",
        "ttr", "top_share").map(col)) ++
        rules.map { case (n, c) => c.as(n) }: _*)
      .withColumn("n_failed", nFailed.cast(LongType))
      .withColumn("keep", col("n_failed") === 0)
  }

  /**
   * Linear quality-classifier APPLY — the fastText shape (Joulin et al.
   * 2016, "Bag of Tricks for Efficient Text Classification"): a
   * bag-of-words logit z = b + Σ_t w(t)·tf(t) and label = z > 0, the
   * learned complement to the rule battery above (the standard
   * pretraining quality filter pairs a trained linear model with
   * hand rules — GPT-3's LR filter, CCNet's fastText LID). Training
   * happens offline; applying the model at corpus scale is the Spark
   * problem, and this is that apply.
   *
   * Weights are INTEGER MILLI-UNITS (`term → w·1000`), so the logit is
   * an exact BIGINT — deterministic, order-independent, engine-portable
   * (the q200 lesson: never hash a libm digit; σ(z) stays a
   * convenience column OFF any cross-engine gate). `prob` =
   * round(σ(logit_milli/1000), 6) rides along for human thresholds,
   * and `label`/`logit_milli` feed [[graft.operators.Sampling]]'s
   * weighted selection exactly like any other per-doc score.
   *
   * Scale shape: one tokenize+explode projection, a BROADCAST join
   * against the |vocab|-row weight table (model vocabularies are
   * 10⁴-10⁶ rows — executor-memory scale by design), and ONE doc-keyed
   * hash-agg (map-side combinable). The corpus shuffles once, by doc
   * id; unmatched terms drop at the join (w = 0 contributes nothing),
   * so the aggregated volume is hit terms only.
   */
  /**
   * [[linearQualityScore]] as COMPOSABLE COLUMNS over a text column —
   * (n_terms, n_hits, logit_milli, label): the weight table rides as a
   * LITERAL map and the logit is one codegen'd fold over the split
   * words, so the scoring is a pure narrow projection — no join, no
   * aggregation, no shuffle, no state. That makes it directly usable on
   * a STREAM (stateless append mode) and lets batch curation stack it
   * with other per-row features in one scan. Use the DataFrame operator
   * when the vocabulary outgrows a literal plan (10⁵+ terms): the
   * broadcast-join form handles any vocab size.
   */
  def linearQualityScoreCols(textCol: Column,
                             milliWeights: Map[String, Long],
                             biasMilli: Long)
      : (Column, Column, Column, Column) = {
    require(milliWeights.nonEmpty, "empty weight table")
    val m = map(milliWeights.toSeq.flatMap {
      case (t, wv) => Seq(lit(t), lit(wv))
    }: _*)
    val words = split(textCol, " ")
    val nTerms = size(words).cast(LongType)
    val nHits = aggregate(words, lit(0L),
      (acc, wd) => acc + when(element_at(m, wd).isNotNull, 1L).otherwise(0L))
    val logit = aggregate(words, lit(biasMilli),
      (acc, wd) => acc + coalesce(element_at(m, wd), lit(0L)))
    (nTerms, nHits, logit, logit > 0L)
  }

  def linearQualityScore(docs: DataFrame, idCol: String, textCol: String,
                         milliWeights: Map[String, Long],
                         biasMilli: Long): DataFrame = {
    require(milliWeights.nonEmpty, "empty weight table")
    val spark = docs.sparkSession
    import spark.implicits._
    val weights = milliWeights.toSeq.toDF("graft_term", "graft_w")
    val terms = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("graft_term"))
    val hits = terms
      .join(broadcast(weights), Seq("graft_term"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        sum(col("graft_w")).as("graft_zsum"))
    docs.select(col(idCol),
        size(split(col(textCol), " ")).cast(LongType).as("n_terms"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_terms"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("graft_zsum"), lit(0L)) + biasMilli)
          .as("logit_milli"))
      .withColumn("label", col("logit_milli") > 0L)
      .withColumn("prob",
        round(lit(1.0) / (lit(1.0) +
          exp(-col("logit_milli").cast(DoubleType) / lit(1000.0))), 6))
  }

  /**
   * Canary / secret-string audit (Carlini et al. 2019, "The Secret
   * Sharer"): scan the corpus for a fixed list of exact marker strings
   * — injected canaries whose post-training extractability measures
   * memorization, or known secrets/benchmark strings that must NOT be
   * in the training set. Reports, per canary, how many documents
   * contain it, the total occurrence count, and the first containing
   * doc id (NULL when absent — absence rows are part of the contract:
   * "canary not found" is the result the audit usually wants).
   *
   * Occurrences are counted exactly via the length-difference identity
   * (len(text) − len(replace(text, c, ''))) / len(c) — integer
   * arithmetic, no regex (canaries are literals; a regex would need
   * escaping and costs more).
   *
   * Scale shape: ONE corpus pass — the canary list is metadata
   * (broadcast nested-loop with a codegen'd `contains` filter, |C|
   * substring tests per row map-side); only (canary, id, count) rows
   * for actual HITS reach the |C|-key aggregation. Nothing
   * corpus-sized shuffles.
   */
  def canaryScan(docs: DataFrame, idCol: String, textCol: String,
                 canaries: Seq[String]): DataFrame = {
    require(canaries.nonEmpty, "canaryScan: empty canary list")
    require(canaries.forall(_.nonEmpty), "canaryScan: empty-string canary")
    val spark = docs.sparkSession
    import spark.implicits._
    val cs = canaries.toDF("canary")
    val hits = docs.crossJoin(broadcast(cs))
      .filter(col(textCol).contains(col("canary")))
      .select(col("canary"), col(idCol),
        call_function("div",
          (length(col(textCol)) -
            length(call_function("replace", col(textCol), col("canary"),
              lit("")))).cast(LongType),
          length(col("canary")).cast(LongType)).as("graft_occ"))
      .groupBy(col("canary"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("graft_occ")).as("n_occurrences"),
        min(col(idCol)).as("first_doc_id"))
    cs.join(hits, Seq("canary"), "left")
      .select(col("canary"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_occurrences"), lit(0L)).as("n_occurrences"),
        col("first_doc_id"))
  }

  /**
   * Code-switching / mixed-language audit: per document, the per-profile
   * distinct-stopword hit counts, how many languages clear `minHits`,
   * and the `mixed` flag — the CCNet-style check that drops documents
   * whose text mixes languages (they poison both languages' corpora;
   * Wenzek et al. 2020 filter on LID confidence for exactly this
   * reason). Complements [[languageId]] (argmax only) by exposing the
   * WHOLE hit vector, so thresholds can be tuned per profile.
   *
   * One codegen'd projection (array_intersect per profile over the
   * distinct words) — zero shuffle, the [[qualityCols]] contract.
   */
  def codeSwitchAudit(docs: DataFrame, idCol: String, textCol: String,
                      minHits: Int = 2): DataFrame = {
    require(minHits >= 1, s"minHits=$minHits out of range")
    val words = array_distinct(split(col(textCol), " "))
    val hitCols = langProfiles.map { case (lang, profile) =>
      lang -> profileHits(words, profile).cast(LongType)
    }
    val nLangs = hitCols.map { case (_, c) =>
      when(c >= minHits, 1L).otherwise(0L)
    }.reduce(_ + _)
    docs.select(
      (col(idCol) +: hitCols.map { case (l, c) => c.as(s"${l}_hits") }) ++
        Seq(nLangs.as("n_langs"), (nLangs >= 2L).as("mixed")): _*)
  }

  /**
   * WITHIN-document repetition profile — the Gopher repetition battery
   * (Rae et al. 2021, Table A1) the cross-document audits (q198's
   * verbatim-run coverage, q208's corpus boilerplate) don't cover: a
   * document that repeats ITSELF (scraper loops, chart-data dumps,
   * keyword stuffing) is low-quality even when nothing else in the
   * corpus shares its text. Per document:
   *
   *   - `n_words`, `n_paras` — exact sizes (paragraphs = `pWords`-word
   *     slices, the q218 convention for newline-free corpora);
   *   - `dup_para_ppm` — ⌊10⁶ · (occurrences of repeated paragraphs) /
   *     n_paras⌋ (Gopher's duplicate-line fraction);
   *   - `dup_para_char_ppm` — same, weighted by paragraph characters
   *     over total slice characters (duplicate-line-CHARACTER fraction);
   *   - `top2_share_ppm` / `top3_share_ppm` — ⌊10⁶ · n·(top n-gram
   *     count) / n_words⌋ (most-frequent-n-gram share);
   *   - `dup5_cover_ppm` — ⌊10⁶ · (words covered by ≥ 1 occurrence of a
   *     REPEATED 5-gram) / n_words⌋, coverage = interval UNION over the
   *     repeated grams' [pos, pos+4] spans (the q198 sweep, here
   *     per-doc), so overlapping repeats never double-count.
   *
   * Every output is an exact integer (ppm via DECIMAL integral
   * division) — fully gate-hashable, nothing libm.
   *
   * Scale shape: all aggs are keyed by (doc, gram/para) then doc —
   * map-side combinable, state bounded by per-doc content, nothing
   * corpus-global. The coverage windows partition by doc and run over
   * repeated-gram POSITIONS only (a doc's repeated grams, not the
   * corpus). One doc never funnels through one task beyond its own
   * rows, exactly like the rest of the per-doc battery.
   */
  def repetitionProfile(docs: DataFrame, idCol: String, textCol: String,
                        pWords: Int = 12, dupGramN: Int = 5): DataFrame = {
    require(pWords >= 2, s"pWords=$pWords out of range")
    require(dupGramN >= 2, s"dupGramN=$dupGramN out of range")
    val ws = split(col(textCol), " ")
    val base = docs.select(col(idCol), ws.as("graft_ws"))
      .select(col(idCol), col("graft_ws"),
        size(col("graft_ws")).cast(LongType).as("n_words"))
      .localCheckpoint()

    // duplicate-paragraph stats: slice into pWords-word paragraphs,
    // count per (doc, text); repeated slices contribute all their
    // occurrences and characters
    val paras = base.select(col(idCol), col("n_words"),
        explode(transform(
          sequence(lit(0), ceil(size(col("graft_ws")).cast(DoubleType) /
            pWords).cast(IntegerType) - 1),
          i => concat_ws(" ", slice(col("graft_ws"), i * pWords + 1, lit(pWords)))))
          .as("graft_pt"))
    val paraStats = paras
      .groupBy(col(idCol), col("graft_pt"))
      .agg(count(lit(1)).as("graft_c"),
        (count(lit(1)) * length(col("graft_pt")).cast(LongType))
          .as("graft_chars"))
      .groupBy(col(idCol))
      .agg(sum(col("graft_c")).as("n_paras"),
        sum(when(col("graft_c") >= 2, col("graft_c")).otherwise(0L))
          .as("graft_dup_p"),
        sum(col("graft_chars")).as("graft_all_ch"),
        sum(when(col("graft_c") >= 2, col("graft_chars")).otherwise(0L))
          .as("graft_dup_ch"))

    // most-frequent n-gram share for n = 2, 3
    def topShare(n: Int): DataFrame =
      base.select(col(idCol),
          explode(when(size(col("graft_ws")) >= n,
            transform(sequence(lit(1), size(col("graft_ws")) - (n - 1)),
              i => concat_ws(" ", slice(col("graft_ws"), i, lit(n)))))
            .otherwise(array().cast("array<string>"))).as("graft_g"))
        .groupBy(col(idCol), col("graft_g"))
        .agg(count(lit(1)).as("graft_c"))
        .groupBy(col(idCol))
        .agg((max(col("graft_c")) * n).cast(LongType).as(s"graft_top$n"))

    // repeated dupGramN-gram word coverage: positional grams, keep
    // positions of grams occurring >= 2 times in the doc, sweep the
    // interval union [pos, pos + n - 1]
    val posGrams = base.select(col(idCol),
        explode(when(size(col("graft_ws")) >= dupGramN,
          transform(sequence(lit(1), size(col("graft_ws")) - (dupGramN - 1)),
            i => struct(i.cast(LongType).as("p"),
              concat_ws(" ", slice(col("graft_ws"), i, lit(dupGramN))).as("g"))))
          .otherwise(array().cast("array<struct<p:bigint,g:string>>")))
          .as("graft_pg"))
      .select(col(idCol), col("graft_pg.p").as("graft_p"),
        col("graft_pg.g").as("graft_g"))
    val wGram = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol), col("graft_g"))
    val repeated = posGrams
      .withColumn("graft_c", count(lit(1)).over(wGram))
      .filter(col("graft_c") >= 2)
      .select(col(idCol), col("graft_p").as("graft_s"),
        (col("graft_p") + (dupGramN - 1)).as("graft_e"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("graft_s"), col("graft_e"))
    val pme = coalesce(max(col("graft_e")).over(
      wOrd.rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)), lit(0L))
    val cover = repeated
      .withColumn("graft_add", greatest(lit(0L),
        col("graft_e") - greatest(col("graft_s"), pme + 1L) + 1L))
      .groupBy(col(idCol))
      .agg(sum(col("graft_add")).as("graft_cov"))

    base.select(col(idCol), col("n_words"))
      .join(paraStats, Seq(idCol))
      .join(topShare(2), Seq(idCol), "left")
      .join(topShare(3), Seq(idCol), "left")
      .join(cover, Seq(idCol), "left")
      .select(col(idCol), col("n_words"), col("n_paras"),
        expr("cast(coalesce(graft_dup_p, 0) * 1000000 as decimal(38,0)) " +
          "div cast(n_paras as decimal(38,0))").cast(LongType)
          .as("dup_para_ppm"),
        when(col("graft_all_ch") > 0,
          expr("cast(coalesce(graft_dup_ch, 0) * 1000000 as decimal(38,0)) " +
            "div cast(graft_all_ch as decimal(38,0))").cast(LongType))
          .otherwise(0L).as("dup_para_char_ppm"),
        expr("cast(coalesce(graft_top2, 0) * 1000000 as decimal(38,0)) " +
          "div cast(n_words as decimal(38,0))").cast(LongType)
          .as("top2_share_ppm"),
        expr("cast(coalesce(graft_top3, 0) * 1000000 as decimal(38,0)) " +
          "div cast(n_words as decimal(38,0))").cast(LongType)
          .as("top3_share_ppm"),
        expr("cast(coalesce(graft_cov, 0) * 1000000 as decimal(38,0)) " +
          "div cast(n_words as decimal(38,0))").cast(LongType)
          .as("dup5_cover_ppm"))
  }

  /**
   * Tokenizer-coverage / OOV audit per stratum (source, language, …):
   * fix the vocabulary to the corpus's `vocabSize` most frequent words
   * (count desc, word asc — deterministic), then report per stratum the
   * exact token count, out-of-vocabulary token count, distinct OOV type
   * count, and `oov_ppm` = ⌊10⁶·n_oov/n_tokens⌋. The fertility-style
   * audit run before committing to a tokenizer: a stratum whose OOV
   * rate is an outlier will fragment into subwords (or <unk>) and train
   * badly (Rust et al. ACL 2021 measure exactly this per-language).
   *
   * Scale shape: vocabulary selection is ONE word-count hash-agg
   * (map-side combinable) + a TakeOrderedAndProject top-V cut —
   * metadata-scale output broadcast back against the exploded tokens as
   * a left-semi-style flag join; the per-stratum rollup is a
   * |strata|-key agg. Exact integers end to end.
   */
  def oovAudit(docs: DataFrame, idCol: String, textCol: String,
               strataCol: String, vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize=$vocabSize out of range")
    val words = docs.select(col(strataCol),
      explode(split(col(textCol), " ")).as("graft_w"))
    val vocab = words.groupBy(col("graft_w"))
      .agg(count(lit(1)).as("graft_c"))
      .orderBy(col("graft_c").desc, col("graft_w").asc)
      .limit(vocabSize)
      .select(col("graft_w"), lit(1).as("graft_in"))
    words.join(broadcast(vocab), Seq("graft_w"), "left")
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("graft_in").isNull, 1L).otherwise(0L)).as("n_oov"),
        countDistinct(when(col("graft_in").isNull, col("graft_w")))
          .as("n_oov_types"))
      .select(col(strataCol), col("n_tokens"), col("n_oov"),
        col("n_oov_types"),
        expr("cast(n_oov * 1000000 as decimal(38,0)) div " +
          "cast(n_tokens as decimal(38,0))").cast(LongType).as("oov_ppm"))
  }
  /**
   * Good–Turing missing-mass audit per stratum (Good 1953; Gale &
   * Sampson 1995): the probability that the NEXT token drawn from the
   * stratum is a word never seen in it, estimated by the hapax share
   * n₁/N — the coverage planning number for "how much more vocabulary is
   * out there" before committing a tokenizer or a sampling budget.
   * Reports exact token/type counts, hapax (n₁) and dis-legomena (n₂)
   * counts, and `missing_mass_ppm = ⌊10⁶·n₁/N⌋` — all integer
   * arithmetic (DECIMAL(38,0) integral division, positive operands).
   *
   * Scale shape: ONE (stratum, word) count agg (map-side combinable,
   * cardinality = per-stratum vocabulary), then a |strata|-key reduce
   * over the count-of-counts — the corpus shuffles once, on word keys.
   */
  def missingMassAudit(docs: DataFrame, textCol: String,
                       strataCol: String): DataFrame = {
    val wc = docs
      .select(col(strataCol), explode(split(col(textCol), " ")).as("graft_w"))
      .groupBy(col(strataCol), col("graft_w"))
      .agg(count(lit(1)).as("graft_c"))
    wc.groupBy(col(strataCol))
      .agg(sum(col("graft_c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("graft_c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("graft_c") === 2, 1L).otherwise(0L)).as("n_dis"))
      .withColumn("missing_mass_ppm",
        expr("cast(n_hapax * 1000000 as decimal(38,0)) div " +
          "cast(n_tokens as decimal(38,0))").cast(LongType))
  }

  /**
   * Chao1 species-richness estimate per stratum (Chao 1984, the
   * bias-corrected form): V̂ = V + f₁(f₁−1)/(2(f₂+1)) — a LOWER BOUND
   * on the stratum's true vocabulary size from the observed type count
   * V and the singleton/doubleton counts f₁, f₂. The budgeting twin of
   * [[missingMassAudit]]: Good–Turing says how much probability mass is
   * unseen, Chao1 says how many TYPES are still unseen — the number a
   * tokenizer-vocab or coverage plan actually needs. The +1 in the
   * denominator (Chao's bias correction) also makes f₂ = 0 well-defined
   * — no special case.
   *
   * Hashed surface: exact counts (V, N, f₁, f₂) plus
   * `chao1_micro = half-away(10⁶·(2V(f₂+1) + f₁(f₁−1)) / (2(f₂+1)))` —
   * the estimate as one exact rational, no floating point.
   *
   * Scale shape: identical to [[missingMassAudit]] — ONE (stratum, word)
   * count agg, one |strata|-key reduce over count-of-counts. The corpus
   * shuffles once, on word keys, map-side combined.
   */
  def chao1Richness(docs: DataFrame, textCol: String,
                    strataCol: String): DataFrame = {
    val big = DecimalType(38, 0)
    val wc = docs
      .select(col(strataCol), explode(split(col(textCol), " ")).as("graft_w"))
      .groupBy(col(strataCol), col("graft_w"))
      .agg(count(lit(1)).as("graft_c"))
    wc.groupBy(col(strataCol))
      .agg(sum(col("graft_c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("graft_c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("graft_c") === 2, 1L).otherwise(0L)).as("f2"))
      .withColumn("chao1_micro", ExactRound.halfAwayDiv(
        ((lit(2L).cast(big) * col("n_types").cast(big) *
          (col("f2").cast(big) + lit(1L)) +
          col("f1").cast(big) * (col("f1").cast(big) - lit(1L))) *
          lit(1000000L).cast(big)).cast(big),
        (lit(2L).cast(big) * (col("f2").cast(big) + lit(1L))).cast(big)))
  }

  /**
   * Heaps-law vocabulary growth curve (Heaps 1978): cumulative distinct
   * vocabulary after each equal-count document tranche, in document-id
   * order — the empirical V(n) curve whose flattening says when more of
   * the same source stops buying new vocabulary. Each word is attributed
   * to the tranche of its FIRST containing document, so the cumulative
   * sum over tranches IS the exact prefix vocabulary.
   *
   * Scale shape: a word-keyed min-doc agg (map-side combinable) gives
   * first occurrences; tranche boundaries come from
   * [[GlobalRank.ntileExact]] over doc ids (ONE range shuffle of the id
   * column, never the text); the cumulative window runs on `buckets`
   * rows. Nothing document-scale is sorted globally.
   */
  /**
   * Lexicon/topic tagging — the FlashText/UT1-blocklist pattern every
   * web-curation pipeline runs (C4's bad-words filter, RefinedWeb's URL
   * topic tags, taxonomy labeling for mixture reporting): count, per
   * document, how many token n-grams hit each tag's phrase list. Phrases
   * are 1 or 2 words; multi-tag phrases count once per carrying tag.
   *
   * Scale shape: the lexicon is a BROADCAST side (thousands of phrases —
   * metadata); the corpus contributes ONE projection exploding unigrams
   * plus adjacent bigrams (the [[Relevance.skipgramPairs]] zip_with
   * shape, no position self-join), a broadcast hash join, and a
   * (doc, tag) map-side-combinable count. Nothing corpus-sized shuffles
   * except the matched hits keyed by doc.
   */
  def lexiconTag(docs: DataFrame, idCol: String, textCol: String,
                 lexicon: Seq[(String, String)]): DataFrame = {
    require(lexicon.nonEmpty, "lexicon must be non-empty")
    require(lexicon.forall { case (_, p) =>
      val n = p.split(" ").length; n >= 1 && n <= 2 },
      "lexicon phrases must be 1 or 2 words")
    val spark = docs.sparkSession
    import spark.implicits._
    val lex = broadcast(lexicon.toDF("tag", "graft_gram"))
    val ws = col("graft_ws")
    val grams = docs
      .select(col(idCol), split(col(textCol), " ").as("graft_ws"))
      .select(col(idCol), explode(concat(ws,
        when(size(ws) >= 2,
          zip_with(slice(ws, lit(1), size(ws) - 1),
            slice(ws, lit(2), size(ws) - 1),
            (a, b) => concat_ws(" ", a, b)))
          .otherwise(array().cast("array<string>")))).as("graft_gram"))
    grams.join(lex, "graft_gram")
      .groupBy(col(idCol), col("tag"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /**
   * word2phrase collocation merging (Mikolov et al. 2013 §4): rewrite
   * the corpus joining adjacent word pairs whose phrase score
   * `(c(x,y) − δ)·N / (c(x)·c(y))` clears `tauNum/tauDen` — the
   * vocabulary-induction pass that turns "new york" into one token
   * before counting/training. Word2vec's reference implementation
   * merges greedily left-to-right (inherently sequential); here a
   * bigram slot merges iff it's a LOCAL MAXIMUM among its overlapping
   * neighbors (strictly beats the left slot, ties beat the right), a
   * parallel-safe rule that provably never overlaps (adjacent slots
   * can't both win) and is position-local, so the whole decision is one
   * columnar expression. Scores never materialize as floats: every
   * threshold/neighbor comparison is an exact integer cross-
   * multiplication of (num, den) pairs (valid while num·den < 10³⁸ —
   * c_max·N·c(x)·c(y) bounded, which holds for natural corpora where
   * den ≤ 10²⁰ and num ≤ 10¹⁸; a one-word corpus would overflow first).
   *
   * Scale shape: the bigram/unigram model tables are word-keyed hash
   * aggs (map-side combinable); slots join them on word keys and fold
   * back per doc via ONE sorted-struct collect (the [[Chunking.chunks]]
   * pattern); N rides a 1-row broadcast. The rewrite itself is a
   * per-row HOF projection — no second corpus pass.
   */
  def collocationMerge(docs: DataFrame, idCol: String, textCol: String,
                       delta: Long = 5L, tauNum: Long = 6L,
                       tauDen: Long = 5L): DataFrame = {
    require(delta >= 0 && tauNum > 0 && tauDen > 0,
      s"bad parameters delta=$delta tau=$tauNum/$tauDen")
    val ws = col("graft_ws")
    val base = docs.select(col(idCol), split(col(textCol), " ").as("graft_ws"))
    val slots = base.filter(size(ws) >= 2)
      .select(col(idCol), posexplode(zip_with(
        slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => struct(a.as("x"), b.as("y")))).as(Seq("graft_i", "graft_p")))
      .select(col(idCol), col("graft_i"),
        col("graft_p.x").as("x"), col("graft_p.y").as("y"))
    val cxy = slots.groupBy(col("x"), col("y")).agg(count(lit(1)).as("c_xy"))
    val uni = docs.select(explode(split(col(textCol), " ")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("graft_cu"))
    val totN = uni.agg(sum(col("graft_cu")).as("graft_n"))
    val big = "decimal(38,0)"
    val scored = slots
      .join(cxy, Seq("x", "y"))
      .join(uni.select(col("t").as("x"), col("graft_cu").as("c_x")), Seq("x"))
      .join(uni.select(col("t").as("y"), col("graft_cu").as("c_y")), Seq("y"))
      .crossJoin(broadcast(totN))
      .select(col(idCol), col("graft_i"),
        expr(s"cast(c_xy - $delta as $big) * cast(graft_n as $big)")
          .as("graft_num"),
        expr(s"cast(c_x as $big) * cast(c_y as $big)").as("graft_den"))
    val packed = scored.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("graft_i"), col("graft_num"),
        col("graft_den")))).as("graft_s"))
    base.join(packed, Seq(idCol), "left")
      // slot i merges: eligible AND a local max among overlap neighbors
      .withColumn("graft_m", expr(
        s"""CASE WHEN graft_s IS NULL THEN array_repeat(true, 0)
           |ELSE transform(sequence(0, size(graft_s) - 1), i ->
           |  graft_s[i].graft_num * $tauDen >= $tauNum * graft_s[i].graft_den
           |  AND (i = 0 OR graft_s[i].graft_num * graft_s[i-1].graft_den >
           |       graft_s[i-1].graft_num * graft_s[i].graft_den)
           |  AND (i = size(graft_s) - 1 OR
           |       graft_s[i].graft_num * graft_s[i+1].graft_den >=
           |       graft_s[i+1].graft_num * graft_s[i].graft_den)) END"""
          .stripMargin))
      // word i is absorbed by a merge at slot i-1; a merge at slot i
      // replaces word i with the joined pair
      .withColumn("graft_out", expr(
        """filter(transform(graft_ws, (w, i) ->
          |  CASE WHEN i > 0 AND i <= size(graft_m) AND graft_m[i-1]
          |         THEN NULL
          |       WHEN i < size(graft_m) AND graft_m[i]
          |         THEN concat(w, '_', graft_ws[i+1])
          |       ELSE w END), x -> x IS NOT NULL)""".stripMargin))
      .select(col(idCol),
        size(col("graft_ws")).cast(LongType).as("n_words"),
        expr("size(filter(graft_m, x -> x))").cast(LongType).as("n_merges"),
        (size(col("graft_ws")) - expr("size(filter(graft_m, x -> x))"))
          .cast(LongType).as("n_tokens_after"),
        md5(array_join(col("graft_out"), " ")).as("merged_md5"))
  }

  /**
   * Cross-group vocabulary overlap matrix: exact Jaccard similarity of
   * the word sets of every group pair (languages, sources, snapshots) —
   * the shared-vocabulary audit behind contamination hunts ("why does
   * the zh split share 40% of its types with en?") and multilingual
   * tokenizer budgeting. Works for ANY bounded group list passed
   * explicitly (metadata-scale by contract, like
   * [[graft.operators.Classify.centroidScores]]' labels).
   *
   * Scale shape: ONE word-keyed agg computes each word's per-group
   * presence flags (map-side combinable, cardinality = vocabulary);
   * a single follow-up aggregate reduces the flag table to the
   * |groups|² pair sums, and the matrix assembles from that ONE row —
   * the corpus is never touched per pair. All counts exact; jaccard in
   * floor-ppm via positive integral division.
   */
  def vocabOverlapMatrix(docs: DataFrame, textCol: String,
                         groupCol: String,
                         groups: Seq[String]): DataFrame = {
    require(groups.size >= 2 && groups.size <= 32,
      s"groups size ${groups.size} out of range [2, 32]")
    val flags = docs
      .select(col(groupCol), explode(split(col(textCol), " ")).as("graft_w"))
      .groupBy(col("graft_w"))
      .agg(groups.head match { case h =>
        max(when(col(groupCol) === h, 1L).otherwise(0L)).as(s"graft_f0")
      }, groups.tail.zipWithIndex.map { case (g, i) =>
        max(when(col(groupCol) === g, 1L).otherwise(0L))
          .as(s"graft_f${i + 1}")
      }: _*)
    val sums = flags.agg(
      sum(col("graft_f0")).as("graft_n0"),
      (groups.indices.tail.map(i =>
        sum(col(s"graft_f$i")).as(s"graft_n$i")) ++
        (for {
          i <- groups.indices; j <- groups.indices if i < j
        } yield sum(col(s"graft_f$i") * col(s"graft_f$j"))
          .as(s"graft_b${i}_$j"))): _*)
    val rows = for {
      i <- groups.indices; j <- groups.indices if i < j
    } yield sums.select(
      lit(groups(i)).as("group_a"), lit(groups(j)).as("group_b"),
      col(s"graft_n$i").as("n_a"), col(s"graft_n$j").as("n_b"),
      col(s"graft_b${i}_$j").as("n_both"),
      expr(s"cast(graft_b${i}_$j * 1000000 as decimal(38,0)) div " +
        s"cast(graft_n$i + graft_n$j - graft_b${i}_$j as decimal(38,0))")
        .cast(LongType).as("jaccard_ppm"))
    rows.reduce(_.unionByName(_))
  }

  def vocabGrowthCurve(docs: DataFrame, idCol: String, textCol: String,
                       buckets: Int = 10): DataFrame = {
    require(buckets >= 1, s"buckets=$buckets out of range")
    import org.apache.spark.sql.expressions.Window
    val tranches = GlobalRank.ntileExact(
      docs.select(col(idCol)), Seq(col(idCol).asc), buckets)
    val firstDoc = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("graft_w"))
      .groupBy(col("graft_w"))
      .agg(min(col(idCol)).as(idCol))
    val newWords = firstDoc.join(tranches, idCol)
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_words"))
    val tokens = docs
      .select(col(idCol),
        size(split(col(textCol), " ")).cast(LongType).as("graft_nw"))
      .join(tranches, idCol)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("graft_nw")).as("n_tokens"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokens.join(newWords, Seq("bucket"), "left")
      .na.fill(0L, Seq("new_words"))
      .withColumn("cum_vocab", sum(col("new_words")).over(w))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select(col("bucket").cast(LongType).as("bucket"), col("n_docs"),
        col("n_tokens"), col("new_words"), col("cum_vocab"),
        col("cum_tokens"))
  }

  /**
   * Distinct-n diversity per stratum (Li et al., NAACL 2016's distinct-1/
   * distinct-2, the standard corpus-diversity metric; Zhu et al. 2018 use
   * the same ratios inside Self-BLEU reporting): for n = 1..`maxN`, the
   * number of DISTINCT word n-grams over the TOTAL n-gram slots in each
   * stratum. Low distinct-n flags templated/mode-collapsed text a
   * within-document repetition battery ([[repetitionProfile]]) cannot
   * see — the repeats live ACROSS documents of the stratum. One wide row
   * per stratum; `distinct{n}_ppm` = ⌊10⁶·distinct/total⌋, exact-integer
   * end to end.
   *
   * Scale shape: per n, ONE zip_with-free transform/sequence projection
   * explodes n-gram slots (no position self-join), then a
   * (stratum, gram) hash-agg (map-side combinable) collapses repeats and
   * a |strata|-key rollup counts types vs slots. Nothing is corpus-
   * quadratic; the gram tables never join each other.
   */
  def distinctNgramDiversity(docs: DataFrame, textCol: String,
                             strataCol: String, maxN: Int = 3): DataFrame = {
    require(maxN >= 1 && maxN <= 5, s"maxN=$maxN out of range [1, 5]")
    val ws = col("graft_ws")
    val perN = (1 to maxN).map { n =>
      docs.select(col(strataCol), split(col(textCol), " ").as("graft_ws"))
        .select(col(strataCol),
          explode(when(size(ws) >= n,
            transform(sequence(lit(0), size(ws) - n),
              i => concat_ws(" ",
                (0 until n).map(o => element_at(ws, i + o + 1)): _*)))
            .otherwise(array().cast(ArrayType(StringType)))).as("g"))
        .groupBy(col(strataCol), col("g"))
        .agg(count(lit(1)).as("graft_c"))
        .groupBy(col(strataCol))
        .agg(count(lit(1)).as(s"distinct$n"),
          sum(col("graft_c")).as(s"total$n"))
    }
    perN.reduce((a, b) => a.join(b, strataCol))
      .select(col(strataCol) +: (1 to maxN).flatMap(n => Seq(
        col(s"distinct$n"), col(s"total$n"),
        expr(s"cast(distinct$n * 1000000 as decimal(38,0)) div " +
          s"cast(total$n as decimal(38,0))").cast(LongType)
          .as(s"distinct${n}_ppm"))): _*)
  }

  /**
   * χ² term keyness vs rest-of-corpus (the keyword-extraction statistic
   * of corpus linguistics — Kilgarriff 2001's comparison battery; Dunning
   * 1993's G² is the log-likelihood sibling, avoided here because ln is
   * not engine-portable): for each term in the focus stratum, the 2×2
   * contingency {focus, rest} × {term, ¬term} over TOKEN counts gives
   * χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)) — an exact RATIONAL in
   * the integer cell counts, so the ranking and the quantized
   * `chi2_milli` = ⌊10³·χ²⌋ are portable by construction (the libm-free
   * discipline of the q200 fix). Keyness answers "which words make this
   * source read differently from everything else" — the per-term drill-
   * down behind [[vocabOverlapMatrix]]'s aggregate distances. Only
   * over-represented terms (ad > bc) are keywords; top-`k` by (χ²,
   * term) with the signed cut made on the exact cross products.
   *
   * Scale shape: one (term, stratum-flag) hash-agg over the exploded
   * corpus (map-side combinable), a 1-row totals broadcast, then the
   * per-term rational arithmetic in a single projection and a
   * TakeOrderedAndProject top-k. No joins between data-scale tables.
   */
  def termKeyness(docs: DataFrame, textCol: String, strataCol: String,
                  focus: String, k: Int = 50): DataFrame = {
    val big = DecimalType(38, 0)
    val counts = docs
      .select(col(strataCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term"))
      .agg(sum(when(col(strataCol) === focus, 1L).otherwise(0L)).as("a"),
        sum(when(col(strataCol) =!= focus, 1L).otherwise(0L)).as("b"))
    val totals = counts.agg(sum(col("a")).as("graft_na"),
      sum(col("b")).as("graft_nb"))
    counts.crossJoin(broadcast(totals))
      // contingency: a = focus·term, b = rest·term, c = focus·¬term,
      // d = rest·¬term; N = na + nb
      .withColumn("graft_c", (col("graft_na") - col("a")).cast(big))
      .withColumn("graft_d", (col("graft_nb") - col("b")).cast(big))
      .withColumn("graft_cross",
        col("a").cast(big) * col("graft_d") -
          col("b").cast(big) * col("graft_c"))
      .filter(col("graft_cross") > 0) // over-represented in focus only
      .withColumn("chi2_milli",
        expr("cast(1000 as decimal(38,0)) * cast(graft_na + graft_nb as " +
          "decimal(38,0)) * graft_cross * graft_cross div " +
          "(cast(a + b as decimal(38,0)) * (graft_c + graft_d) * " +
          "cast(graft_na as decimal(38,0)) * " +
          "cast(graft_nb as decimal(38,0)))").cast(LongType))
      .select(col("term"), col("a").as("tf_focus"), col("b").as("tf_rest"),
        col("chi2_milli"))
      .orderBy(col("chi2_milli").desc, col("term").asc)
      .limit(k)
  }

  /**
   * Term dispersion across strata — Gries' DP ("deviation of
   * proportions", Gries 2008, the corpus-linguistics standard): for a
   * term, DP = ½ Σ_i |v_i − s_i| where v_i is the share of the term's
   * occurrences in stratum i and s_i is the stratum's share of all
   * tokens. DP ≈ 0 means the term is spread as evenly as the corpus
   * itself (function words); DP → 1 means it is concentrated in few
   * strata (topical/boilerplate vocabulary). Frequency alone cannot
   * distinguish the two — a million-count term may live in ONE crawl
   * snapshot — which is why dispersion is the standard companion
   * statistic to raw tf in corpus comparison.
   *
   * With common denominator TF·N: |v_i − s_i| = |tf_i·N − TF·sz_i| /
   * (TF·N), and the strata where the term is ABSENT contribute
   * Σ_absent sz_i/N = (N − Σ_present sz_i)/N, so the whole sum needs
   * only the PRESENT (term, stratum) rows plus the 1-row totals —
   * `dp_milli` = ⌊10³·(Σ_present|tf_i·N − TF·sz_i| + TF·(N −
   * Σ_present sz_i)) / (2·TF·N)⌋, exact integers end to end.
   * Emitted for the top-`k` terms by (corpus tf desc, term).
   *
   * Scale shape: one (stratum) size agg, one (term, stratum) hash-agg,
   * a top-k term cut (TakeOrderedAndProject) that bounds everything
   * downstream to k·|strata| rows, and a 1-row totals broadcast.
   */
  def termDispersion(docs: DataFrame, textCol: String, strataCol: String,
                     k: Int = 20): DataFrame = {
    val big = DecimalType(38, 0)
    val toks = docs.select(col(strataCol),
      explode(split(col(textCol), " ")).as("term"))
    val sizes = toks.groupBy(col(strataCol))
      .agg(count(lit(1)).as("graft_sz"))
    val total = sizes.agg(sum(col("graft_sz")).as("graft_n"))
    val perTs = toks.groupBy(col("term"), col(strataCol))
      .agg(count(lit(1)).as("graft_tf"))
    val topTerms = perTs.groupBy(col("term"))
      .agg(sum(col("graft_tf")).as("tf"))
      .orderBy(col("tf").desc, col("term").asc)
      .limit(k)
    perTs.join(broadcast(topTerms), "term")
      .join(sizes, strataCol)
      .crossJoin(broadcast(total))
      .groupBy(col("term"))
      .agg(first(col("tf")).as("tf"),
        first(col("graft_n")).as("graft_n"),
        sum(abs(col("graft_tf").cast(big) * col("graft_n").cast(big) -
          col("tf").cast(big) * col("graft_sz").cast(big)))
          .as("graft_present"),
        sum(col("graft_sz")).as("graft_cov"))
      .withColumn("dp_milli", expr(
        "(cast(1000 as decimal(38,0)) * (graft_present + " +
        "cast(tf as decimal(38,0)) * cast(graft_n - graft_cov as " +
        "decimal(38,0)))) div (cast(2 as decimal(38,0)) * " +
        "cast(tf as decimal(38,0)) * cast(graft_n as decimal(38,0)))")
        .cast(LongType))
      .select(col("term"), col("tf"), col("dp_milli"))
      .orderBy(col("tf").desc, col("term").asc)
  }

  /**
   * Term burstiness — the variance-to-mean ratio (index of dispersion /
   * Fano factor) of a term's PER-DOCUMENT counts, the classic deviation-
   * from-Poisson statistic of Church & Gale 1995 ("Poisson mixtures"):
   * VMR = 1 for a Poisson word (occurrences scattered independently),
   * VMR ≫ 1 for bursty content words that, once a document mentions
   * them, recur in it. Complements [[termDispersion]] (spread ACROSS
   * strata) with clumping WITHIN documents — together they separate
   * function words, topical words, and boilerplate IDs by shape alone.
   *
   * With exact per-doc count stats (absent docs are zeros): VMR =
   * (n·Σx² − (Σx)²)/(n·Σx), emitted as `vmr_milli` = ⌊10³·VMR⌋ via
   * DECIMAL(38,0) — Σ over present docs only, the zero docs contribute
   * nothing to either Σ, so no grid is materialized. Top-`k` terms by
   * (corpus tf desc, term).
   *
   * Scale shape: one (doc, term) hash-agg, one term-keyed rollup of
   * (Σx, Σx², docs-with), a 1-row corpus count broadcast, and a
   * TakeOrderedAndProject cut. Nothing joins at data scale.
   */
  def termBurstiness(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 30): DataFrame = {
    val big = DecimalType(38, 0)
    val n = docs.agg(count(lit(1)).as("graft_nd"))
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("graft_x"))
      .groupBy(col("term"))
      .agg(sum(col("graft_x")).as("tf"),
        sum(col("graft_x") * col("graft_x")).as("graft_sx2"),
        count(lit(1)).as("n_docs_with"))
      .crossJoin(broadcast(n))
      .withColumn("vmr_milli", expr(
        "(cast(1000 as decimal(38,0)) * " +
        "(cast(graft_nd as decimal(38,0)) * cast(graft_sx2 as " +
        "decimal(38,0)) - cast(tf as decimal(38,0)) * " +
        "cast(tf as decimal(38,0)))) div " +
        "(cast(graft_nd as decimal(38,0)) * cast(tf as decimal(38,0)))")
        .cast(LongType))
      .select(col("term"), col("tf"), col("n_docs_with"), col("vmr_milli"))
      .orderBy(col("tf").desc, col("term").asc)
      .limit(k)
  }

  /**
   * Burrows' Delta stylometric distance between strata (Burrows 2002,
   * "'Delta': a measure of stylistic difference"; Evert et al. 2017
   * confirm the z-score formulation used here): over the `m` most
   * frequent corpus words, z-score each stratum's relative frequency
   * against the across-strata distribution, then Delta(a,b) = mean_w
   * |z_a(w) − z_b(w)|. Function-word z-profiles are the classic
   * authorship/register fingerprint — on a training corpus the Delta
   * matrix shows which sources write alike (near-duplicate REGISTERS,
   * not documents), the signal source-mixing decisions want beyond
   * vocabulary overlap ([[vocabOverlapMatrix]]).
   *
   * Determinism: relative frequencies are quantized to exact integers
   * f = ⌊10⁹·tf/sz⌋ first; per word, z = (f·S − Σf)/√(S·Σf² − (Σf)²)
   * has an exact-integer numerator and an exact-integer radicand. The
   * micro-unit z is then computed WITHOUT any double in the hashed
   * path: ⌊√var⌋ is pinned exactly (a correctly-rounded double sqrt
   * seeds the value, then exact integer comparisons of (seed±k)² vs
   * var select the true integer sqrt — identical in every engine by
   * construction), and z_micro = sign·⌊10⁶·|num| / ⌊√var⌋⌋ is a pure
   * integral division. No round(double, 6) survives into the surface
   * (Spark rounds the shortest-decimal representation HALF_UP while
   * other engines scale the binary double — representation-boundary
   * values can differ; the r10 q260/q266 portability class). The
   * pairwise sum runs in int64 (order-independent), and
   * `delta_milli` = ⌊Σ_micro/(10³·m)⌋. Words with zero across-strata
   * variance contribute z = 0.
   *
   * Scale shape: one (term, stratum) hash-agg; the top-m cut bounds
   * everything after it to m·|strata| rows; the pair matrix is
   * |strata|²·m rows of metadata. Nothing data-scale joins.
   */
  def burrowsDelta(docs: DataFrame, textCol: String, strataCol: String,
                   m: Int = 20): DataFrame = {
    val big = DecimalType(38, 0)
    val toks = docs.select(col(strataCol),
      explode(split(col(textCol), " ")).as("term"))
    val sizes = toks.groupBy(col(strataCol))
      .agg(count(lit(1)).as("graft_sz"))
    val perTs = toks.groupBy(col("term"), col(strataCol))
      .agg(count(lit(1)).as("graft_tf"))
    val topTerms = perTs.groupBy(col("term"))
      .agg(sum(col("graft_tf")).as("graft_tt"))
      .orderBy(col("graft_tt").desc, col("term").asc)
      .limit(m).select(col("term"))
    // full term×stratum grid (absent cells are true zeros in the profile)
    val grid = sizes.crossJoin(broadcast(topTerms))
      .join(perTs, Seq("term", strataCol), "left")
      .na.fill(0L, Seq("graft_tf"))
      .withColumn("graft_f", expr(
        "cast(graft_tf * 1000000000 as decimal(38,0)) div " +
        "cast(graft_sz as decimal(38,0))").cast(LongType))
    val stats = grid.groupBy(col("term"))
      .agg(count(lit(1)).as("graft_s"),
        sum(col("graft_f")).as("graft_sf"),
        sum(col("graft_f").cast(big) * col("graft_f").cast(big))
          .as("graft_sf2"))
      .withColumn("graft_var", expr(
        "cast(graft_s as decimal(38,0)) * graft_sf2 - " +
        "cast(graft_sf as decimal(38,0)) * cast(graft_sf as decimal(38,0))"))
    // exact integer sqrt: the double sqrt only SEEDS the value (it is
    // correctly rounded, so every engine computes the same seed); the
    // exact (seed±k)² vs var comparisons then pin ⌊√var⌋ precisely.
    // var ≤ S·(10⁹)² keeps the seed within ±2 of the true root.
    val r0 = floor(sqrt(col("graft_var").cast(DoubleType))).cast(big)
    def isqrtCand(k: Int): Column = {
      val c = r0 + lit(k).cast(big)
      when(c >= 0 && c * c <= col("graft_var"), c).otherwise(lit(0).cast(big))
    }
    val isq = greatest(isqrtCand(-2), isqrtCand(-1), isqrtCand(0),
      isqrtCand(1), isqrtCand(2))
    val z = grid.join(broadcast(stats), "term")
      .withColumn("graft_isq", isq)
      .withColumn("graft_num",
        (col("graft_f") * col("graft_s") - col("graft_sf")).cast(big))
      .withColumn("graft_zu",
        when(col("graft_var") <= 0, lit(0L))
          .otherwise(
            when(col("graft_num") < 0, lit(-1L)).otherwise(lit(1L)) *
              expr("(cast(1000000 as decimal(38,0)) * abs(graft_num)) " +
                "div graft_isq").cast(LongType)))
      .select(col("term"), col(strataCol), col("graft_zu"))
    val a = z.select(col("term"), col(strataCol).as("src_a"),
      col("graft_zu").as("graft_za"))
    val b = z.select(col("term"), col(strataCol).as("src_b"),
      col("graft_zu").as("graft_zb"))
    a.join(b, Seq("term"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(abs(col("graft_za") - col("graft_zb"))).as("graft_sum"))
      .withColumn("delta_milli", expr(
        s"cast(graft_sum as decimal(38,0)) div " +
        s"cast(${1000L * m} as decimal(38,0))").cast(LongType))
      .select(col("src_a"), col("src_b"), col("delta_milli"))
  }

  /**
   * BPE merge-rule TRAINING (Sennrich, Haddow & Birch, ACL 2016 — the
   * byte-pair-encoding subword algorithm): starting from characters,
   * repeatedly find the globally most frequent adjacent symbol pair
   * (weighted by word frequency) and fuse it into one symbol. Returns
   * the learned merge table (rank, left, right, pair_count) — the
   * artifact a tokenizer trainer ships; deterministic tiebreak
   * (count desc, left asc, right asc) so the gate is exact.
   *
   * Scale shape: training runs on the WORD-FREQUENCY DICTIONARY, not
   * the corpus — one corpus pass builds (word, freq), every iteration
   * after that touches vocabulary-scale rows only (the standard BPE
   * trainer shape). Each round is one pair-count hash-agg plus a 1-row
   * argmax collected to the driver (the A2 scalar round-trip pattern)
   * and one literal string surgery over the dictionary; rounds are
   * lineage-cut. Merge application is left-to-right non-overlapping
   * (`replace` semantics — identical in Spark and DuckDB).
   */
  def learnBpeMerges(docs: DataFrame, textCol: String,
                     nMerges: Int): DataFrame = {
    require(nMerges >= 1 && nMerges <= 10,
      s"nMerges=$nMerges out of range (1..10)")
    val spark = docs.sparkSession
    var words = docs
      .select(explode(split(col(textCol), " ")).as("graft_w"))
      .filter(length(col("graft_w")) > 0)
      .groupBy(col("graft_w")).agg(count(lit(1)).as("graft_f"))
      .select(concat_ws(" ", split(col("graft_w"), "")).as("graft_s"),
        col("graft_f"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    for (i <- 1 to nMerges) {
      val pairCounts = words
        .select(col("graft_f"), split(col("graft_s"), " ").as("graft_a"))
        .select(col("graft_f"), explode(expr(
          "CASE WHEN size(graft_a) >= 2 THEN " +
            "transform(sequence(1, size(graft_a) - 1), " +
            "j -> struct(graft_a[j - 1] AS l, graft_a[j] AS r)) " +
            "ELSE array() END")).as("graft_p"))
        .groupBy(col("graft_p.l").as("graft_l"),
          col("graft_p.r").as("graft_r"))
        .agg(sum(col("graft_f")).as("graft_cnt"))
      val top = pairCounts
        .orderBy(col("graft_cnt").desc, col("graft_l").asc,
          col("graft_r").asc)
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((i, l, r, c))
        // merge application: pad to DOUBLE-space separators so one
        // literal left-to-right replace fuses every non-overlapping
        // occurrence ("a a a a" -> "aa aa", not "aa a a" - the space
        // sentinel would otherwise be consumed between matches), then
        // collapse back; all replaces literal, hence engine-portable.
        def rep(c: org.apache.spark.sql.Column,
                search: org.apache.spark.sql.Column,
                to: org.apache.spark.sql.Column) =
          org.apache.spark.sql.functions.replace(c, search, to)
        words = words
          .select(trim(rep(rep(
            concat(lit(" "),
              rep(col("graft_s"), lit(" "), lit("  ")), lit(" ")),
            lit(" " + l + "  " + r + " "), lit(" " + l + r + " ")),
            lit("  "), lit(" ")))
            .as("graft_s"), col("graft_f"))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
      .select(col("rank").cast(LongType).as("rank"), col("left"),
        col("right"), col("pair_count"))
  }

  /**
   * Subword fertility per stratum under the learned BPE merges — the
   * tokenizer-quality number reported per language (Rust et al. ACL'21
   * call high fertility the signature of an under-trained vocabulary):
   * fertility = subword tokens per word after applying the first
   * `nMerges` [[learnBpeMerges]] rules. Languages the merge table
   * under-serves segment into more pieces.
   *
   * Scale shape: training as [[learnBpeMerges]]; application folds the
   * ≤ nMerges merge rules (a metadata-scale driver list — the A2
   * scalar-round-trip pattern) over the per-stratum WORD DICTIONARY
   * (one corpus pass, then vocab-scale rows); the rollup is one
   * stratum-keyed agg. Hashed surface: exact integer token counts and
   * the half-away fertility micro ([[ExactRound]]).
   */
  def bpeFertility(docs: DataFrame, textCol: String, strataCol: String,
                   nMerges: Int): DataFrame = {
    val mergeRows = learnBpeMerges(docs, textCol, nMerges)
      .orderBy(col("rank")).select(col("left"), col("right"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    def rep(c: org.apache.spark.sql.Column,
            search: org.apache.spark.sql.Column,
            to: org.apache.spark.sql.Column) =
      org.apache.spark.sql.functions.replace(c, search, to)
    val lw = docs
      .select(col(strataCol), explode(split(col(textCol), " ")).as("graft_w"))
      .filter(length(col("graft_w")) > 0)
      .groupBy(col(strataCol), col("graft_w"))
      .agg(count(lit(1)).as("graft_f"))
      .withColumn("graft_s", concat_ws(" ", split(col("graft_w"), "")))
    val applied = mergeRows.foldLeft(lw) { case (d, (l, r)) =>
      d.withColumn("graft_s", trim(rep(rep(
        concat(lit(" "), rep(col("graft_s"), lit(" "), lit("  ")),
          lit(" ")),
        lit(" " + l + "  " + r + " "), lit(" " + l + r + " ")),
        lit("  "), lit(" "))))
    }
    applied
      .withColumn("graft_nsub", size(split(col("graft_s"), " ")).cast("long"))
      .groupBy(col(strataCol))
      .agg(sum(col("graft_f")).as("n_words"),
        sum(col("graft_f") * col("graft_nsub")).as("n_subwords"))
      .withColumn("fertility_micro", ExactRound.halfAwayDiv(
        col("n_subwords") * lit(1000000L), col("n_words")))
  }
}
