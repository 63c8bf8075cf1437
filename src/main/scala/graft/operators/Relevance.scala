package graft.operators

import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._

/**
 * Term-relevance scoring over the document corpus: TF-IDF feature
 * extraction and BM25 retrieval — the text-side counterpart of the
 * embedding similarity operators (Similarity/VectorAggs), and the
 * classic quality signal a curation pipeline derives from an inverted
 * index it already has to build for dedup.
 *
 * Everything is two hash aggregations (term frequency, document
 * frequency) plus a join on the co-partitioned keys — all map-side
 * combinable, nothing collected to the driver. Corpus-level scalars
 * (N, avgdl) ride along as a broadcast single-row crossJoin, so the plan
 * stays one pass over the exploded terms.
 */
object Relevance {

  /** (id, term, tf): whitespace term frequencies, duplicates counted.
    * The split array is bound to a column BEFORE explode — referencing
    * `split(...)` twice would recompute it per element (no CSE inside
    * generators). */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** (term, df): number of documents containing each term. Computed from
    * the tf relation, so the (id, term) dedup is already done and the
    * aggregation reuses the term-keyed exchange. */
  def docFrequencies(tf: DataFrame, idCol: String): DataFrame =
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /**
   * Top-`k` TF-IDF terms per document: tfidf = tf · ln((N+1)/(df+1)),
   * rounded to 6 dp before ranking so the ordering is reproducible
   * across engines; ties break on the term. The per-document cut
   * compiles to WindowGroupLimit (per-partition top-K heaps before the
   * shuffle), not a full sort.
   */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val dfc = docFrequencies(tf, idCol)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfc, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * F.log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6))
    LatestSnapshot.topK(scored, Seq(idCol), col("tfidf").desc,
        Seq(col("term").asc), k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /**
   * BM25 retrieval: the `k` best documents for a bag of query `terms`.
   *
   *   idf(t)  = ln(1 + (N − df + 0.5) / (df + 0.5))
   *   s(d)    = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
   *
   * The term filter is applied to the exploded words BEFORE any shuffle,
   * so only query-term postings ever leave the scan — at 100 TB the
   * aggregate state is |terms|·|matching docs|, not the corpus. Per-term
   * contributions are rounded to 6 dp and summed as DECIMAL(18,6): double
   * addition is order-dependent across partitionings, decimal addition is
   * exact, so the score is bit-stable under any plan.
   */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val words = docs.select(col(idCol), split(col(textCol), " ").as("w"))
    val dl = words.select(col(idCol), size(col("w")).as("dl"))
    val tf = words.select(col(idCol), explode(col("w")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl"))
    val idf = F.log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfc), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(corpus))
      .withColumn("contrib", round(idf * tfNorm, 6).cast(DecimalType(18, 6)))
      .groupBy(col(idCol))
      .agg(sum(col("contrib")).cast(DoubleType).as("bm25"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("bm25").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Unigram language-model quality score: each document's mean token
   * log-probability under the corpus's OWN unigram distribution —
   * logp(t) = ln(c_t / N) with c_t the corpus count of t and N the total
   * token count. Documents of improbable tokens (noise, boilerplate IDs,
   * wrong-language fragments) score low; this is the cheap
   * "perplexity-ish" filter a curation pipeline runs when no trained LM
   * is available (the signal behind CCNet's LM filtering, computable
   * from counts the dedup index already materializes).
   *
   * Determinism: the per-term log-prob is rounded to 6 dp and multiplied
   * into DECIMAL as `tf · round(ln(c_t/N), 6)`, then summed exactly —
   * order-independent under any partitioning, matching the DuckDB oracle
   * bit for bit (the [[bm25TopK]] contract).
   *
   * Scale shape: the tf aggregation's term-keyed exchange is reused for
   * the corpus-count aggregation; the join back to postings is on term
   * (inverted-index co-partitioning); N rides a 1-row broadcast. Nothing
   * driver-side, no vocabulary collected.
   */
  def unigramLogProb(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val ct = tf.groupBy(col("term")).agg(sum(col("tf")).as("ct"))
    val n = ct.agg(sum(col("ct")).as("n_total"))
    tf.join(ct, "term")
      .crossJoin(broadcast(n))
      .withColumn("contrib",
        round(F.log(col("ct").cast(DoubleType) / col("n_total")), 6)
          .cast(DecimalType(18, 6)) * col("tf"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        ExactRound.microOfRatio(sum(col("contrib")), sum(col("tf")))
          .as("avg_logp_micro"))
  }

  /**
   * Unigram distribution drift between two document batches, per stratum:
   * the smoothed KL divergence KL(P_A ‖ P_B) over the joint vocabulary
   * (add-one smoothing, so unseen-in-B terms contribute finitely) — the
   * monitoring signal that catches a crawl snapshot, scraper regression,
   * or source drifting away from the distribution the last model was
   * trained on. Reported in micro-nats: per-term contributions are
   * scaled ×10⁶ then 6-dp rounded into exact decimals (the BM25 rule),
   * keeping tiny probabilities above the rounding floor while staying
   * order- and engine-stable.
   *
   * Scale shape: two term-count aggregations (map-side combined), a full
   * outer join on (stratum, term) for the joint vocabulary, per-stratum
   * totals as a broadcast, and one final hash agg — everything keyed on
   * the term/stratum, nothing driver-side.
   */
  def unigramDrift(batchA: DataFrame, batchB: DataFrame, strataCol: String,
                   textCol: String): DataFrame = {
    def counts(df: DataFrame, cn: String) =
      df.select(col(strataCol), explode(split(col(textCol), " ")).as("term"))
        .groupBy(col(strataCol), col("term"))
        .agg(count(lit(1)).as(cn))
    val joint = counts(batchA, "ca")
      .join(counts(batchB, "cb"), Seq(strataCol, "term"), "full_outer")
      .na.fill(0L, Seq("ca", "cb"))
    val totals = joint.groupBy(col(strataCol))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        count(lit(1)).as("vocab"))
    val pa = (col("ca") + 1).cast(DoubleType) / (col("n_a") + col("vocab"))
    val pb = (col("cb") + 1).cast(DoubleType) / (col("n_b") + col("vocab"))
    joint.join(broadcast(totals), strataCol)
      .withColumn("contrib",
        round(lit(1e6) * pa * F.log(pa / pb), 6).cast(DecimalType(28, 6)))
      .groupBy(col(strataCol))
      .agg(min(col("n_a")).as("n_a"), min(col("n_b")).as("n_b"),
        min(col("vocab")).as("vocab"),
        round(sum(col("contrib")).cast(DoubleType), 6).as("kl_micro_nats"))
  }

  /**
   * Vocabulary coverage curve: for each cutoff V, the share of the
   * corpus's token mass covered by the top-V most frequent terms — the
   * signal that sizes a tokenizer vocabulary (BPE prep: pick V where the
   * curve flattens; everything past it becomes subword/byte fallback).
   *
   * Scale shape: term counts are one hash agg; the global frequency rank
   * is [[GlobalRank.globalRowNumber]] (range repartition + broadcast
   * offsets — NEVER a single-partition window, the vocabulary is 10⁸+
   * types at 100 TB); each cutoff's coverage is a conditional sum over
   * the ranked vocab against a broadcast cutoffs table, so the curve
   * costs one pass regardless of how many cutoffs are asked for.
   */
  def vocabCoverage(docs: DataFrame, textCol: String,
                    cutoffs: Seq[Int]): DataFrame = {
    require(cutoffs.nonEmpty, "need at least one cutoff")
    val spark = docs.sparkSession
    import spark.implicits._
    val ct = docs.select(explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("ct"))
    val ranked = GlobalRank.globalRowNumber(ct,
      Seq(col("ct").desc, col("term").asc), "rank")
    val total = ct.agg(sum(col("ct")).as("n_total"),
      count(lit(1)).as("n_types"))
    val cuts = cutoffs.toDF("cutoff")
    ranked.crossJoin(broadcast(cuts))
      .groupBy(col("cutoff"))
      .agg(sum(when(col("rank") <= col("cutoff"), col("ct"))
        .otherwise(lit(0L))).as("covered_tokens"))
      .crossJoin(broadcast(total))
      .select(col("cutoff"), col("covered_tokens"), col("n_types"),
        col("n_total"),
        (col("covered_tokens").cast(DoubleType) / col("n_total"))
          .as("coverage"))
  }

  /**
   * Top-k adjacent-bigram merge candidates with PMI — the counting
   * primitive of a BPE/WordPiece merge step: the most frequent adjacent
   * pair is what the tokenizer merges next, and PMI
   * (ln p(x,y)/(p(x)p(y))) separates "frequent because collocated" from
   * "frequent because both words are common". Pairs are counted across
   * ALL occurrences (no per-doc dedup — merge decisions are token-mass
   * decisions).
   *
   * Scale shape: one explode over adjacent pairs (zip_with of the two
   * shifted slices — the word array is bound once), two hash aggs
   * (pair counts, unigram counts), two joins keyed on the terms, totals
   * as a 1-row broadcast, and a TakeOrderedAndProject for the cut. PMI
   * arithmetic is written in one fixed association so the double result
   * is bit-identical in the oracle.
   */
  /**
   * Reciprocal-rank fusion — the standard hybrid-retrieval combiner:
   * each input ranking contributes `1/(kRrf + rank)` per document, summed
   * across lists (Cormack et al.'s RRF; the default way to fuse a
   * lexical BM25 list with a dense-embedding list without score
   * calibration). Contributions are 6-dp decimals so the fused score is
   * order-independent and engine-portable; documents missing from a list
   * simply contribute nothing.
   *
   * Each input is an already-cut top-k list — metadata scale — so the
   * union + hash-agg here is negligible next to the retrieval passes
   * that produced them.
   */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              kRrf: Int = 60, topN: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: no rankings")
    require(kRrf >= 1, s"kRrf=$kRrf must be positive")
    val contribs = rankings.map(_.select(col(idCol),
      round(lit(1.0) / (lit(kRrf) + col(rankCol)), 6)
        .cast(DecimalType(18, 6)).as("graft_c")))
    contribs.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("graft_c")).as("graft_s"), count(lit(1)).as("n_lists"))
      .select(col(idCol),
        round(col("graft_s").cast(DoubleType), 6).as("rrf"),
        col("n_lists"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(topN)
  }

  /**
   * Bigram language-model quality score: per document, the mean add-one-
   * smoothed corpus-bigram log-probability
   * `mean over positions of ln((c(x,y)+1)/(c(x)+V))` — the next-word-
   * predictability signal that separates natural prose from shuffled or
   * templated token soup better than unigram frequency
   * ([[unigramLogProb]]) can. Per-term values are 6-dp decimals summed
   * exactly.
   *
   * Shape: adjacent pairs come from ONE zip_with per doc (no positional
   * join), then two corpus-wide hash-aggs (bigram counts, unigram
   * counts), a vocab-size 1-row broadcast, and the per-doc rollup. Every
   * join is keyed on the terms.
   */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = col("graft_ws")
    val pairs = docs.select(col(idCol), split(col(textCol), " ").as("graft_ws"))
      .select(col(idCol), explode(when(size(ws) >= 2,
        zip_with(slice(ws, lit(1), size(ws) - 1),
          slice(ws, lit(2), size(ws) - 1),
          (a, b) => struct(a.as("x"), b.as("y"))))
        .otherwise(array().cast("array<struct<x:string,y:string>>")))
        .as("p"))
      .select(col(idCol), col("p.x").as("x"), col("p.y").as("y"))
    val cxy = pairs.groupBy(col("x"), col("y")).agg(count(lit(1)).as("c_xy"))
    val cx = docs.select(explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c_x"))
    val vocab = cx.agg(count(lit(1)).as("graft_v"))
    pairs
      .join(cxy, Seq("x", "y"))
      .join(cx.select(col("term").as("x"), col("c_x")), Seq("x"))
      .crossJoin(broadcast(vocab))
      .withColumn("graft_term",
        round(F.log((col("c_xy") + lit(1)).cast(DoubleType) /
          (col("c_x") + col("graft_v")).cast(DoubleType)), 6)
          .cast(DecimalType(18, 6)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        ExactRound.microOfRatio(sum(col("graft_term")), count(lit(1)))
          .as("avg_logp_micro"))
  }

  /**
   * Per-document perplexity under a Jelinek–Mercer interpolated corpus
   * bigram LM: p(y|x) = λ·c(x,y)/c(x) + (1−λ)·c(y)/N (Jelinek & Mercer
   * 1980; the smoothing Chen & Goodman 1999 benchmark as the baseline
   * interpolation). This is THE classic "perplexity filter" shape used
   * to score web text against a reference corpus (CCNet, Wenzek et al.
   * 2020 — there with a trained KenLM; here the corpus itself is the
   * model). Differs from [[bigramLogProb]] (add-one smoothing, avg logp
   * only): unigram backoff never zeroes a seen word, and the doc-level
   * output is perplexity = exp(−mean logp), the unit curation thresholds
   * are quoted in. Positions scored: bigram slots 2..n; docs with <2
   * words have no scored slots and drop out (same contract as
   * [[bigramLogProb]]).
   *
   * Determinism: `sum_logp`/`ppl` are the CONSUMER-FACING scores and are
   * NOT engine-portable — `ln`/`exp` are libm calls whose last bit is
   * not pinned by IEEE 754, so their 6-dp roundings can differ by one
   * final digit across engines (this flipped the round-9 oracle gate).
   * The PORTABLE surface — what cross-engine verification must hash —
   * is exact-integer by construction: `n_scored` and the per-doc sums
   * of the model inputs (`sum_cxy`, `sum_cx`, `sum_cy`, all exact
   * BIGINT), plus `sum_pq6` = Σ⌊10⁶·p⌋. Because λ is a finite decimal,
   * each term's p = λ·c(x,y)/c(x) + (1−λ)·c(y)/N is an exact rational
   * with denominator L·c(x)·N (L = λ's decimal scale), so ⌊10⁶·p⌋ is
   * computed with DECIMAL(38,0) integer multiply + integral division —
   * zero floating-point ops, bit-identical on any engine. `sum_pq6`
   * preserves the filter's ordering signal (mean interpolated
   * probability) at 1e-6 granularity; `sum_logp`/`ppl` remain for
   * thresholding in λ-perplexity units but must stay off any
   * cross-engine hash.
   *
   * Scale shape: bigrams from ONE zip_with (no position self-join); the
   * model tables c(x,y), c(x), c(y) are word-keyed hash-aggs (map-side
   * combinable); N and λ ride in a 1-row broadcast. The per-doc sum
   * shuffles on doc id only.
   */
  def interpolatedPerplexity(docs: DataFrame, idCol: String, textCol: String,
                             lambda: Double = 0.75): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0, s"lambda=$lambda must be in (0,1)")
    // λ as the exact rational lamNum/lamDen of its shortest decimal form
    // (0.75 → 75/100): the basis of the integer-exact sum_pq6 column
    val lamDec = java.math.BigDecimal.valueOf(lambda)
    require(lamDec.scale <= 9,
      s"lambda=$lambda needs more than 9 decimal digits — the exact " +
      "integer quantization would overflow DECIMAL(38,0) at corpus scale")
    val lamNum = lamDec.unscaledValue().longValueExact()
    val lamDen = java.math.BigDecimal.ONE.movePointRight(lamDec.scale)
      .longValueExact()
    val ws = col("graft_ws")
    val pairs = docs.select(col(idCol), split(col(textCol), " ").as("graft_ws"))
      .select(col(idCol), explode(when(size(ws) >= 2,
        zip_with(slice(ws, lit(1), size(ws) - 1),
          slice(ws, lit(2), size(ws) - 1),
          (a, b) => struct(a.as("x"), b.as("y"))))
        .otherwise(array().cast("array<struct<x:string,y:string>>")))
        .as("p"))
      .select(col(idCol), col("p.x").as("x"), col("p.y").as("y"))
    val cxy = pairs.groupBy(col("x"), col("y")).agg(count(lit(1)).as("c_xy"))
    val unigrams = docs.select(explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("graft_cu"))
    val totalN = unigrams.agg(sum(col("graft_cu")).as("graft_n"))
    val p = lit(lambda) *
      (col("c_xy").cast(DoubleType) / col("c_x").cast(DoubleType)) +
      lit(1.0 - lambda) *
        (col("c_y").cast(DoubleType) / col("graft_n").cast(DoubleType))
    // ⌊10⁶·p⌋ in exact integer arithmetic: p = (lamNum·c_xy·N +
    // (lamDen−lamNum)·c_y·c_x) / (lamDen·c_x·N); `div` (IntegralDivide)
    // on DECIMAL(38,0) truncates the exact rational — no libm, no
    // double rounding, portable across engines by construction
    val big = DecimalType(38, 0)
    pairs
      .join(cxy, Seq("x", "y"))
      .join(unigrams.select(col("term").as("x"), col("graft_cu").as("c_x")),
        Seq("x"))
      .join(unigrams.select(col("term").as("y"), col("graft_cu").as("c_y")),
        Seq("y"))
      .crossJoin(broadcast(totalN))
      .withColumn("graft_term",
        round(F.log(p), 6).cast(DecimalType(18, 6)))
      .withColumn("graft_pnum",
        lit(1000000L).cast(big) *
          (lit(lamNum).cast(big) * col("c_xy").cast(big) *
            col("graft_n").cast(big) +
           lit(lamDen - lamNum).cast(big) * col("c_y").cast(big) *
            col("c_x").cast(big)))
      .withColumn("graft_pden",
        lit(lamDen).cast(big) * col("c_x").cast(big) *
          col("graft_n").cast(big))
      .withColumn("graft_pq6", expr("graft_pnum div graft_pden"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_scored"),
        sum(col("c_xy")).as("sum_cxy"),
        sum(col("c_x")).as("sum_cx"),
        sum(col("c_y")).as("sum_cy"),
        sum(col("graft_pq6")).as("sum_pq6"),
        sum(col("graft_term")).as("sum_logp"))
      .withColumn("ppl",
        round(exp(-(col("sum_logp").cast(DoubleType) /
          col("n_scored").cast(DoubleType))), 6))
  }

  /**
   * Per-document score under an interpolated Kneser–Ney bigram LM — the
   * smoothing Chen & Goodman 1999 found uniformly best, and the one
   * production KenLM models (the CCNet filter's scorer, Wenzek et al.
   * 2020) actually use. Differs from [[interpolatedPerplexity]]
   * (Jelinek–Mercer) in both terms: the bigram part is absolute-
   * discounted, max(c(x,y)−D, 0)/c(x·), and the backoff is the
   * CONTINUATION unigram p_cont(y) = N1+(·y)/N1+(··) — how many distinct
   * contexts y follows, not how often y occurs — which is what stops
   * high-frequency-but-context-bound words ("Francisco") from absorbing
   * backoff mass. With D = 3/4 and every scored slot an observed bigram
   * (c(x,y) ≥ 1 by construction, so the max() never binds):
   *
   *   p(y|x) = (4·c(x,y) − 3)/(4·ctx(x))
   *          + 3·n1x(x)·n1y(y) / (4·ctx(x)·B)
   *          = ((4·c(x,y) − 3)·B + 3·n1x(x)·n1y(y)) / (4·ctx(x)·B)
   *
   * where ctx(x) = Σ_y c(x,y) (bigram slots starting at x), n1x(x) =
   * N1+(x·) (distinct continuations of x), n1y(y) = N1+(·y) (distinct
   * left contexts of y), B = N1+(··) (distinct bigram types). Every
   * quantity is an exact integer, and p is an exact rational, so the
   * whole output surface is engine-portable by construction: `sum_pq6` =
   * Σ⌊10⁶·p⌋ is computed with DECIMAL(38,0) integer multiply + integral
   * division — zero libm, the discipline q200's round-9 red row taught
   * (see [[interpolatedPerplexity]]'s determinism note). No raw ln/exp
   * digit appears anywhere in the output.
   *
   * Scale shape: bigrams from ONE zip_with (no position self-join);
   * ctx/n1x are a SECOND aggregation of the bigram-type table (tiny —
   * keyed by x), n1y likewise by y, and B rides in a 1-row broadcast.
   * The corpus shuffles once to count bigram types and once per term
   * join — all keyed, all map-side combinable.
   */
  def kneserNeyScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = col("graft_ws")
    val pairs = docs.select(col(idCol), split(col(textCol), " ").as("graft_ws"))
      .select(col(idCol), explode(when(size(ws) >= 2,
        zip_with(slice(ws, lit(1), size(ws) - 1),
          slice(ws, lit(2), size(ws) - 1),
          (a, b) => struct(a.as("x"), b.as("y"))))
        .otherwise(array().cast("array<struct<x:string,y:string>>")))
        .as("p"))
      .select(col(idCol), col("p.x").as("x"), col("p.y").as("y"))
    val cxy = pairs.groupBy(col("x"), col("y")).agg(count(lit(1)).as("c_xy"))
    // context totals and distinct-continuation counts, both from the
    // bigram-TYPE table (|types| rows, not |slots|) — reuses its exchange
    val byX = cxy.groupBy(col("x"))
      .agg(sum(col("c_xy")).as("ctx"), count(lit(1)).as("n1x"))
    val byY = cxy.groupBy(col("y")).agg(count(lit(1)).as("n1y"))
    val types = cxy.agg(count(lit(1)).as("graft_b"))
    val big = DecimalType(38, 0)
    pairs
      .join(cxy, Seq("x", "y"))
      .join(byX, Seq("x"))
      .join(byY, Seq("y"))
      .crossJoin(broadcast(types))
      // ⌊10⁶·p⌋ exactly: p = ((4c−3)·B + 3·n1x·n1y)/(4·ctx·B); c ≥ 1 on
      // every scored slot so the discount max() never binds
      .withColumn("graft_pnum",
        lit(1000000L).cast(big) *
          ((lit(4L).cast(big) * col("c_xy").cast(big) - lit(3L).cast(big)) *
            col("graft_b").cast(big) +
           lit(3L).cast(big) * col("n1x").cast(big) * col("n1y").cast(big)))
      .withColumn("graft_pden",
        lit(4L).cast(big) * col("ctx").cast(big) * col("graft_b").cast(big))
      .withColumn("graft_pq6", expr("graft_pnum div graft_pden"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_scored"),
        sum(col("c_xy")).as("sum_cxy"),
        sum(col("ctx")).as("sum_ctx"),
        sum(col("n1x")).as("sum_n1x"),
        sum(col("n1y")).as("sum_n1y"),
        sum(col("graft_pq6")).as("sum_pq6"))
  }

  /**
   * Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty,
   * SIGIR 2001 — the LM retrieval scorer that, with BM25, anchors every
   * IR baseline table): p(w|d) = (tf(w,d) + μ·cf(w)/N) / (|d| + μ),
   * with the Dirichlet prior μ pulling short documents toward the
   * corpus language model. Since μ, tf, cf, N, |d| are all integers,
   * p = (tf·N + μ·cf) / (N·(|d| + μ)) is an exact rational — the HASHED
   * score is `score_q6` = Σ_w∈q ⌊10⁶·p(w|d)⌋ over the query terms
   * (DECIMAL(38,0) integer arithmetic, zero libm; the true log-QL
   * ranking is monotone in each term's p, and the additive quantized
   * mass is the engine-portable surrogate this repo gates retrieval on
   * — the q200 discipline). Candidate docs are those containing ≥ 1
   * query term; ABSENT query terms still contribute their smoothing
   * mass μ·cf/(N·(|d|+μ)), which is exactly what distinguishes
   * Dirichlet QL from a tf-only scorer.
   *
   * Scale shape: tf is one filtered explode + (doc, term) hash-agg
   * (only query-term rows survive the filter); cf and N are |terms|-row
   * and 1-row broadcasts; the candidate×terms grid is |candidates|×|q|
   * rows. The final cut is a TakeOrderedAndProject.
   */
  def dirichletQueryLikelihood(docs: DataFrame, idCol: String,
                               textCol: String, terms: Seq[String],
                               mu: Long = 2000L, k: Int = 10): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      "dirichletQueryLikelihood: terms must be non-empty and distinct")
    require(mu >= 1L, s"mu=$mu must be positive")
    val big = DecimalType(38, 0)
    val words = docs.select(col(idCol), split(col(textCol), " ").as("graft_w"))
    val dl = words.select(col(idCol),
      size(col("graft_w")).cast(LongType).as("graft_dl"))
    val toks = words.select(col(idCol), explode(col("graft_w")).as("term"))
    val nTot = toks.agg(count(lit(1)).as("graft_n"))
    val qToks = toks.filter(col("term").isin(terms: _*))
    val cf = qToks.groupBy(col("term")).agg(count(lit(1)).as("graft_cf"))
    val tf = qToks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("graft_tf"))
    val termsDf = docs.sparkSession.range(1)
      .select(explode(array(terms.map(lit): _*)).as("term"))
    tf.select(col(idCol)).distinct()
      .join(dl, idCol)
      .crossJoin(broadcast(termsDf))
      .join(tf, Seq(idCol, "term"), "left")
      .na.fill(0L, Seq("graft_tf"))
      .join(broadcast(cf), Seq("term"), "left")
      .na.fill(0L, Seq("graft_cf"))
      .crossJoin(broadcast(nTot))
      // ⌊10⁶·p⌋ = (10⁶·(tf·N + μ·cf)) div (N·(dl+μ)) — exact integers
      .withColumn("graft_pq6", expr(
        s"(cast(1000000 as decimal(38,0)) * " +
        s"(cast(graft_tf as decimal(38,0)) * cast(graft_n as decimal(38,0)) " +
        s" + cast($mu as decimal(38,0)) * cast(graft_cf as decimal(38,0)))) " +
        s"div (cast(graft_n as decimal(38,0)) * " +
        s"cast(graft_dl + $mu as decimal(38,0)))"))
      .groupBy(col(idCol))
      .agg(first(col("graft_dl")).as("dl"),
        sum(when(col("graft_tf") > 0, 1L).otherwise(0L)).as("n_hit_terms"),
        sum(col("graft_pq6")).as("score_q6"))
      .orderBy(col("score_q6").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Rank-biased overlap between two rankings (Webber, Moffat & Zobel,
   * TOIS 2010 — THE standard for comparing indefinite/top-weighted
   * rankings, where Kendall/Spearman need full permutations): RBO_D =
   * Σ_{d=1..D} (1−p)·p^(d−1)·|A_{1..d} ∩ B_{1..d}|/d. With p = 1/2 the
   * weight is exactly 1/2^d, so each depth's term is the exact rational
   * overlap_d/(d·2^d); the emitted `term_q9` = ⌊10⁹·overlap_d/(d·2^d)⌋
   * and its running sum `rbo_q9` are integer-exact and engine-portable
   * (quantization before summation — the q200 discipline; the ≤D·2⁻⁹
   * floor error is far below any decision threshold). Use it to answer
   * "do my two retrieval stacks agree where it matters" — the top-heavy
   * p discounts disagreement deep in the tail.
   *
   * Inputs are (id, rank) frames (rank 1-based, from any top-k). Scale
   * shape: both inputs are bounded top-k lists, the id join and the
   * depth grid are |list|×D rows, and the running sum windows over D
   * rows only — metadata scale by construction.
   */
  def rankBiasedOverlap(rankA: DataFrame, rankB: DataFrame, idCol: String,
                        rankCol: String, depth: Int): DataFrame = {
    require(depth >= 1 && depth <= 40, s"depth=$depth out of range [1, 40]")
    import org.apache.spark.sql.expressions.Window
    val a = rankA.select(col(idCol), col(rankCol).cast(LongType).as("graft_ra"))
    val b = rankB.select(col(idCol), col(rankCol).cast(LongType).as("graft_rb"))
    val depths = rankA.sparkSession.range(1, depth + 1)
      .select(col("id").as("d"))
    val overlaps = a.join(b, idCol)
      .crossJoin(broadcast(depths))
      .filter(col("graft_ra") <= col("d") && col("graft_rb") <= col("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("overlap"))
    depths.join(overlaps, Seq("d"), "left")
      .na.fill(0L, Seq("overlap"))
      .withColumn("term_q9", expr(
        "cast(overlap * 1000000000 as decimal(38,0)) div " +
        "cast(d * shiftleft(cast(1 as bigint), cast(d as int)) " +
        "as decimal(38,0))").cast(LongType))
      .withColumn("rbo_q9", sum(col("term_q9")).over(
        Window.orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("d"), col("overlap"), col("term_q9"), col("rbo_q9"))
  }

  /**
   * Skip-gram co-occurrence counts — word2vec-style context mining: every
   * unordered word pair within `window` positions of each other, counted
   * corpus-wide, top-`k` by count. The counting step of embedding /
   * collocation training-data prep (the ±1 special case is
   * [[bigramPmiTopK]]'s adjacency).
   *
   * Scale shape: per distance d the pairs come from ONE `zip_with` of the
   * word array against its d-shifted self — no self-join of an exploded
   * token table on positions, no window function, zero shuffle before
   * the pair-count hash agg (map-side combinable). The cut is a
   * TakeOrderedAndProject.
   */
  def skipgramPairs(docs: DataFrame, textCol: String, window: Int,
                    k: Int): DataFrame = {
    require(window >= 1, s"window=$window must be positive")
    val ws = col("graft_ws")
    val perDist = (1 to window).map { d =>
      when(size(ws) > d,
        zip_with(slice(ws, lit(1), size(ws) - d),
          slice(ws, lit(d + 1), size(ws) - d),
          (a, b) => struct(least(a, b).as("x"), greatest(a, b).as("y"))))
        .otherwise(array().cast("array<struct<x:string,y:string>>"))
    }
    docs.select(split(col(textCol), " ").as("graft_ws"))
      .select(explode(concat(perDist: _*)).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("x").asc, col("y").asc)
      .limit(k)
  }

  def bigramPmiTopK(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val ws = col("graft_ws")
    val pairs = docs.select(split(col(textCol), " ").as("graft_ws"))
      .select(explode(when(size(ws) >= 2,
        zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
          (a, b) => struct(a.as("x"), b.as("y"))))
        .otherwise(array().cast("array<struct<x:string,y:string>>")))
        .as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
    val cxy = pairs.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("c_xy"))
    val terms = docs.select(explode(split(col(textCol), " ")).as("term"))
    val cx = terms.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val totals = cx.agg(sum(col("c")).as("n_tok"))
      .crossJoin(pairs.agg(count(lit(1)).as("n_pair")))
    cxy
      .join(cx.select(col("term").as("x"), col("c").as("c_x")), "x")
      .join(cx.select(col("term").as("y"), col("c").as("c_y")), "y")
      .crossJoin(broadcast(totals))
      .withColumn("pmi", round(F.log(
        (col("c_xy").cast(DoubleType) * col("n_tok") * col("n_tok"))
          / (col("n_pair").cast(DoubleType) * col("c_x") * col("c_y"))), 6))
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
        col("pmi"))
      .orderBy(col("c_xy").desc, col("x").asc, col("y").asc)
      .limit(k)
  }

  /**
   * Batch BM25 retrieval: top-`k` documents PER QUERY for a whole query
   * table at once — the shape that mines retrieval training pairs from a
   * corpus (one pass for a million queries, not a million passes).
   *
   * `queries` is (queryIdCol, term) rows; it is metadata-scale next to the
   * corpus, so it is BROADCAST twice: once as a distinct-term semi-filter
   * on the exploded words (only query-term postings survive the scan —
   * same pruning as [[bm25TopK]]), once to fan each posting out to the
   * queries containing its term. df is computed over the FILTERED postings
   * per distinct term (identical to bm25TopK's df: it counts docs
   * containing the term). Scoring arithmetic is bm25TopK's, per query.
   * The per-query cut uses the WindowGroupLimit rewrite (per-partition
   * top-k heaps), never a global sort.
   */
  def bm25RetrieveAll(docs: DataFrame, idCol: String, textCol: String,
                      queries: DataFrame, queryIdCol: String, k: Int,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val words = docs.select(col(idCol), split(col(textCol), " ").as("w"))
    val dl = words.select(col(idCol), size(col("w")).as("dl"))
    val qterms = queries.select(col(queryIdCol), col("term"))
    val terms = qterms.select(col("term")).distinct()
    val tf = words.select(col(idCol), explode(col("w")).as("term"))
      .join(broadcast(terms), Seq("term"), "left_semi")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl"))
    val idf = F.log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val scored = tf.join(broadcast(dfc), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(corpus))
      .withColumn("contrib", round(idf * tfNorm, 6).cast(DecimalType(18, 6)))
      .join(broadcast(qterms), "term")
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("contrib")).cast(DoubleType).as("bm25"),
        count(lit(1)).as("n_terms"))
    LatestSnapshot.topK(scored, Seq(queryIdCol), col("bm25").desc,
        Seq(col(idCol).asc), k)
      .select(col(queryIdCol), col(idCol), col("bm25"), col("n_terms"))
  }

  /**
   * Pseudo-relevance-feedback query expansion (Rocchio 1971 applied as
   * blind feedback — Buckley et al., TREC-3's classic recipe; the
   * retrieval-side sibling of [[hardNegatives]]'s mining loop): run the
   * seed query, treat the top-`fbK` documents as pseudo-relevant,
   * score every non-seed term in them by feedback-tf × corpus idf,
   * add the best `expK` terms to the query, and re-rank with BM25.
   * PRF is the standard zero-supervision recall booster — vocabulary
   * mismatch ("data"…"columnar") closes without any trained model.
   *
   * Determinism: idf = round(ln((N+1)/(df+1)), 6) cast DECIMAL and
   * multiplied by the integer feedback tf — the [[tfidfTopK]] rounding
   * contract — so expansion-term selection (score desc, term asc) and
   * the final BM25 ranking replay bit-identically in the oracle.
   *
   * Scale shape: everything stays distributed — the feedback set is a
   * bounded top-k, expansion candidates are one hash-agg over ONLY the
   * feedback docs' words, corpus df attaches via a left-semi-pruned
   * (id, term) dedup, and the expanded term set feeds
   * [[bm25RetrieveAll]] as a DataFrame (no driver collect of terms).
   */
  def prfExpandedRetrieve(docs: DataFrame, idCol: String, textCol: String,
                          seed: Seq[String], fbK: Int = 10, expK: Int = 5,
                          k: Int = 10, k1: Double = 1.2,
                          b: Double = 0.75): DataFrame = {
    require(seed.nonEmpty && seed.distinct.size == seed.size,
      "prfExpandedRetrieve: seed terms must be non-empty and distinct")
    val fb = bm25TopK(docs, idCol, textCol, seed, fbK, k1, b)
      .select(col(idCol))
    val fbTf = docs.join(broadcast(fb), idCol)
      .select(explode(split(col(textCol), " ")).as("term"))
      .filter(!col("term").isin(seed: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("graft_tfb"))
    val dfc = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .join(broadcast(fbTf.select(col("term"))), Seq("term"), "left_semi")
      .distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("graft_df"))
    val n = docs.agg(count(lit(1)).as("graft_nd"))
    val expTerms = fbTf.join(dfc, "term")
      .crossJoin(broadcast(n))
      .withColumn("graft_score",
        col("graft_tfb") *
          round(F.log((col("graft_nd") + lit(1.0)) /
            (col("graft_df") + lit(1.0))), 6).cast(DecimalType(18, 6)))
      .orderBy(col("graft_score").desc, col("term").asc)
      .limit(expK)
      .select(col("term"))
    val seedDf = docs.sparkSession.range(1)
      .select(explode(array(seed.map(lit): _*)).as("term"))
    val qterms = seedDf.unionByName(expTerms).withColumn("graft_q", lit(1L))
    bm25RetrieveAll(docs, idCol, textCol, qterms, "graft_q", k, k1, b)
      .select(col(idCol), col("bm25"), col("n_terms"))
  }

  /**
   * Boolean AND retrieval: documents containing EVERY query term — the
   * filter primitive under keyword search, taboo-list screening, and
   * "must mention all of X, Y, Z" corpus slicing; the conjunctive
   * counterpart of [[bm25TopK]]'s ranked retrieval.
   *
   * Shape: the word explode is cut to the |terms| matching words BEFORE
   * the aggregation (a pushed-down isin filter), so the doc-keyed
   * count-distinct agg sees only candidate rows — corpus volume never
   * reaches the shuffle. Matching is exact whole-word; distinct count
   * per doc == |terms| is the AND.
   */
  def booleanRetrieve(docs: DataFrame, idCol: String, textCol: String,
                      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      "booleanRetrieve: terms must be non-empty and distinct")
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("graft_w"))
      .filter(col("graft_w").isin(terms: _*))
      .groupBy(col(idCol))
      .agg(count_distinct(col("graft_w")).as("graft_hits"))
      .filter(col("graft_hits") === terms.size)
      .select(col(idCol))
  }

  /**
   * Average precision per group — the area under the precision-recall
   * curve for a binary-relevance ranking: AP = (Σ_{k rel} P@k)/n_pos
   * over the (scoreCol desc, tieCol asc) order. The PR-side companion
   * of [[ndcgAtK]] (graded, log-discounted) and `Standardize.groupAuc`
   * (ROC): AP is the one that ignores the easy negatives, which is why
   * retrieval evals report it (MAP is its mean over groups).
   *
   * Determinism: P@k = cumrel/k is an int/int double, each kept term
   * rounds to 6 dp into a decimal sum, the final /n_pos rounds to 6 dp;
   * the rank order is total. Shape: one rank window (row_number +
   * running sum share it) and one map-side-combinable agg.
   */
  def averagePrecision(df: DataFrame, groupCol: String, scoreCol: String,
                       tieCol: String, relCol: String): DataFrame = {
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(scoreCol).desc, col(tieCol))
    val wCum = wRank.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ranked = df
      .select(col(groupCol), col(relCol).cast(LongType).as("graft_rel"),
        col(scoreCol), col(tieCol))
      .withColumn("graft_rn", row_number().over(wRank))
      .withColumn("graft_cum", sum(col("graft_rel")).over(wCum))
    ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_items"),
        sum(col("graft_rel")).cast(LongType).as("n_pos"),
        sum(when(col("graft_rel") === 1L,
          round(col("graft_cum").cast(DoubleType) /
            col("graft_rn").cast(DoubleType), 6).cast(DecimalType(18, 6))))
          .as("graft_apsum"))
      .select(col(groupCol), col("n_items"), col("n_pos"),
        when(col("n_pos") > 0,
          round(col("graft_apsum").cast(DoubleType) / col("n_pos"), 6))
          .as("avg_precision"))
  }

  /**
   * NDCG@k per group (Järvelin & Kekäläinen 2002): the graded ranking
   * metric — how close a scored ordering comes to the relevance-ideal
   * ordering, with the log-position discount that makes the top of the
   * list dominate. The eval layer for any retrieval/curation ranking
   * this engine produces (BM25, cosine top-k, quality ordering).
   *
   * DCG = Σ_{pos≤k} (2^rel − 1)/ln(pos+1) over the (scoreCol desc,
   * tieCol asc) order; IDCG re-ranks by (rel desc, tieCol asc). The
   * discount is NATURAL log (the classic log2 scaled by the constant
   * ln 2, which cancels in the NDCG ratio) because Spark `log` ↔
   * DuckDB `ln` is the engine-agreement idiom every green query here
   * uses. Groups with IDCG = 0 (no relevant items) yield NULL.
   * Determinism: rel is integer, 2^rel exact, each term rounds to 6 dp
   * and accumulates as DECIMAL(38,6) — order-independent — and the
   * final ratio rounds to 6 dp; both rank orders are total via the tie
   * column.
   *
   * Shape: two row_number windows sharing ONE group partitioning, a
   * k-filter before any arithmetic, and one map-side-combinable agg —
   * the log/pow terms run on ≤ k rows per group, not the corpus.
   */
  def ndcgAtK(df: DataFrame, groupCol: String, scoreCol: String,
              tieCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val wScore = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(scoreCol).desc, col(tieCol))
    val wIdeal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("graft_rel").desc, col(tieCol))
    def gain(posCol: org.apache.spark.sql.Column) =
      round((call_function("shiftleft", lit(1L), col("graft_rel").cast("int"))
          - lit(1L))
        .cast(DoubleType) /
        log(posCol.cast(DoubleType) + lit(1.0)), 6)
        .cast(DecimalType(38, 6))
    val ranked = df
      .select(col(groupCol), col(relCol).cast(LongType).as("graft_rel"),
        col(scoreCol), col(tieCol))
      .withColumn("graft_pos", row_number().over(wScore))
      .withColumn("graft_ipos", row_number().over(wIdeal))
    ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("graft_pos") <= k, gain(col("graft_pos")))
          .otherwise(lit(BigDecimal(0).setScale(6)))).as("graft_dcg"),
        sum(when(col("graft_ipos") <= k, gain(col("graft_ipos")))
          .otherwise(lit(BigDecimal(0).setScale(6)))).as("graft_idcg"))
      .select(col(groupCol), col("n_items"),
        round(col("graft_dcg").cast(DoubleType), 6).as("dcg"),
        when(col("graft_idcg") > 0,
          round(col("graft_dcg").cast(DoubleType) /
            col("graft_idcg").cast(DoubleType), 6)).as("ndcg"))
  }

  /**
   * BM25 hard-negative mining (the DPR recipe, Karpukhin et al. EMNLP
   * 2020 §4.2: the strongest training negatives for a dense retriever
   * are the top BM25 hits that are NOT labeled relevant). One
   * [[bm25RetrieveAll]] pass retrieves a `poolK`-deep candidate pool per
   * query, the gold (query, doc) pairs are anti-joined away, and the
   * surviving non-relevant hits are re-ranked 1..n per query — the
   * (query, hard-negative, rank) table a contrastive training job
   * consumes directly.
   *
   * `poolK` must exceed `n` by at least the per-query gold count or
   * queries whose gold docs dominate the pool come up short — callers
   * size poolK = n + max gold per query.
   *
   * Scale shape: inherits bm25RetrieveAll's one-pass posture (query
   * terms broadcast twice, WindowGroupLimit top-k — never a global
   * sort); `gold` is labeled-pair metadata (human annotations — always
   * tiny next to the corpus) so the anti-join is BROADCAST, and the
   * re-rank window runs on ≤ poolK rows per query. Scores are sums of
   * pre-rounded DECIMAL contributions (the bm25TopK portability
   * contract), so ranks and scores are engine-exact.
   */
  /**
   * CCNet-style head/middle/tail perplexity tiers (Wenzek et al. 2020,
   * §4.3): within each group (CCNet: language), documents split into
   * `tiers.size` equal-count tiers by descending predictability, so
   * "head" holds the slice the reference LM finds most predictable
   * (lowest perplexity) — the tier CCNet keeps outright, "middle" kept
   * conditionally, "tail" dropped or down-sampled.
   *
   * The ordering key is the PORTABLE per-slot mean quantized
   * interpolated probability `sum_pq6 div n_scored` from
   * [[interpolatedPerplexity]] (exact BIGINT; descending predictability
   * = ascending perplexity), so tier boundaries are engine-exact — raw
   * libm `ppl` never enters the ordering (the q200 portability rule).
   * Every document sharing a score level lands in the SAME tier
   * (boundaries fall between distinct levels via the strictly-above
   * cumulative count), so assignment needs no per-document tiebreak.
   *
   * Scale shape: the corpus collapses to a (group, score) distribution
   * first — a map-side-combinable hash agg whose cardinality is bounded
   * by |groups|·10⁶ quantized levels, metadata-scale. The cumulative
   * window and the tier CASE run on THAT table only, and assignment
   * returns to the corpus via a broadcast hash join on (group, score).
   * The corpus itself never range-shuffles — this is the
   * boundary-broadcast design, not a per-document ntile sort.
   */
  def perplexityTiers(scored: DataFrame, idCol: String, groupCol: String,
                      tiers: Seq[String] = Seq("head", "middle", "tail"))
      : DataFrame = {
    require(tiers.nonEmpty, "tiers must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val k = tiers.size
    val sc = scored.select(col(idCol), col(groupCol),
      expr("cast(sum_pq6 as bigint) div n_scored").as("pq6_mean"))
    val dist = sc.groupBy(col(groupCol), col("pq6_mean"))
      .agg(count(lit(1)).as("graft_n"))
    // docs at strictly MORE predictable levels — coalesce(0) for the top
    val cumBefore = coalesce(sum(col("graft_n")).over(
      Window.partitionBy(col(groupCol)).orderBy(col("pq6_mean").desc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val tot = sum(col("graft_n")).over(Window.partitionBy(col(groupCol)))
    // tier i ⇔ cum0/tot < (i+1)/k, integer cross-multiplied (exact)
    val tierCol = tiers.init.zipWithIndex.foldRight(lit(tiers.last)) {
      case ((name, i), rest) =>
        when(col("graft_cum0") * lit(k.toLong) <
          col("graft_tot") * lit(i.toLong + 1L), lit(name)).otherwise(rest)
    }
    val bounds = dist
      .withColumn("graft_cum0", cumBefore)
      .withColumn("graft_tot", tot)
      .select(col(groupCol), col("pq6_mean"), tierCol.as("tier"))
    sc.join(broadcast(bounds), Seq(groupCol, "pq6_mean"))
      .select(col(idCol), col(groupCol), col("pq6_mean"), col("tier"))
  }

  /**
   * Driver-side export of the interpolated-bigram model for SERVING:
   * (bigram "x y" → count, word → count, N). The model is
   * vocabulary-scale by construction — the KenLM/fastText serving
   * contract is precisely that a scoring model fits in a broadcast,
   * unlike the corpus it was trained on. `maxEntries` guards against
   * accidentally collecting a corpus-sized table to the driver.
   */
  def bigramServingModel(docs: DataFrame, textCol: String,
                         maxEntries: Int = 2000000)
      : (Map[String, Long], Map[String, Long], Long) = {
    val ws = col("graft_ws")
    val cxy = docs.select(split(col(textCol), " ").as("graft_ws"))
      .select(explode(when(size(ws) >= 2,
        zip_with(slice(ws, lit(1), size(ws) - 1),
          slice(ws, lit(2), size(ws) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array().cast("array<string>"))).as("graft_g"))
      .groupBy(col("graft_g")).agg(count(lit(1)).as("graft_c"))
    val cu = docs.select(explode(split(col(textCol), " ")).as("graft_t"))
      .groupBy(col("graft_t")).agg(count(lit(1)).as("graft_c"))
    val nBig = cxy.count(); val nUni = cu.count()
    require(nBig <= maxEntries && nUni <= maxEntries,
      s"model too large to serve broadcast: $nBig bigrams / $nUni words")
    val cxyM = cxy.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cuM = cu.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (cxyM, cuM, cuM.values.sum)
  }

  /**
   * STATELESS serving-side scoring columns for the interpolated bigram
   * model: (n_scored, sum_pq6) computed per row from broadcast literal
   * maps — the apply half of [[interpolatedPerplexity]], usable
   * unchanged on a stream (no join, no aggregation, no state; the
   * [[TextAnalysis.linearQualityScoreCols]] literal-model pattern).
   * Identical integer arithmetic to the batch operator for every
   * in-vocabulary slot; out-of-vocabulary context words (impossible
   * in-corpus, expected on a live stream) back off to the unigram term
   * (1−λ)·c(y)/N alone.
   */
  def pq6ServingCols(textCol: Column, cxy: Map[String, Long],
                     cu: Map[String, Long], n: Long,
                     lambda: Double = 0.75): (Column, Column) = {
    require(lambda > 0.0 && lambda < 1.0, s"lambda=$lambda out of range")
    val lamDec = java.math.BigDecimal.valueOf(lambda)
    require(lamDec.scale <= 9, s"lambda=$lambda too fine")
    val lamNum = lamDec.unscaledValue().longValueExact()
    val lamDen = java.math.BigDecimal.ONE.movePointRight(lamDec.scale)
      .longValueExact()
    val big = DecimalType(38, 0)
    val cxyM = typedLit(cxy)
    val cuM = typedLit(cu)
    val ws = split(textCol, " ")
    val slots = when(size(ws) >= 2,
      zip_with(slice(ws, lit(1), size(ws) - 1),
        slice(ws, lit(2), size(ws) - 1),
        (a, b) => struct(a.as("x"), b.as("y"))))
      .otherwise(array().cast("array<struct<x:string,y:string>>"))
    def pq6(x: Column, y: Column): Column = {
      val c = coalesce(element_at(cxyM, concat(x, lit(" "), y)), lit(0L))
      val cx = coalesce(element_at(cuM, x), lit(0L))
      val cy = coalesce(element_at(cuM, y), lit(0L))
      val num = lit(1000000L).cast(big) *
        (lit(lamNum).cast(big) * c.cast(big) * lit(n).cast(big) +
          lit(lamDen - lamNum).cast(big) * cy.cast(big) * cx.cast(big))
      val den = lit(lamDen).cast(big) * cx.cast(big) * lit(n).cast(big)
      val numBk = lit(1000000L).cast(big) *
        lit(lamDen - lamNum).cast(big) * cy.cast(big)
      val denBk = lit(lamDen).cast(big) * lit(n).cast(big)
      when(cx > 0, call_function("div", num, den))
        .otherwise(call_function("div", numBk, denBk))
    }
    val sumPq6 = aggregate(slots, lit(0L).cast(big),
      (acc, s) => acc + pq6(s.getField("x"), s.getField("y")))
    (size(slots).cast(LongType), sumPq6)
  }

  def hardNegatives(docs: DataFrame, idCol: String, textCol: String,
                    queries: DataFrame, queryIdCol: String,
                    gold: DataFrame, n: Int, poolK: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(n >= 1, s"n=$n out of range")
    require(poolK >= n, s"poolK=$poolK must be >= n=$n")
    val pool = bm25RetrieveAll(docs, idCol, textCol, queries, queryIdCol,
      k = poolK, k1 = k1, b = b)
    val negatives = pool.join(
      broadcast(gold.select(col(queryIdCol), col(idCol))),
      Seq(queryIdCol, idCol), "left_anti")
    LatestSnapshot.topK(negatives, Seq(queryIdCol), col("bm25").desc,
        Seq(col(idCol).asc), n)
      .withColumn("neg_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(queryIdCol))
          .orderBy(col("bm25").desc, col(idCol).asc)))
      .select(col(queryIdCol), col(idCol), col("bm25"), col("n_terms"),
        col("neg_rank").cast(LongType).as("neg_rank"))
  }

  /**
   * Expected Reciprocal Rank at k (Chapelle et al. CIKM 2009) — the
   * cascade-model ranking metric: a user scans down the list and stops
   * at rank r with probability R_r·Π_{i<r}(1−R_i), contributing 1/r;
   * R_r = (2^rel − 1)/2^g for graded relevance rel ∈ [0, g]. Unlike
   * NDCG's position discount, ERR models that a highly relevant early
   * hit SATISFIES the user — redundant later hits stop counting.
   *
   * ERR is a sum of rationals whose denominators divide
   * D = lcm(1..k)·2^(g·k), so the WHOLE metric is computed as one exact
   * integer numerator over the constant D (for k = 10, g = 4:
   * D = 2520·2^40 — inside int64, every partial term too). The hashed
   * surface is `err_num`, `err_den`, and the half-away micro rounding —
   * zero floating point anywhere (the PORTABILITY.md discipline; 2^x
   * via shiftleft).
   *
   * Shape: per-group top-k selection via the bounded-priority-queue
   * collector ([[TopK]]) — O(k) state per group, map-side combined —
   * then one fold over each group's ≤ k-element array. Corpus rows are
   * touched once; nothing is globally sorted.
   */
  def errAtK(df: DataFrame, groupCol: String, scoreCol: String,
             tieCol: String, relCol: String, k: Int,
             gradeBits: Int = 4): DataFrame = {
    require(k >= 1 && k <= 10, s"k=$k out of range (1..10)")
    require(gradeBits >= 1 && gradeBits <= 5,
      s"gradeBits=$gradeBits out of range (1..5)")
    val lcmK = (1 to k).foldLeft(1L)((a, b) =>
      a / BigInt(a).gcd(BigInt(b)).toLong * b)
    val g = gradeBits
    // clamp rel into [0, gradeBits] INSIDE the operator: rel > g makes
    // the continuation factor 2^g − 2^rel + 1 negative (nonsense ERR
    // terms) and rel ≥ 63 silently overflows shiftleft — neither may
    // depend on the call site remembering to clamp. coalesce FIRST:
    // least/greatest skip NULLs, so without it a NULL relevance would
    // sail through least(g, NULL) = g and score as MAXIMALLY relevant —
    // a missing judgment must count as rel 0 (non-relevant), never g
    val sel = TopK.kSmallest(
      df.select(col(groupCol), col(scoreCol), col(tieCol),
        greatest(lit(0L), least(lit(g.toLong),
          coalesce(col(relCol).cast(LongType), lit(0L)))).as("graft_rel")),
      Seq(col(groupCol)),
      Seq("ns" -> -col(scoreCol), "tie" -> col(tieCol),
        "rel" -> col("graft_rel")), k)
    // fold in rank order over the (already rank-sorted) per-group array:
    // acc = (num, prod, r); term_r = (L/r)·2^(g·(k−r))·(2^rel−1)·prod
    val folded = sel
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_items"),
        sort_array(collect_list(struct(col("ns"), col("tie"), col("rel"))))
          .as("graft_ranked"))
      .withColumn("graft_acc", aggregate(
        col("graft_ranked"),
        struct(lit(0L).as("num"), lit(1L).as("prod"), lit(1L).as("r")),
        (acc, e) => {
          val rel = e.getField("rel")
          def p2(x: Column): Column =
            call_function("shiftleft", lit(1L), x.cast("int"))
          val term = call_function("div", lit(lcmK), acc.getField("r")) *
            p2(lit(g) * (lit(k) - acc.getField("r"))) *
            (p2(rel) - lit(1L)) * acc.getField("prod")
          struct(
            (acc.getField("num") + term).as("num"),
            (acc.getField("prod") *
              (p2(lit(g)) - p2(rel) + lit(1L))).as("prod"),
            (acc.getField("r") + lit(1L)).as("r"))
        }))
      .select(col(groupCol), col("n_items"),
        col("graft_acc.num").as("err_num"),
        lit(lcmK * (1L << (g * k))).as("err_den"))
    folded.withColumn("err_micro",
      ExactRound.halfAwayDiv(
        col("err_num").cast(DecimalType(38, 0)) * lit(1000000L),
        col("err_den")))
  }

  /**
   * Unbiased pass@k (Chen et al. 2021, "Evaluating LLMs Trained on
   * Code", eq. 1): per task with n attempts and c successes,
   * pass@k = 1 − C(n−c, k)/C(n, k) — the probability that a random
   * k-subset of the attempts contains at least one success. THE
   * correctness headline of every code/agent eval; computing it as
   * (c/n)·k or 1 − (1 − c/n)^k is the biased estimator the paper
   * explicitly warns against.
   *
   * Exactness: 1 − ∏_{i<k} (n−c−i)/(n−i) as ONE exact rational —
   * num = ∏ max(n−c−i, 0) and den = ∏ (n−i) in DECIMAL(38,0) (k ≤ 10
   * and n ≤ 10⁹ keep the products inside 38 digits), reported as
   * half-away micros of (den − num)/den. n−c < k makes some factor 0,
   * so pass@k = 1 exactly (any k-subset must hit a success). n < k is
   * reported as NULL (the estimator is undefined; Chen et al. drop
   * those tasks) — never a silently-clamped number.
   *
   * Scale shape: ONE task-keyed map-side-combinable count agg over the
   * attempt log; the product is a fixed k-term per-row projection.
   */
  def passAtK(df: DataFrame, taskCol: String, successCol: Column,
              k: Int): DataFrame = {
    require(k >= 1 && k <= 10, s"k=$k out of range (1..10)")
    val big = DecimalType(38, 0)
    val agg = df.groupBy(col(taskCol))
      .agg(count(lit(1)).as("n_attempts"),
        sum(when(coalesce(successCol.cast("boolean"), lit(false)), 1L)
          .otherwise(0L)).as("n_success"))
    val n = col("n_attempts"); val c = col("n_success")
    val num = (0 until k)
      .map(i => greatest(n - c - lit(i.toLong), lit(0L)).cast(big))
      .reduce((a, b) => (a * b).cast(big))
    val den = (0 until k)
      .map(i => (n - lit(i.toLong)).cast(big))
      .reduce((a, b) => (a * b).cast(big))
    agg.select(col(taskCol), col("n_attempts"), col("n_success"),
      when(n >= k, ExactRound.halfAwayDiv(
        ((den - num) * lit(1000000L).cast(big)).cast(big), den))
        .as(s"pass_at_${k}_micro"))
  }
}
