package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Deterministic, engine-portable sampling/splitting for reproducible
 * training-data holdouts.
 *
 * The randomness source is the first md5 byte of (salt ‖ key): seedless,
 * stable under repartitioning and re-runs, identical in any engine with
 * md5 — the properties `TABLESAMPLE`/`rand(seed)` lack (both are
 * partitioning-dependent in Spark). A narrow codegen'd projection; no
 * shuffle, no state.
 */
object Sampling {

  /** 0..255 bucket for a row: first md5 byte of salt_key. */
  def bucket(salt: String, key: Column): Column =
    conv(substring(md5(concat_ws("_", lit(salt), key)), 1, 2), 16, 10)
      .cast(IntegerType)

  /**
   * Adds `split` ∈ cuts' labels: row goes to the first (label, upperBound)
   * whose bound exceeds its bucket — e.g. Seq(("train",204), ("val",230),
   * ("test",256)) ≈ 80/10/10. Bounds are cumulative on the 0..255 scale;
   * the last bound must be 256 so every row lands somewhere.
   */
  /**
   * Per-stratum deterministic sampling: keep a row iff its md5 bucket
   * falls below its stratum's bound (bound/256 ≈ the stratum's rate) —
   * per-language corpus rebalancing with the same seedless, engine- and
   * partitioning-stable randomness source as `bucket`. A narrow filter;
   * the stratum→bound table compiles to a codegen'd CASE, no join.
   */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       salt: String, bounds: Seq[(String, Int)],
                       defaultBound: Int): DataFrame = {
    val b = bucket(salt, col(keyCol))
    val bound = bounds.foldRight(lit(defaultBound): Column) {
      case ((stratum, bd), rest) =>
        when(col(strataCol) === stratum, lit(bd)).otherwise(rest)
    }
    df.filter(b < bound)
  }

  def deterministicSplit(df: DataFrame, keyCol: String, salt: String,
                         cuts: Seq[(String, Int)],
                         outCol: String = "split"): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 256,
      "cuts must be cumulative with final bound 256")
    val b = bucket(salt, col(keyCol))
    val expr = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((label, bound), rest) => when(b < bound, lit(label)).otherwise(rest)
    }
    df.withColumn(outCol, expr)
  }

  /**
   * Data mixing toward a uniform source distribution: downsample each
   * stratum so every stratum contributes (approximately) equally — the
   * "rebalance the web-crawl vs books vs code mix" step of corpus
   * assembly. A stratum with n_s ≤ N/k rows is kept whole (rates never
   * upsample).
   *
   * Keep rule per row: `bucket · k · n_s < 256 · N` — the integer-exact
   * form of bucket/256 < (N/k)/n_s, so the decision is pure int64
   * arithmetic, bit-identical in any engine (no float rate to diverge
   * on). Randomness is the same seedless md5 bucket as [[bucket]], so the
   * kept set is stable under repartitioning and re-runs.
   *
   * Plan: one metadata-scale aggregation for (n_s, N) — broadcast back —
   * then a narrow filter. The corpus itself is never shuffled.
   */
  def uniformMix(df: DataFrame, keyCol: String, strataCol: String,
                 salt: String): DataFrame = {
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("graft_ns"))
    val withTotals = counts
      .crossJoin(broadcast(counts.agg(sum(col("graft_ns")).as("graft_n"),
        count(lit(1)).as("graft_k"))))
    df.join(broadcast(withTotals), strataCol)
      .filter(bucket(salt, col(keyCol)).cast(LongType)
        * col("graft_k") * col("graft_ns") < lit(256L) * col("graft_n"))
      .drop("graft_ns", "graft_n", "graft_k")
  }

  /**
   * Temperature-flattened source mixing: downsample stratum s at rate
   * r_s = (n_min / n_s)^(1−α), so kept counts follow the n_s^α profile
   * LLM training mixes use ("sampling with temperature"): the smallest
   * stratum is kept whole, larger strata are compressed toward it. α=1
   * keeps everything; α→0 is [[uniformMix]]'s everyone-equal target.
   *
   * The exponent is supplied as the rational 1−α = p/q so the keep rule
   * stays INTEGER-exact — raising both sides of
   * `bucket/256 < (n_min/n_s)^(p/q)` to the q-th power gives
   *
   *   bucket^q · n_s^p  <  256^q · n_min^p
   *
   * pure int64 arithmetic (no pow/log/float to diverge between engines).
   * Overflow is checked AGAINST THE DATA, not just q: the worst case
   * either side sees, 256^q · max(n_s)^p, must fit int64 — verified
   * eagerly from the (metadata-scale) stratum counts; with ANSI off a wrapped
   * multiply would silently corrupt the mix, so the guard throws
   * instead. With the default α=½ (p=1, q=2) strata up to ~1.4·10¹⁴
   * rows pass. Randomness is the same seedless md5 bucket as
   * [[bucket]]: stable under repartitioning, re-runs, and engines.
   *
   * Plan: one metadata-scale aggregation for (n_s, n_min) — broadcast
   * back (and eagerly range-checked) — then a narrow filter; the corpus
   * is never shuffled.
   */
  def temperatureMix(df: DataFrame, keyCol: String, strataCol: String,
                     salt: String, p: Int = 1, q: Int = 2): DataFrame = {
    require(p >= 0 && q >= 1 && p <= q, "need 0 <= p/q <= 1 (= 1 - alpha)")
    require(q <= 7, s"256^q must fit int64; q=$q too large")
    def ipow(c: Column, e: Int): Column =
      if (e == 0) lit(1L) else Seq.fill(e)(c).reduce(_ * _)
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("graft_ns"))
    // eager overflow check on the stratum counts (strata-cardinality
    // rows — metadata-scale): 256^q · max(n_s)^p bounds both sides of
    // the keep rule's int64 arithmetic
    val maxNs = counts.agg(max(col("graft_ns"))).head.getLong(0)
    val worst = BigInt(256).pow(q) * BigInt(maxNs).pow(p)
    require(worst <= Long.MaxValue,
      s"temperatureMix keep rule overflows int64: 256^$q * $maxNs^$p = " +
        s"$worst; lower p/q or pre-split giant strata")
    val withMin = counts
      .crossJoin(broadcast(counts.agg(min(col("graft_ns")).as("graft_nmin"))))
    df.join(broadcast(withMin), strataCol)
      .filter(ipow(bucket(salt, col(keyCol)).cast(LongType), q)
          * ipow(col("graft_ns"), p)
        < ipow(lit(256L), q) * ipow(col("graft_nmin"), p))
      .drop("graft_ns", "graft_nmin")
  }

  /**
   * Quality-weighted deterministic sampling: each row survives with
   * probability (approximately) equal to its own (0..1) score —
   * `bucket16/65536 < score` — so high-quality documents are kept
   * preferentially without a hard cutoff (the soft alternative to a
   * threshold filter, preserving some tail diversity). The randomness
   * source is the first FOUR md5 hex chars (16 bits): the effective keep
   * probability is ceil(65536·s)/65536, a quantization of at most
   * 1/65536 ≈ 1.5·10⁻⁵ — an 8-bit bucket would keep score-10⁻⁶ rows at
   * 0.39%, thousands of times the intended rate, exactly the tail this
   * operator exists to suppress. The comparison is double-exact and
   * engine-portable as long as `scoreCol` itself is reproducibly derived
   * (round it to 6 dp, the project rule); the kept set is stable under
   * repartitioning and re-runs. A narrow codegen'd filter — no
   * aggregation, no shuffle, no state at all.
   */
  def weightedSample(df: DataFrame, keyCol: String, scoreCol: String,
                     salt: String): DataFrame = {
    val bucket16 = conv(
      substring(md5(concat_ws("_", lit(salt), col(keyCol))), 1, 4), 16, 10)
      .cast(LongType)
    // A NULL score (e.g. a quality ratio over empty text, where Spark's
    // division yields NULL) would make the comparison NULL and drop the
    // row with no signal — silent under-sampling. Raise instead; the
    // check rides the score expression itself (can't be pruned).
    val sChecked = when(col(scoreCol).isNotNull, col(scoreCol))
      .otherwise(raise_error(concat(
        lit(s"weightedSample requires non-null $scoreCol, got NULL at "),
        col(keyCol).cast(StringType))).cast(DoubleType))
    df.filter(bucket16.cast(DoubleType) < sChecked * 65536.0)
  }

  /**
   * Weighted sample WITHOUT replacement, exactly k per stratum —
   * Efraimidis–Spirakis (2006) A-ES: each row draws u ~ U(0,1) from its
   * salted md5 (seedless, deterministic) and ranks by u^(1/w); the
   * top k per stratum are a bona-fide weighted sample without
   * replacement — the exact-size counterpart of [[weightedSample]]'s
   * Bernoulli acceptance, and the standard one-pass distributed
   * algorithm for "pick k docs per language proportional to token
   * count".
   *
   * Ranking uses the monotone-equivalent key ln(u)/w (u ∈ (0,1), so
   * ln u < 0 and the division ORDER-REVERSES per weight) — avoiding
   * pow's engine differences; u = (h48+1)/2^48 from the first 12 md5
   * hex digits is a dyadic rational, exact in a double, so both engines
   * compute bit-identical keys (Spark log ↔ DuckDB ln, the proven
   * idiom). Weights must be > 0: a NULL/≤0 weight raises (un-prunable,
   * riding the key expression) rather than silently skewing the draw.
   *
   * Shape: one narrow projection + the rank-limit window
   * (WindowGroupLimit: per-partition top-k heaps cut before the
   * shuffle) — one pass, no per-stratum state beyond the heap.
   */
  def weightedTopKPerStratum(df: DataFrame, keyCol: String,
                             weightCol: String, strataCol: String,
                             salt: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val h48 = conv(
      substring(md5(concat_ws("_", lit(salt), col(keyCol))), 1, 12), 16, 10)
      .cast(LongType)
    val u = (h48 + lit(1L)).cast(DoubleType) / lit(281474976710656.0)
    val wChecked = when(col(weightCol).isNotNull &&
        col(weightCol).cast(DoubleType) > 0.0, col(weightCol).cast(DoubleType))
      .otherwise(raise_error(concat(
        lit(s"weightedTopKPerStratum requires positive $weightCol at "),
        col(keyCol).cast(StringType))).cast(DoubleType))
    LatestSnapshot.topK(
      df.withColumn("graft_aes_key", log(u) / wChecked),
      Seq(strataCol), col("graft_aes_key").desc, Seq(col(keyCol).asc), k)
      .drop("graft_aes_key")
  }

  /**
   * Exactly-N-per-stratum deterministic sample: rows rank within their
   * stratum by the full md5 hex of (salt ‖ key) — a seedless uniform
   * order — and the first `n` survive. Unlike the rate-based samplers
   * ([[stratifiedSample]]/[[uniformMix]]) the output size is EXACT:
   * min(n, |stratum|) rows per stratum, the contract an eval-set builder
   * needs. Compiles to WindowGroupLimit (per-partition top-N heaps
   * before the shuffle), so stratum size never concentrates in one task;
   * md5 hex is ASCII so the ordering is collation-independent.
   */
  def exactNPerStratum(df: DataFrame, keyCol: String, strataCol: String,
                       salt: String, n: Int): DataFrame =
    LatestSnapshot.topK(df, Seq(strataCol),
      md5(concat_ws("_", lit(salt), col(keyCol))).asc,
      Seq(col(keyCol).asc), n)

  /**
   * Exact-total proportional stratified sample: allocate `totalN` slots
   * across strata by the largest-remainder (Hamilton) method — quota_s =
   * ⌊N·n_s/n⌋ plus one extra for the strata with the largest remainders
   * until exactly N slots are assigned — then fill each quota with the
   * stratum's md5-first rows ([[exactNPerStratum]]'s order). The output
   * size is EXACTLY `totalN` (when every stratum can fill its quota) and
   * the per-stratum mix matches the corpus proportions as closely as
   * integers allow — the eval-set contract "give me 10 000 docs with the
   * corpus's language mix".
   *
   * Everything is integer-exact (int64 `div`/`%`; remainder ties break
   * by stratum name). The allocation windows run over STRATUM rows —
   * metadata scale — and the corpus sees one count agg, one broadcast
   * quota join, and the WindowGroupLimit rank filter.
   */
  def proportionalQuota(df: DataFrame, keyCol: String, strataCol: String,
                        salt: String, totalN: Long): DataFrame = {
    require(totalN >= 0, s"totalN must be non-negative: $totalN")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("graft_ns"))
    val tot = counts.agg(sum(col("graft_ns")).as("graft_n"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().orderBy(col("graft_rem").desc, col(strataCol).asc)
    val quota = counts.crossJoin(broadcast(tot))
      .withColumn("graft_base",
        call_function("div", lit(totalN) * col("graft_ns"), col("graft_n")))
      .withColumn("graft_rem",
        (lit(totalN) * col("graft_ns")) % col("graft_n"))
      .withColumn("graft_rk", row_number().over(wAll))
      .withColumn("graft_slots",
        lit(totalN) - sum(col("graft_base")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("graft_quota",
        col("graft_base") +
          when(col("graft_rk") <= col("graft_slots"), 1L).otherwise(0L))
      .select(col(strataCol), col("graft_quota"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(concat_ws("_", lit(salt), col(keyCol))).asc,
        col(keyCol).asc)
    df.join(broadcast(quota), Seq(strataCol))
      .withColumn("graft_rn", row_number().over(wRank))
      .filter(col("graft_rn") <= col("graft_quota"))
      .drop("graft_rn", "graft_quota")
  }

  /**
   * Distribution-matching resample: downsample so the kept corpus
   * follows an ARBITRARY target mix (integer weights w_s, proportions
   * w_s/Σw) at the largest total size the data supports — the general
   * form of [[uniformMix]] (all-equal target) and the workhorse of "make
   * the mix 40% web / 30% books / 30% code" corpus assembly. Strata
   * outside `target` are dropped; no stratum upsamples.
   *
   * The binding stratum s* = argmin n_s/w_s (found by int64
   * cross-multiplication over the metadata-scale counts — no float
   * ratios) is kept whole; stratum s keeps m_s = w_s·n_{s*}/w_{s*} rows
   * in expectation via the integer-exact keep rule
   *
   *   bucket · w_{s*} · n_s  <  256 · w_s · n_{s*}
   *
   * (both sides int64; overflow checked against the data eagerly, the
   * [[temperatureMix]] pattern). Randomness is the seedless md5
   * [[bucket]]: stable under repartitioning, re-runs, and engines.
   *
   * Plan: one metadata-scale count aggregation (collected eagerly for
   * the argmin + guard, then inlined as literals in a codegen'd CASE) —
   * the corpus itself sees ONE narrow filter, no join, no shuffle.
   */
  def matchDistribution(df: DataFrame, keyCol: String, strataCol: String,
                        salt: String,
                        target: Seq[(String, Long)]): DataFrame = {
    require(target.nonEmpty, "matchDistribution: empty target")
    require(target.map(_._1).distinct.size == target.size,
      "matchDistribution: duplicate target strata")
    require(target.forall(_._2 > 0),
      s"matchDistribution: weights must be positive: $target")
    val counts = df.filter(col(strataCol).isin(target.map(_._1): _*))
      .groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    target.foreach { case (s, _) =>
      require(counts.getOrElse(s, 0L) > 0L,
        s"matchDistribution: target stratum '$s' has no rows")
    }
    // binding stratum: minimal n/w by exact cross-multiplication
    // (ties break to the smaller stratum name)
    val (sStar, wStar) = target.reduce[(String, Long)] {
      case (a @ (sa, wa), b @ (sb, wb)) =>
        val cmp = (BigInt(counts(sa)) * wb) compare (BigInt(counts(sb)) * wa)
        if (cmp < 0 || (cmp == 0 && sa <= sb)) a else b
    }
    val nStar = counts(sStar)
    target.foreach { case (s, w) =>
      require(BigInt(255) * wStar * counts(s) <= Long.MaxValue &&
        BigInt(256) * w * nStar <= Long.MaxValue,
        s"matchDistribution: keep rule overflows int64 for stratum '$s'")
    }
    val b = bucket(salt, col(keyCol)).cast(LongType)
    val keep = target.foldRight(lit(false): Column) { case ((s, w), rest) =>
      when(col(strataCol) === s,
        b * lit(wStar * counts(s)) < lit(256L * w * nStar)).otherwise(rest)
    }
    df.filter(keep)
  }

  /**
   * DSIR-style importance log-weights (Xie et al., "Data Selection for
   * Language Models via Importance Resampling", NeurIPS 2023): per
   * document, the log-likelihood ratio of its words under hashed-unigram
   * bag models of a TARGET slice vs the RAW corpus —
   *   logw(doc) = Σ_w ln( p_target(b(w)) / p_raw(b(w)) ),
   * where b(w) is the word's first-md5-byte feature bucket (0..255, the
   * [[bucket]] source) and both models are add-one smoothed over the 256
   * buckets. Documents resembling the target score high; resampling by
   * these weights (see q195: deterministic Gumbel-top-k on md5 noise)
   * shifts the raw corpus toward the target distribution — the paper's
   * recipe with its hashed n-gram features at n = 1.
   *
   * Determinism: each bucket's log-ratio term is rounded to 6 dp and
   * cast DECIMAL(18,6) BEFORE the per-doc sum (the BM25 pattern), so
   * logw is order-independent and engine-portable. All counts stay
   * int64; the ratio's factors stay < 2^53 (word counts × 256-bucket
   * smoothing), so the double product is exact.
   *
   * Scale shape: feature space is FIXED at 256 buckets regardless of
   * vocabulary (the paper's point: hashing bounds model state), so the
   * bucket-stats table is metadata-scale — one raw agg + one target agg
   * + a broadcast attach to the exploded words, one doc-keyed rollup.
   * Nothing vocab-sized or corpus-sized leaves the executors.
   *
   * Returns (idCol, n_words, logw); documents whose text has no words
   * (length ≥ 1) are absent. `isTarget` is any boolean expression over
   * the doc row (a lang flag, a source flag, a quality cut).
   */
  def dsirLogWeights(docs: DataFrame, idCol: String, textCol: String,
                     isTarget: Column, salt: String = "dsir"): DataFrame = {
    val words = docs
      .select(col(idCol), isTarget.as("graft_tgt"),
        explode(split(col(textCol), " ")).as("graft_w"))
      .filter(length(col("graft_w")) >= 1)
      .withColumn("graft_b", bucket(salt, col("graft_w")).cast(LongType))
    val raw = words.groupBy(col("graft_b"))
      .agg(count(lit(1)).as("graft_r"))
    val tgt = words.filter(col("graft_tgt"))
      .groupBy(col("graft_b")).agg(count(lit(1)).as("graft_t"))
    // full 0..255 bucket spine: buckets unseen in either slice still
    // carry their add-one smoothing mass
    val spine = docs.sparkSession.range(256).toDF("graft_b")
    val stats = spine
      .join(raw, Seq("graft_b"), "left")
      .join(tgt, Seq("graft_b"), "left")
      .select(col("graft_b"),
        coalesce(col("graft_r"), lit(0L)).as("graft_r"),
        coalesce(col("graft_t"), lit(0L)).as("graft_t"))
    val tot = stats.agg(sum(col("graft_r")).as("graft_rr"),
      sum(col("graft_t")).as("graft_tt"))
    val term = stats.crossJoin(broadcast(tot))
      .select(col("graft_b"),
        round(log(((col("graft_t") + lit(1.0)) * (col("graft_rr") + lit(256L))) /
            ((col("graft_r") + lit(1.0)) * (col("graft_tt") + lit(256L)))), 6)
          .cast(DecimalType(18, 6)).as("graft_term"))
    words.join(broadcast(term), "graft_b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("graft_term")).as("logw"))
  }

  /**
   * Perplexity-weighted mixture planning: turn per-document LM scores
   * (e.g. [[Relevance.interpolatedPerplexity]]'s output) into per-stratum
   * sampling weights — the quality-aware refinement of proportional
   * mixing that up-weights sources whose text the reference LM finds
   * predictable (the CCNet bucketing signal, Wenzek et al. 2020, turned
   * into mixture mass; DoReMi, Xie et al. 2023, learns these weights —
   * this is the static excess-quality heuristic a pipeline starts from).
   *
   * mass_s = n_tokens_s / mean_ppl_s (token share deflated by mean
   * perplexity), weight_s = mass_s / Σ mass — computed as
   * (n_tokens·n_docs)/sum_ppl in one double expression with a fixed
   * parenthesization, 6-dp-rounded into DECIMAL so the normalizing sum
   * is order-independent. Only SCORED documents (≥ 2 words — the
   * perplexity contract) contribute.
   *
   * Portability: `sum_ppl`/`mass`/`weight` inherit the upstream `ppl`
   * column's libm non-portability (see
   * [[Relevance.interpolatedPerplexity]]) and must stay off any
   * cross-engine hash. The PORTABLE surface is `n_docs`/`n_tokens`
   * (exact) plus `mass_q` = Σ sum_pq6 — the stratum's total quantized
   * predictability mass (each scored slot contributes its interpolated
   * probability in ppm, so predictable sources accrue more mass per
   * token — the same up-weighting direction as 1/ppl) — and
   * `weight_ppm` = ⌊10⁶·mass_q/Σ mass_q⌋, both exact-integer by
   * construction (DECIMAL(38,0) integral division, zero libm).
   *
   * Scale shape: one id-keyed join of the per-doc scores to the strata
   * map, a |strata|-key hash-agg, and a 1-row totals broadcast — the
   * corpus never shuffles beyond the doc-id join, and every division
   * happens on metadata-scale rows.
   */
  def perplexityMixtureWeights(pplDf: DataFrame, idCol: String,
                               strata: DataFrame,
                               strataCol: String): DataFrame = {
    val big = DecimalType(38, 0)
    val perStratum = pplDf
      .join(strata.select(col(idCol), col(strataCol)), idCol)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_scored")).as("n_tokens"),
        sum(col("sum_pq6")).as("mass_q"),
        sum(col("ppl").cast(DecimalType(18, 6))).as("sum_ppl"))
      .withColumn("mass",
        round((col("n_tokens").cast(DoubleType) *
          col("n_docs").cast(DoubleType)) /
          col("sum_ppl").cast(DoubleType), 6)
          .cast(DecimalType(18, 6)))
    val total = perStratum.agg(sum(col("mass")).as("graft_total"),
      sum(col("mass_q")).cast(big).as("graft_total_q"))
    perStratum.crossJoin(broadcast(total))
      .withColumn("graft_wnum",
        lit(1000000L).cast(big) * col("mass_q").cast(big))
      .select(col(strataCol), col("n_docs"), col("n_tokens"),
        col("mass_q"),
        expr("graft_wnum div graft_total_q").as("weight_ppm"),
        col("sum_ppl"), col("mass").cast(DoubleType).as("mass"),
        round(col("mass").cast(DoubleType) /
          col("graft_total").cast(DoubleType), 6).as("weight"))
  }

  /**
   * Epoch allocation under a token budget with a repetition cap — the
   * data-constrained scaling recipe (Muennighoff et al. 2023, "Scaling
   * Data-Constrained Language Models": repeating data beyond ~4 epochs
   * stops buying loss): split training budget `budgetTokens` equally
   * across strata, but no stratum may be consumed for more than
   * `maxEpochs` passes; budget a saturated (small) stratum cannot absorb
   * flows to the unsaturated ones. That is exact water-filling, and with
   * strata sorted by size ascending it has the classic closed form —
   * saturate a PREFIX, split the remainder equally — so the whole
   * computation is cumulative sums and one comparison per stratum, no
   * fixed-point loop:
   *
   *   saturated(j) ⟺ B − R·cum(j−1) ≥ R·tokens(j)·(n−j+1)
   *
   * (monotone along the ascending order, so the saturated set is the
   * prefix where it holds). All arithmetic is exact DECIMAL(38,0)
   * integer — allocations in whole tokens (floor), epochs in
   * milli-epochs via IntegralDivide — engine-portable by construction.
   *
   * Scale shape: the corpus collapses to |strata| rows BEFORE this
   * operator (callers aggregate token counts per source); the ordered
   * window here runs over that metadata-scale table — the
   * [[Selection.paretoFrontier]] precedent: a partition-less window is
   * fine when its input can never be corpus-sized. If all strata
   * saturate, leftover budget is reported unused (`alloc_tokens` sums
   * below B: the corpus is exhausted at R epochs — the paper's signal
   * to go get more data).
   *
   * Output per stratum: n_tokens, saturated, alloc_tokens,
   * epochs_milli (= ⌊1000·alloc/tokens⌋, capped at 1000·R).
   */
  def epochAllocation(tokensPerStratum: DataFrame, strataCol: String,
                      tokensCol: String, budgetTokens: Long,
                      maxEpochs: Int = 4): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens=$budgetTokens must be >= 0")
    require(maxEpochs >= 1, s"maxEpochs=$maxEpochs must be >= 1")
    val big = DecimalType(38, 0)
    val ord = Window.orderBy(col(tokensCol).asc, col(strataCol).asc)
    val n = Window.partitionBy(lit(1))
    val base = tokensPerStratum
      .select(col(strataCol), col(tokensCol).cast("long").as(tokensCol))
      .withColumn("graft_j", row_number().over(ord))
      .withColumn("graft_cum", sum(col(tokensCol)).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("graft_n", count(lit(1)).over(n))
      .withColumn("saturated",
        lit(budgetTokens).cast(big) -
          lit(maxEpochs).cast(big) *
            (col("graft_cum") - col(tokensCol)).cast(big) >=
          lit(maxEpochs).cast(big) * col(tokensCol).cast(big) *
            (col("graft_n") - col("graft_j") + 1).cast(big))
    // J = |saturated prefix|, usedJ = R·Σ tokens over it — two scalars
    // from the same metadata-scale frame, broadcast back
    val totals = base.agg(
      sum(when(col("saturated"), 1L).otherwise(0L)).as("graft_satn"),
      coalesce(sum(when(col("saturated"), col(tokensCol))), lit(0L))
        .as("graft_sattok"))
    base.crossJoin(broadcast(totals))
      .withColumn("graft_rem",
        lit(budgetTokens).cast(big) -
          lit(maxEpochs).cast(big) * col("graft_sattok").cast(big))
      .withColumn("alloc_tokens",
        when(col("saturated"),
          lit(maxEpochs).cast(big) * col(tokensCol).cast(big))
          .otherwise(expr("graft_rem div (graft_n - graft_satn)")
            .cast(big))
          .cast("long"))
      .withColumn("epochs_milli",
        expr(s"(1000 * alloc_tokens) div $tokensCol"))
      .select(col(strataCol), col(tokensCol).as("n_tokens"),
        col("saturated"), col("alloc_tokens"), col("epochs_milli"))
  }

  /**
   * Competence-based curriculum admission (Platanios et al. NAACL 2019,
   * root pacing): with competence c(t) = √(c0² + t·(1−c0²)/T), a
   * document at difficulty percentile p = rank/n enters training at the
   * first step where c(t) ≥ p. The ASSIGNMENT needs no square root —
   * inverting the pacing squares it away:
   *
   *   t_admit = ⌈T·(p² − c0²)/(1 − c0²)⌉
   *           = ⌈T·(c0d²·r² − c0n²·n²) / ((c0d² − c0n²)·n²)⌉
   *
   * with c0 = c0n/c0d rational — EXACT DECIMAL(38,0) integer
   * arithmetic end to end (ceil via (a+b−1) div b), zero libm, so
   * every admit step is engine-portable and gate-hashable. Documents at
   * or below the initial competence (c0d²·r² ≤ c0n²·n²) train from
   * step 0.
   *
   * Scale shape: the difficulty rank is [[GlobalRank.globalRowNumber]]
   * (range shuffle + metadata offsets — no single-task window); n rides
   * a 1-row broadcast; the step arithmetic is one narrow codegen'd
   * projection.
   */
  def curriculumAdmission(df: DataFrame, idCol: String,
                          difficultyCol: String, totalSteps: Long,
                          c0Num: Long, c0Den: Long): DataFrame = {
    require(totalSteps >= 1, s"totalSteps=$totalSteps out of range")
    require(c0Den >= 1 && c0Num >= 0 && c0Num < c0Den,
      s"c0=$c0Num/$c0Den must lie in [0, 1)")
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val ranked = GlobalRank.globalRowNumber(
      df.select(col(idCol), col(difficultyCol)),
      Seq(col(difficultyCol).asc, col(idCol).asc), "graft_r")
    val n = ranked.agg(count(lit(1)).cast(big).as("graft_n"))
    val r = col("graft_r").cast(big)
    val c0n2 = lit(c0Num * c0Num).cast(big)
    val c0d2 = lit(c0Den * c0Den).cast(big)
    ranked.crossJoin(broadcast(n))
      .withColumn("graft_lhs", c0d2 * r * r)
      .withColumn("graft_rhs", c0n2 * col("graft_n") * col("graft_n"))
      .withColumn("graft_a",
        lit(totalSteps).cast(big) * (col("graft_lhs") - col("graft_rhs")))
      .withColumn("graft_b",
        (c0d2 - c0n2) * col("graft_n") * col("graft_n"))
      .select(col(idCol),
        col("graft_r").cast(org.apache.spark.sql.types.LongType)
          .as("difficulty_rank"),
        when(col("graft_lhs") <= col("graft_rhs"), 0L)
          .otherwise(expr("(graft_a + graft_b - 1) div graft_b"))
          .cast(org.apache.spark.sql.types.LongType).as("admit_step"))
  }

  /**
   * Priority sampling (Duffield, Lund & Thorup, JACM 2007): each item
   * draws a seedless uniform u from a 48-bit salted hash and gets
   * priority q = w/u; the k highest-priority items form the sample and
   * τ — the (k+1)-th priority — prices every kept item at its
   * Horvitz–Thompson weight ŵ = max(w, τ), making Σŵ an unbiased
   * subset-sum estimator with near-optimal variance (their Thm 1).
   * The weighted-sampling twin of [[weightedSample]]'s A-ES: same
   * deterministic-hash trick, but with a per-item price that supports
   * unbiased downstream aggregation.
   *
   * Portability: priorities are ordered by the double w·2^48/(h+1)
   * (identical correctly-rounded ops both engines, id tiebreak), but
   * every HASHED value is exact — w, the τ comparison by integer
   * cross-multiplication, ŵ as the exact rational (ht_num, ht_den),
   * and its half-away micro rounding ([[ExactRound]]).
   *
   * Shape: one narrow projection + a global top-(k+1) (TakeOrdered —
   * per-partition heaps, k is small) + a ≤(k+1)-row local window; τ
   * rides a 1-row broadcast. No driver collect.
   */
  def prioritySample(df: DataFrame, keyCol: String, weightCol: String,
                     salt: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val big = DecimalType(38, 0)
    val h48 = conv(
      substring(md5(concat_ws("_", lit(salt), col(keyCol))), 1, 12), 16, 10)
      .cast(LongType)
    // the priority numerator w·2^48 and the τ cross-multiplication run
    // in DECIMAL(38,0): in LongType any w ≥ 2^15 silently wraps under
    // non-ANSI semantics, corrupting priorities and HT prices with no
    // error. Ordering still uses the double quotient (same value).
    val base = df.select(col(keyCol), col(weightCol).cast(LongType).as("w"),
        h48.as("graft_h"))
      .withColumn("graft_qn",
        col("w").cast(big) * lit(281474976710656L).cast(big))
      .withColumn("graft_qd", col("graft_h") + lit(1L))
      .withColumn("graft_q", col("graft_qn").cast(DoubleType) /
        col("graft_qd").cast(DoubleType))
    val top = base.orderBy(col("graft_q").desc, col(keyCol).asc)
      .limit(k + 1)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("graft_q").desc, col(keyCol).asc)).cast(LongType))
      .localCheckpoint(eager = false)
    val tau = top.filter(col("rn") === (k + 1))
      .select(col("graft_qn").as("graft_tn"), col("graft_qd").as("graft_td"))
    val kept = top.filter(col("rn") <= k)
      .join(broadcast(tau), lit(true), "left")
    val keepOwn = col("graft_tn").isNull ||
      col("w").cast(big) * col("graft_td").cast(big) >= col("graft_tn")
    // ht_num ≤ w·2^48 — reported as BIGINT (the r11 wide-decimal gate
    // rule); a value past int64 nulls on the cast instead of wrapping
    val htNum = when(keepOwn, col("w").cast(big))
      .otherwise(col("graft_tn"))
    val htDen = when(keepOwn, lit(1L)).otherwise(col("graft_td"))
    kept.select(col(keyCol), col("w"), col("rn"),
      htNum.cast(LongType).as("ht_num"), htDen.as("ht_den"),
      ExactRound.halfAwayDiv(
        htNum * lit(1000000L).cast(big), htDen).as("ht_micro"))
  }

  /**
   * Iterative proportional fitting / raking (Deming & Stephan 1940; the
   * survey-statistics standard for matching a sample to target
   * marginals): reweight the (rowVar, colVar) contingency table so that
   * BOTH marginal weighted sums hit uniform targets — here the corpus
   * balancing step "equal mass per language AND per source" that a
   * single-axis mixer ([[uniformMix]]) cannot do.
   *
   * Fixed-point determinism: weights live in exact integer ppm; each
   * half-round rescales by the exact rational factor
   * N·10⁶ / (|axis|·S_axis) through [[ExactRound.halfAwayDiv]]
   * (DECIMAL(38,0)) — no floats, so the gate hashes exact integers and
   * both engines agree bit-for-bit after any number of rounds.
   *
   * Scale shape: ONE corpus pass builds the |rows|×|cols| contingency
   * table (map-side combinable); every IPF round then runs on that
   * metadata-scale table (axis aggs + a broadcast factor join). The
   * final per-cell weight joins back to data BY KEY when a caller
   * materializes the reweighted corpus.
   */
  def ipfRake(df: DataFrame, rowVar: String, colVar: String,
              sweeps: Int): DataFrame = {
    require(sweeps >= 1 && sweeps <= 8, s"sweeps=$sweeps out of range")
    val big = DecimalType(38, 0)
    var cells = df.groupBy(col(rowVar), col(colVar))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_ppm", lit(1000000L))
      .localCheckpoint(eager = false)
    val totals = cells.agg(sum(col("n_docs")).as("graft_nn"),
      countDistinct(col(rowVar)).as("graft_nr"),
      countDistinct(col(colVar)).as("graft_nc"))
    def halfRound(cur: DataFrame, axis: String, axisSize: Column) = {
      val sums = cur.groupBy(col(axis))
        .agg(sum(col("n_docs").cast(big) * col("w_ppm").cast(big))
          .as("graft_s"))
      cur.join(broadcast(sums), Seq(axis))
        .crossJoin(broadcast(totals))
        .select(col(rowVar), col(colVar), col("n_docs"),
          ExactRound.halfAwayDiv(
            col("w_ppm").cast(big) * col("graft_nn").cast(big) *
              lit(1000000L).cast(big),
            (axisSize.cast(big) * col("graft_s")).cast(big)).as("w_ppm"))
        .localCheckpoint(eager = false)
    }
    for (_ <- 1 to sweeps) {
      cells = halfRound(cells, rowVar, col("graft_nr"))
      cells = halfRound(cells, colVar, col("graft_nc"))
    }
    cells.orderBy(col(rowVar), col(colVar))
  }

  /** Cumulative Poisson(1) CDF scaled to 2⁴⁸ and floored — SHARED
    * LITERALS between the Spark expression and the oracle SQL (the
    * portability contract: e⁻¹ is transcendental, so the thresholds
    * must be pinned constants, never recomputed through libm at
    * runtime). t(k) = ⌊2⁴⁸·P(X ≤ k)⌋ for X ~ Poisson(1), k = 0..8;
    * residual mass past k = 8 is < 1.2e-9 — weight clamps at 9. */
  private[graft] val poissonThresholds48: Seq[Long] = Seq(
    103548857136060L, 207097714272121L, 258872142840152L,
    276130285696162L, 280444821410164L, 281307728552965L,
    281451546410098L, 281472091818260L, 281474659994280L)

  /**
   * Hashed Poisson bootstrap confidence interval for a per-stratum mean
   * (the one-pass bootstrap of Chamandy et al., "Estimating Uncertainty
   * for Massive Data Streams", Google 2012; Owen & Eckles 2012 analyze
   * the Poisson approximation): each of `reps` replicates reweights
   * every row by an independent Poisson(1) count DRAWN DETERMINISTICALLY
   * from a salted 48-bit hash against pinned CDF thresholds — no RNG
   * state, any executor recomputes the same replicate, and resampling
   * the corpus never rescans it (all replicates ride ONE pass). The
   * spread of the replicate means is the sampling-uncertainty read a
   * point estimate hides: "is src A really longer-form than src B, or
   * is that 25-doc noise?"
   *
   * Hashed surface: exact integers only — the point-estimate mean and
   * the trimmed replicate order statistics (5%-trimmed low/high) are
   * [[ExactRound]] micro rationals; replicate means are exact rationals
   * before rounding; the Poisson draw is integer threshold comparisons.
   *
   * Scale shape: one narrow (stratum, key, value) projection fanned out
   * ×reps (a constant), one (stratum, replicate) map-side-combinable
   * agg → |strata|·reps rows, then a |strata|-key rollup whose
   * collect_list is bounded at reps elements (metadata). The corpus is
   * read once; nothing data-scale is sorted or collected.
   */
  def poissonBootstrapMean(df: DataFrame, keyCol: String,
                           strataCol: String, valueCol: String,
                           salt: String, reps: Int = 20): DataFrame = {
    require(reps >= 2 && reps <= 64, s"reps=$reps out of range (2..64)")
    val big = DecimalType(38, 0)
    val thresholds = array(poissonThresholds48.map(lit): _*)
    val rows = df.select(col(strataCol), col(keyCol).as("graft_k"),
        col(valueCol).cast(LongType).as("graft_v"))
      .withColumn("graft_r", explode(expr(s"sequence(0, ${reps - 1})")))
    val h48 = conv(substring(md5(concat_ws("_", lit(salt), col("graft_r"),
      col("graft_k"))), 1, 12), 16, 10).cast(LongType)
    val weighted = rows.withColumn("graft_w",
      size(filter(thresholds, t => h48 >= t)).cast(LongType))
    val repMeans = weighted.groupBy(col(strataCol), col("graft_r"))
      .agg(sum((col("graft_w") * col("graft_v")).cast(big)).as("graft_sv"),
        sum(col("graft_w")).as("graft_sw"))
      .select(col(strataCol),
        when(col("graft_sw") > 0, ExactRound.halfAwayDiv(
          col("graft_sv").cast(big) * lit(1000000L).cast(big),
          col("graft_sw"))).as("graft_m"))
    val point = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_rows"),
        ExactRound.halfAwayDiv(
          sum(col(valueCol).cast(LongType)).cast(big) *
            lit(1000000L).cast(big),
          count(lit(1))).as("mean_micro"))
    val trim = repMeans.groupBy(col(strataCol))
      .agg(sort_array(collect_list(col("graft_m"))).as("graft_ms"))
      // 5%-trimmed bounds: with m replicate means, lo = the
      // (⌊m/20⌋+1)-th smallest, hi = the (m−⌊m/20⌋)-th — at the
      // default reps=20 that is the 2nd and 19th order statistic.
      // `div`, not `/`: Column./ is ALWAYS double division in Spark
      .withColumn("graft_mn", size(col("graft_ms")))
      .withColumn("graft_tr", expr("graft_mn div 20").cast("int"))
      .select(col(strataCol),
        col("graft_mn").cast(LongType).as("n_reps"),
        element_at(col("graft_ms"), col("graft_tr") + 1)
          .as("boot_lo_micro"),
        element_at(col("graft_ms"), col("graft_mn") - col("graft_tr"))
          .as("boot_hi_micro"))
    point.join(trim, Seq(strataCol))
      .select(col(strataCol), col("n_rows"), col("mean_micro"),
        col("n_reps"), col("boot_lo_micro"), col("boot_hi_micro"))
      .orderBy(col(strataCol))
  }

  /**
   * Neyman optimal allocation (Neyman 1934; the Cochran-textbook
   * stratified-sampling design): split a sampling budget across strata
   * ∝ N_h·S_h — bigger AND more variable strata get more of the budget,
   * which minimizes the variance of the stratified mean for a fixed
   * total n. The design step that turns "sample 10k docs for human
   * eval" into per-language quotas that weight a noisy long-tail
   * language above an equally-sized uniform one.
   *
   * Determinism: N_h·S_h = √(N_h·Σv² − (Σv)²) exactly (population SD
   * times N_h collapses to one square root of an exact integer), and
   * √ is IEEE-correctly-rounded — identical doubles both engines; the
   * integer weight is its floor. The allocation itself is the
   * largest-remainder (Hamilton) method of [[proportionalQuota]] over
   * those integer weights — int64 div/mod, remainder ties by stratum
   * name. Degenerate all-zero-variance corpora fall back to equal-split
   * weights (weight 1 per stratum) rather than 0/0.
   *
   * Scale shape: ONE map-side-combinable moment agg (n, Σv, Σv²) keyed
   * by stratum; every allocation window runs over |strata| rows —
   * metadata. The corpus is touched once.
   */
  def neymanAllocation(df: DataFrame, strataCol: String, valueCol: String,
                       totalN: Long): DataFrame = {
    require(totalN >= 0, s"totalN must be non-negative: $totalN")
    val big = DecimalType(38, 0)
    val v = col(valueCol).cast(LongType)
    val moments = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(v.cast(big)).as("graft_s1"),
        sum((v * v).cast(big)).as("graft_s2"))
    val varNum = col("n_rows").cast(big) * col("graft_s2") -
      col("graft_s1") * col("graft_s1")
    val weighted = moments
      .withColumn("weight",
        floor(sqrt(varNum.cast(DoubleType))).cast(LongType))
      .localCheckpoint(eager = false)
    val allZero = weighted.agg(max(col("weight")).as("graft_wmax"))
    val wEff = weighted.crossJoin(broadcast(allZero))
      .withColumn("graft_w",
        when(col("graft_wmax") === 0L, lit(1L)).otherwise(col("weight")))
    val tot = wEff.agg(sum(col("graft_w")).as("graft_wt"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().orderBy(col("graft_rem").desc, col(strataCol).asc)
    // budget·weight runs in DECIMAL(38,0): the long product wraps for
    // weights past 2^63/totalN under non-ANSI semantics
    wEff.crossJoin(broadcast(tot))
      .withColumn("graft_base",
        call_function("div", lit(totalN).cast(big) * col("graft_w").cast(big),
          col("graft_wt").cast(big)))
      .withColumn("graft_rem",
        pmod(lit(totalN).cast(big) * col("graft_w").cast(big),
          col("graft_wt").cast(big)))
      .withColumn("graft_rk", row_number().over(wAll))
      .withColumn("graft_slots",
        lit(totalN) - sum(col("graft_base")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col(strataCol), col("n_rows"), col("weight"),
        (col("graft_base") +
          when(col("graft_rk") <= col("graft_slots"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /**
   * Deterministic train/val/test hash split: each row lands in the
   * bucket whose cumulative integer-percent band contains
   * h48(salt, key) mod 100 — the standard leakage-safe split rule
   * (split BY KEY, not by row position: the same document id lands in
   * the same split on every engine, every rerun, every shard layout,
   * so no eval example can drift into training between pipeline runs).
   * Percents must sum to 100; assignment is a narrow codegen'd
   * projection — zero shuffle, zero state.
   *
   * Known, intentional bias: pmod(h48, 100) over a 2⁴⁸ hash space is
   * not perfectly uniform — 100 ∤ 2⁴⁸, so 48 residues occur one extra
   * time in 2⁴⁸, a relative skew of ~4·10⁻¹³ (≲ 1 row per 2.4 trillion
   * per percent). That is the design: exact-integer determinism across
   * engines is worth infinitely more here than 13 decimal places of
   * uniformity. Do not "fix" this with rejection sampling or a wider
   * modulus — both break the cross-engine gate (q318's oracle computes
   * the identical pmod).
   */
  def hashSplit(df: DataFrame, keyCol: String, salt: String,
                splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100 &&
      splits.forall(_._2 > 0), s"split percents must be positive and " +
      s"sum to 100: $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"duplicate split names: $splits")
    val h48 = conv(
      substring(md5(concat_ws("_", lit(salt), col(keyCol))), 1, 12), 16, 10)
      .cast(LongType)
    val p = pmod(h48, lit(100L))
    val cums = splits.scanLeft(0)(_ + _._2).tail
    val assign = splits.zip(cums).init.foldRight(
      lit(splits.last._1): Column) { case (((name, _), cum), rest) =>
      when(p < cum, lit(name)).otherwise(rest)
    }
    df.withColumn("split", assign)
  }

  /**
   * Per-stratum balance audit of [[hashSplit]]: every (stratum, split)
   * cell with its exact count, observed share, target share, and the
   * signed deviation — the pre-training check that a hash split did not
   * leave a small language/domain underrepresented in validation (a
   * 100-doc stratum CAN land 0 val docs; this is where that surfaces,
   * not in a mid-training eval surprise). Shares are floor-ppm exact
   * integers; empty cells emit explicitly with n_rows = 0 (absence is
   * the finding — a join-dropped row would hide it).
   *
   * Scale shape: one narrow split projection + ONE (stratum, split)
   * map-side-combinable count agg; the cell grid re-spines against the
   * |strata|×|splits| frame (metadata broadcast).
   */
  def hashSplitAudit(df: DataFrame, keyCol: String, strataCol: String,
                     salt: String, splits: Seq[(String, Int)]): DataFrame = {
    val big = DecimalType(38, 0)
    // cells feeds both the grid join and the totals rollup — cut
    // lineage so the corpus agg runs once
    val cells = hashSplit(df, keyCol, salt, splits)
      .groupBy(col(strataCol), col("split"))
      .agg(count(lit(1)).as("graft_n"))
      .localCheckpoint(eager = false)
    val strata = df.select(col(strataCol)).distinct()
      .localCheckpoint(eager = false)
    val splitSpine = df.sparkSession
      .createDataFrame(splits.map(s => (s._1, s._2.toLong)))
      .toDF("split", "graft_pct")
    val spine = strata.crossJoin(broadcast(splitSpine))
    val totals = cells.groupBy(col(strataCol))
      .agg(sum(col("graft_n")).as("graft_tot"))
    spine
      .join(cells, Seq(strataCol, "split"), "left")
      .join(broadcast(totals), Seq(strataCol), "left")
      .na.fill(0L, Seq("graft_n"))
      .select(col(strataCol), col("split"),
        col("graft_n").as("n_rows"),
        expr("cast(graft_n * 1000000 as decimal(38,0)) div " +
          "cast(graft_tot as decimal(38,0))").cast(LongType)
          .as("share_ppm"),
        (col("graft_pct") * lit(10000L)).as("target_ppm"),
        (expr("cast(graft_n * 1000000 as decimal(38,0)) div " +
          "cast(graft_tot as decimal(38,0))").cast(LongType) -
          col("graft_pct") * lit(10000L)).as("dev_ppm"))
  }
}
