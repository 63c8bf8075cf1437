package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/**
 * Per-stratum z-score standardization and outlier flagging — the feature
 * normalization / anomaly-gate step: each value is re-expressed in
 * standard deviations from its stratum's mean, and |z| ≥ σ flags the
 * rows a quality pipeline quarantines.
 *
 * Determinism: the stratum moments come from 6-dp-decimal sums of the
 * value and its square (order-independent, engine-portable — the
 * project's float-sum rule), population variance = E[x²] − E[x]², and
 * the final z is rounded to 6 dp. Every arithmetic step is written
 * identically in the DuckDB oracle.
 *
 * Shape: one metadata-scale per-stratum moments aggregate broadcast back
 * onto the scan, then a narrow codegen'd projection. The corpus is never
 * shuffled.
 */
object Standardize {

  /** Appends `mean`, `std` (population), `z` (6 dp) and `is_outlier`
    * (|z| ≥ sigma) per row, computed within `strataCol`. */
  def zScores(df: DataFrame, valueCol: String, strataCol: String,
              sigma: Double = 3.0): DataFrame = {
    require(sigma > 0, s"sigma must be positive: $sigma")
    val v = col(valueCol).cast(DoubleType)
    val stats = df.groupBy(col(strataCol)).agg(
      count(lit(1)).as("graft_n"),
      sum(round(v, 6).cast(DecimalType(18, 6))).as("graft_s1"),
      sum(round(v * v, 6).cast(DecimalType(28, 6))).as("graft_s2"))
    val mean = col("graft_s1").cast(DoubleType) / col("graft_n")
    // clamp at zero: the 6-dp-rounded square sums can push E[x²]−E[x]²
    // marginally negative for near-constant small-magnitude strata, and
    // sqrt of a negative is NaN here but an ERROR in DuckDB — the clamp
    // keeps both engines on the zero-variance path (z = NULL, from
    // double division by zero) instead
    val variance = greatest(
      col("graft_s2").cast(DoubleType) / col("graft_n") - mean * mean,
      lit(0.0))
    df.join(broadcast(stats), Seq(strataCol))
      .withColumn("mean", round(mean, 6))
      .withColumn("std", round(sqrt(variance), 6))
      .withColumn("z", round((v - mean) / sqrt(variance), 6))
      .withColumn("is_outlier", abs(col("z")) >= sigma)
      .drop("graft_n", "graft_s1", "graft_s2")
  }

  /**
   * Per-stratum simple linear regression (OLS): slope and intercept of
   * y on x within each stratum — the per-group trend line ("does quality
   * fall with length, per language?"). The sufficient statistics
   * (n, Σx, Σy, Σxy, Σx²) are 6-dp-decimal sums — order-independent,
   * engine-portable, and mergeable across batches like every semigroup
   * aggregate here — and the closed forms are evaluated in one fixed
   * association. The intercept is derived from the ROUNDED slope so both
   * engines agree bit-for-bit. A degenerate stratum (zero x-variance)
   * yields NULL slope/intercept via double division by zero, same in
   * both engines.
   *
   * Shape: ONE map-side-combinable hash-agg over the corpus; the closed
   * forms run on strata rows (metadata scale).
   */
  def groupOls(df: DataFrame, xCol: String, yCol: String,
               strataCol: String): DataFrame = {
    val x = col(xCol).cast(DoubleType)
    val y = col(yCol).cast(DoubleType)
    val stats = df.groupBy(col(strataCol)).agg(
      count(lit(1)).as("n"),
      sum(round(x, 6).cast(DecimalType(28, 6))).as("graft_sx"),
      sum(round(y, 6).cast(DecimalType(28, 6))).as("graft_sy"),
      sum(round(x * y, 6).cast(DecimalType(28, 6))).as("graft_sxy"),
      sum(round(x * x, 6).cast(DecimalType(28, 6))).as("graft_sxx"))
    val n = col("n").cast(DoubleType)
    val sx = col("graft_sx").cast(DoubleType)
    val sy = col("graft_sy").cast(DoubleType)
    val sxy = col("graft_sxy").cast(DoubleType)
    val sxx = col("graft_sxx").cast(DoubleType)
    stats
      .withColumn("slope",
        round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6))
      .withColumn("intercept", round((sy - col("slope") * sx) / n, 6))
      .select(col(strataCol), col("n"), col("slope"), col("intercept"))
  }

  /**
   * Two-sample Kolmogorov–Smirnov drift statistic of an INTEGER column,
   * each group in `groups` against `baselineGroup`: D = max over the
   * value domain of |F_g(x) − F_b(x)| — the distribution-shift alarm
   * ("did this source's length distribution move vs the reference
   * crawl?") that a mean/variance check can't raise.
   *
   * Integer-exact: D's argmax is taken over |c_g·n_b − c_b·n_g| (cum
   * counts cross-multiplied — no float ECDFs to diverge on); the only
   * double is the final round(D_num / (n_g·n_b), 6). The argmax value
   * rides out through an int64 (dnum·2^20 + value) encode, so the
   * reported crossing point is deterministic under ties (largest |diff|,
   * then largest value). Int64 bound: dnum ≤ n_g·n_b, so n_g·n_b·2^20
   * must fit — the encode is safe only to n_g·n_b ≤ 2^43 (≈8.8·10¹²,
   * e.g. two ~3M-row groups); ENFORCED with an un-prunable raise_error
   * at runtime (non-ANSI arithmetic would otherwise wrap silently).
   * Beyond that, shift the value encode out. `valueCol` must be
   * nonnegative and < 2^20 (lengths, quantized scores — enforced).
   *
   * Scale shape: baseline rows fan out once per compared group via a
   * literal-array explode (|groups| is metadata-scale), then ONE
   * (group, value) hash-agg with map-side combine and per-GROUP windows
   * over distinct values — no global window, no sort of raw rows.
   */
  def ksDrift(df: DataFrame, valueCol: String, groupCol: String,
              baselineGroup: String, groups: Seq[String]): DataFrame = {
    require(groups.nonEmpty, "ksDrift: no comparison groups")
    require(!groups.contains(baselineGroup),
      "ksDrift: baseline cannot be compared with itself")
    val v = col(valueCol).cast(LongType)
    val guarded = when(v >= 0 && v < lit(1L << 20), v)
      .otherwise(raise_error(concat(lit(s"ksDrift: $valueCol out of "),
        lit("[0, 2^20): "), v.cast(StringType))))
    val target = df.filter(col(groupCol).isin(groups: _*))
      .select(col(groupCol).as("g"), guarded.as("v"),
        lit(1L).as("graft_kg"), lit(0L).as("graft_kb"))
    val base = df.filter(col(groupCol) === baselineGroup)
      .select(explode(array(groups.map(lit): _*)).as("g"), guarded.as("v"),
        lit(0L).as("graft_kg"), lit(1L).as("graft_kb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    val cum = target.unionByName(base)
      .groupBy(col("g"), col("v"))
      .agg(sum(col("graft_kg")).as("graft_kg"),
        sum(col("graft_kb")).as("graft_kb"))
      .withColumn("graft_cg", sum(col("graft_kg")).over(w))
      .withColumn("graft_cb", sum(col("graft_kb")).over(w))
      .withColumn("graft_ng", sum(col("graft_kg")).over(wAll))
      .withColumn("graft_nb", sum(col("graft_kb")).over(wAll))
    // strict: the maximal |c_g·n_b − c_b·n_g| equals n_g·n_b itself, so
    // allowing n_g·n_b == 2^43 would let the encode reach 2^63 exactly
    // and wrap under non-ANSI arithmetic
    val encGuarded = when(
      col("graft_ng") * col("graft_nb") < lit(1L << 43),
      abs(col("graft_cg") * col("graft_nb") -
        col("graft_cb") * col("graft_ng")) * lit(1L << 20) + col("v"))
      .otherwise(raise_error(concat(
        lit("ksDrift: n_g*n_b exceeds the 2^43 encode bound for group "),
        col("g"))))
    cum.select(col("g"), col("graft_ng"), col("graft_nb"),
        encGuarded.as("graft_enc"))
      .groupBy(col("g"))
      .agg(max(col("graft_enc")).as("graft_best"),
        max(col("graft_ng")).as("n_g"), max(col("graft_nb")).as("n_b"))
      .select(col("g"), col("n_g"), col("n_b"),
        pmod(col("graft_best"), lit(1L << 20)).as("ks_at_value"),
        round(call_function("div", col("graft_best"), lit(1L << 20))
          .cast(DoubleType) / (col("n_g") * col("n_b")).cast(DoubleType), 6)
          .as("ks_stat"))
  }

  /**
   * Per-stratum ROC AUC of an integer score against a binary label, by
   * the Mann–Whitney rank-sum identity with exact tie handling (average
   * ranks) — "does the quality score actually separate English from
   * non-English, per source?" evaluated without ever materializing an
   * ROC curve.
   *
   * Integer-exact: over the per-(stratum, value) counts, with B(v) =
   * items before v in score order, each positive at v has average rank
   * B + (c+1)/2 — so 2·Σ_pos ranks = Σ_v npos(v)·(2B(v) + c(v) + 1),
   * all int64, and AUC = (that − n₊(n₊+1)) / (2·n₊·n₋) with ONE final
   * double division. Single-class strata yield NULL (AUC undefined).
   *
   * Scale shape: one (stratum, value) hash-agg with map-side combine,
   * per-STRATUM windows over distinct values, one stratum rollup — no
   * global sort, no per-row ranks.
   */
  def groupAuc(df: DataFrame, scoreQCol: String, posCol: String,
               strataCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("graft_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val t2u = col("graft_t2u")
    val nPos = col("n_pos")
    val nNeg = col("n") - col("n_pos")
    df.select(col(strataCol), col(scoreQCol).cast(LongType).as("graft_v"),
        col(posCol).cast(LongType).as("graft_p"))
      .groupBy(col(strataCol), col("graft_v"))
      .agg(count(lit(1)).as("graft_n"), sum(col("graft_p")).as("graft_np"))
      .withColumn("graft_b",
        sum(col("graft_n")).over(w) - col("graft_n"))
      .groupBy(col(strataCol))
      .agg(sum(col("graft_np") *
          (col("graft_b") * 2 + col("graft_n") + 1)).as("graft_t2u"),
        sum(col("graft_n")).as("n"), sum(col("graft_np")).as("n_pos"))
      .select(col(strataCol), col("n"), nPos.as("n_pos"),
        when(nPos > 0 && nNeg > 0,
          round((t2u - nPos * (nPos + 1)).cast(DoubleType) /
            (nPos * nNeg * 2).cast(DoubleType), 6)).as("auc"))
  }

  /**
   * MAD-based robust outliers per stratum over an INTEGER-valued column:
   * median absolute deviation with the Hampel-style |x − med| > k·MAD
   * flag — the robust quarantine gate where mean/σ z-scores
   * ([[zScores]]) get dragged by the very outliers they hunt (MAD's
   * breakdown point is 50% vs 0% for σ).
   *
   * Both medians are LOWER medians — exact row_number selections at
   * position ⌈n/2⌉ in a total (value, id) order, no interpolation — so
   * with an integer value column EVERY quantity here is int64-exact:
   * no float rules, no rounding, engine-identical by construction.
   *
   * Shape: two stratum-keyed window passes (rank + count share one
   * partitioning each) and two metadata-scale median joins back; one
   * final hash-agg. No sort beyond the per-stratum windows.
   */
  def madOutliers(df: DataFrame, valueCol: String, idCol: String,
                  strataCol: String, k: Long = 3L): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val base = df.select(col(strataCol), col(idCol),
      col(valueCol).cast(LongType).as("graft_x"))
    def lowerMedian(in: DataFrame, vc: String, out: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(strataCol)).orderBy(col(vc), col(idCol))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(col(strataCol))
      in.withColumn("graft_rn", row_number().over(w))
        .withColumn("graft_np", count(lit(1)).over(wAll))
        .filter(col("graft_rn") ===
          call_function("div", col("graft_np") + 1, lit(2L)))
        .select(col(strataCol), col(vc).as(out))
    }
    val med = lowerMedian(base, "graft_x", "graft_med")
    val withDev = base.join(broadcast(med), Seq(strataCol))
      .withColumn("graft_dev", abs(col("graft_x") - col("graft_med")))
    val mad = lowerMedian(
      withDev.select(col(strataCol), col(idCol), col("graft_dev")),
      "graft_dev", "graft_mad")
    withDev.join(broadcast(mad), Seq(strataCol))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"),
        max(col("graft_med")).as("med"),
        max(col("graft_mad")).as("mad"),
        sum(when(col("graft_dev") > lit(k) * col("graft_mad"), 1L)
          .otherwise(0L)).cast(LongType).as("n_outliers"))
  }

  /**
   * Cohen's kappa per stratum (Cohen 1960): chance-corrected agreement
   * between two categorical labelings — the standard "is this classifier
   * actually better than its marginals" check for label pipelines and
   * annotator QA. κ = (p_o − p_e)/(1 − p_e) with p_o the observed
   * agreement rate and p_e = Σ_c marg_a(c)·marg_b(c)/n² the
   * agreement expected from the marginal distributions alone.
   *
   * Everything up to the final ratio is int64-exact: agreement and
   * marginal counts are hash-agg counts, p_e's numerator is
   * Σ marginal products (int64 — safe while n² · classes < 2^63), and
   * the two divisions + ratio are identical fixed-association double
   * ops in any engine, rounded to 6 dp. Degenerate strata (p_e = 1:
   * both labelings constant and equal) yield NULL, not 0/0.
   *
   * Shape: one (stratum, a, b) contingency agg — map-side combinable,
   * cardinality ≤ strata·classes² — then marginal re-aggs and a
   * metadata-scale equi-join per class; corpus rows are touched once.
   */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String,
                 strataCol: String): DataFrame = {
    val cells = df.groupBy(col(strataCol), col(aCol).as("graft_a"),
        col(bCol).as("graft_b"))
      .agg(count(lit(1)).as("graft_n"))
    val margA = cells.groupBy(col(strataCol), col("graft_a"))
      .agg(sum(col("graft_n")).as("graft_na"))
    val margB = cells.groupBy(col(strataCol), col("graft_b"))
      .agg(sum(col("graft_n")).as("graft_nb"))
    val totals = cells.groupBy(col(strataCol))
      .agg(sum(col("graft_n")).cast(LongType).as("n"),
        sum(when(col("graft_a") === col("graft_b"), col("graft_n"))
          .otherwise(0L)).cast(LongType).as("graft_agree"))
    val pe = margA.join(margB,
        margA(strataCol) === margB(strataCol) &&
          col("graft_a") === col("graft_b"))
      .groupBy(margA(strataCol).as(strataCol))
      .agg(sum(col("graft_na") * col("graft_nb")).cast(LongType)
        .as("graft_pe_num"))
    val po = col("graft_agree").cast(DoubleType) / col("n")
    // left join + coalesce: a stratum whose two labelings share NO class
    // has an EMPTY marginal-product join (p_e = 0), not a missing row
    val peR = coalesce(col("graft_pe_num"), lit(0L)).cast(DoubleType) /
      (col("n") * col("n")).cast(DoubleType)
    totals.join(pe, Seq(strataCol), "left")
      .select(col(strataCol), col("n"), col("graft_agree").as("n_agree"),
        round(po, 6).as("po"), round(peR, 6).as("pe"),
        when(peR < 1.0, round((po - peR) / (lit(1.0) - peR), 6))
          .as("kappa"))
  }

  /**
   * Spearman rank correlation between two numeric columns (Spearman
   * 1904): ρ = 1 − 6·Σd²/(n(n²−1)) over the rank difference d of each
   * row under the two orderings. The rank-agreement audit between two
   * quality signals ("does the classifier order documents the way
   * perplexity does?") that Pearson can't answer for non-linear
   * monotone relations. Ties are broken by `idCol` (both orderings are
   * total permutations — the deterministic tie-broken variant; with few
   * ties it converges to the average-rank definition), so `n` and
   * `sum_d2` are EXACT integers and the gate hashes them; ρ itself is
   * one IEEE division of exact decimals, deterministic on both engines.
   *
   * Scale shape: both rankings are [[GlobalRank.globalRowNumber]] —
   * range shuffle + metadata offsets, never a single-partition window;
   * the join back is id-keyed; the moment agg is one row.
   */
  def spearmanRho(df: DataFrame, idCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val big = DecimalType(38, 0)
    val rx = GlobalRank.globalRowNumber(df.select(col(idCol), col(xCol)),
        Seq(col(xCol).asc, col(idCol).asc), "graft_rx")
      .select(col(idCol), col("graft_rx").cast(LongType).as("graft_rx"))
    val ry = GlobalRank.globalRowNumber(df.select(col(idCol), col(yCol)),
        Seq(col(yCol).asc, col(idCol).asc), "graft_ry")
      .select(col(idCol), col("graft_ry").cast(LongType).as("graft_ry"))
    rx.join(ry, Seq(idCol))
      .select(((col("graft_rx") - col("graft_ry")) *
        (col("graft_rx") - col("graft_ry"))).as("graft_d2"))
      .agg(count(lit(1)).as("n"), sum(col("graft_d2")).as("sum_d2"))
      .select(col("n"), col("sum_d2"),
        when(col("n") > 1, round(lit(1.0) -
          (lit(6L).cast(big) * col("sum_d2").cast(big)).cast(DoubleType) /
            (col("n").cast(big) *
              (col("n").cast(big) * col("n").cast(big) - lit(1L).cast(big)))
              .cast(DoubleType), 6)).as("rho"))
  }

  /**
   * Kendall's τ_a rank correlation (Kendall 1938) as exact pair counts:
   * over all C(n,2) item pairs, concordant (both metrics order the pair
   * the same way), discordant (opposite), and the three tie classes —
   * with τ_a = (C − D)/C(n,2) reported in half-away micros. The
   * pair-level complement of [[spearmanRho]]: τ IS the probability a
   * random pair is ordered consistently (minus the inverse), so a
   * leaderboard consumer can read it directly as "how often do the two
   * scores agree on who's better", which ρ's squared-rank-distance
   * can't give. Ties are first-class here (reported, not broken), where
   * spearmanRho's contract tie-breaks by id.
   *
   * Scale contract: ITEM-scale input (models, sources, strata — the
   * self-join is C(n,2); this is the documented contract, like the
   * two-sample tests' bounded-metric contract), with everything exact
   * int64. The input is localCheckpointed once — its lineage is
   * typically a corpus-scale aggregate that must not run twice.
   */
  def kendallTauA(df: DataFrame, idCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val big = DecimalType(38, 0)
    val t = df.select(col(idCol).cast(StringType).as("graft_id"),
        col(xCol).cast(LongType).as("graft_x"),
        col(yCol).cast(LongType).as("graft_y"))
      // NULL id/x/y (or a failed Long cast) would count in
      // n_pairs/n_items but in NONE of the five pair classes, silently
      // deflating tau_a instead of erroring — drop such rows up front
      // (the cleanGames pattern) so concordant + discordant + ties
      // always partition n_pairs exactly.
      .filter(col("graft_id").isNotNull && col("graft_x").isNotNull &&
        col("graft_y").isNotNull)
      .localCheckpoint(eager = false) // self-join + the n_items agg
    val ax = col("a.graft_x"); val bx = col("b.graft_x")
    val ay = col("a.graft_y"); val by = col("b.graft_y")
    // ITEM-scale input by documented contract: broadcast one side so the
    // inequality self-join is a BroadcastNestedLoopJoin regardless of
    // upstream size estimates — without the hint, an input whose stats
    // Spark cannot estimate (e.g. a join of two fitted rating tables)
    // falls back to CartesianProduct with both sides shuffled.
    val pairs = t.as("a")
      .join(broadcast(t.as("b")), col("a.graft_id") < col("b.graft_id"))
      .agg(
        count(lit(1)).as("n_pairs"),
        coalesce(sum(when((ax < bx && ay < by) || (ax > bx && ay > by),
          1L).otherwise(0L)), lit(0L)).as("n_concordant"),
        coalesce(sum(when((ax < bx && ay > by) || (ax > bx && ay < by),
          1L).otherwise(0L)), lit(0L)).as("n_discordant"),
        coalesce(sum(when(ax === bx && ay =!= by, 1L).otherwise(0L)),
          lit(0L)).as("n_tied_x"),
        coalesce(sum(when(ay === by && ax =!= bx, 1L).otherwise(0L)),
          lit(0L)).as("n_tied_y"),
        coalesce(sum(when(ax === bx && ay === by, 1L).otherwise(0L)),
          lit(0L)).as("n_tied_both"))
    t.agg(count(lit(1)).as("n_items")).crossJoin(broadcast(pairs))
      .select(col("n_items"), col("n_pairs"), col("n_concordant"),
        col("n_discordant"), col("n_tied_x"), col("n_tied_y"),
        col("n_tied_both"),
        when(col("n_pairs") > 0, ExactRound.halfAwayDiv(
          ((col("n_concordant") - col("n_discordant")).cast(big) *
            lit(1000000L).cast(big)).cast(big),
          col("n_pairs").cast(big))).as("tau_a_micro"))
  }

  /**
   * Krippendorff's alpha, nominal data, complete ratings (Krippendorff
   * 1970; the content-analysis reliability standard that generalizes
   * Cohen's kappa to any number of raters): with n units, r raters per
   * unit, N = n·r total values, n_uc the count of category c inside
   * unit u and n_c the global category count,
   *
   *   D_o = 1 − Σ_u Σ_c n_uc(n_uc−1) / (n·r·(r−1))   (observed)
   *   D_e = 1 − Σ_c n_c(n_c−1) / (N(N−1))            (expected)
   *   α   = 1 − D_o/D_e = (b·c − a·d) / (b·c)
   *
   * with D_o = a/b, D_e = c/d as exact integer rationals — the hashed
   * surface is the exact numerator/denominator pair plus the half-away
   * micro rounding ([[ExactRound]]); no floating point anywhere.
   * Perfect expected agreement (D_e = 0: one global category) yields
   * NULL alpha, not 0/0.
   *
   * Shape: one (unit, category) hash-agg, one category re-agg, two
   * scalar 1-row frames cross-joined back — corpus rows touched once,
   * everything map-side combinable. Requires every unit to carry the
   * same rater count r (complete block design); r is taken from the
   * data and asserted per unit via a MAX=MIN check column.
   */
  def krippendorffAlpha(df: DataFrame, unitCol: String,
                        labelCol: String): DataFrame = {
    val big = DecimalType(38, 0)
    val uc = df.groupBy(col(unitCol), col(labelCol).as("graft_c"))
      .agg(count(lit(1)).as("graft_nuc"))
    val perUnit = uc.groupBy(col(unitCol))
      .agg(sum(col("graft_nuc")).as("graft_r"),
        sum(col("graft_nuc") * (col("graft_nuc") - 1)).as("graft_do_u"))
    val doAgg = perUnit.agg(
      count(lit(1)).as("n_units"),
      min(col("graft_r")).as("graft_rmin"),
      max(col("graft_r")).as("graft_rmax"),
      sum(col("graft_do_u")).as("graft_do_num0"))
    val cat = uc.groupBy(col("graft_c"))
      .agg(sum(col("graft_nuc")).as("graft_nc"))
    val deAgg = cat.agg(
      sum(col("graft_nc")).as("graft_nn"),
      sum(col("graft_nc") * (col("graft_nc") - 1)).as("graft_de_num0"))
    val r = col("graft_rmin")
    val b = col("n_units") * r * (r - 1)                // D_o denominator
    val d = col("graft_nn") * (col("graft_nn") - 1)     // D_e denominator
    val a = b - col("graft_do_num0")                    // D_o numerator
    val c = d - col("graft_de_num0")                    // D_e numerator
    // D_o/D_e rationals are computed in DECIMAL(38,0) but REPORTED as
    // BIGINT — the r11 gate rule: no hashed output column wider than
    // DECIMAL(18). The rationals are O(n_units·r²) and O(n_labels²), so
    // they fit int64 through ~10⁹ labels; past that the cast nulls
    // (non-ANSI) rather than silently wrapping.
    doAgg.crossJoin(deAgg)
      .select(col("n_units"), r.as("n_raters"),
        (col("graft_rmax") === col("graft_rmin")).as("complete"),
        a.cast(big).cast(LongType).as("do_num"),
        b.cast(big).cast(LongType).as("do_den"),
        c.cast(big).cast(LongType).as("de_num"),
        d.cast(big).cast(LongType).as("de_den"),
        when(c =!= 0, ExactRound.halfAwayDiv(
          ((b.cast(big) * c.cast(big) - a.cast(big) * d.cast(big)) *
            lit(1000000L)).cast(big),
          (b.cast(big) * c.cast(big)).cast(big))).as("alpha_micro"))
  }

  /**
   * Fleiss' kappa, nominal data, fixed rater count (Fleiss 1971) — the
   * multi-rater generalization of Cohen's kappa (the gated pairwise
   * q164): with n units each rated by exactly r raters into nominal
   * categories, n_uc the per-unit category counts and n_c the global
   * counts (N = n·r),
   *
   *   P̄  = (Σ_u Σ_c n_uc² − N) / (n·r(r−1))     observed agreement
   *   P̄e = Σ_c (n_c/N)² = Σ_c n_c² / N²          chance agreement
   *   κ  = (P̄ − P̄e)/(1 − P̄e)
   *
   * The LLM-eval use: r judges label the same prompts — κ near 0 means
   * the "ground truth" is judge noise, and no leaderboard built on the
   * labels survives re-judging. Differs from [[krippendorffAlpha]] in
   * the chance model (α's is sampled-without-replacement from the
   * pooled values; Fleiss' is independent raters with the marginal
   * category distribution) — the two are the standard cross-check pair.
   *
   * Exactness: with A = Σ n_uc² − N, B = n·r(r−1), C = Σ n_c², D = N²,
   * κ = (A·D − C·B) / (B·(D − C)) — one exact integer rational; P̄/P̄e/κ
   * are half-away micros over DECIMAL(38,0) products (safe through
   * ~10⁹ units at r ≤ 30). One global category ⇒ D = C ⇒ NULL kappa
   * (never 0/0). `complete` flags the fixed-r precondition (min = max
   * observed rater count); κ is computed with r = min.
   *
   * Scale shape: one (unit, category) hash-agg over the ratings, one
   * unit-keyed and one category-keyed re-agg, two 1-row frames
   * cross-joined — corpus touched once, all map-side combinable.
   */
  def fleissKappa(df: DataFrame, unitCol: String,
                  labelCol: String): DataFrame = {
    val big = DecimalType(38, 0)
    val uc = df.groupBy(col(unitCol), col(labelCol).as("graft_c"))
      .agg(count(lit(1)).as("graft_nuc"))
    val perUnit = uc.groupBy(col(unitCol))
      .agg(sum(col("graft_nuc")).as("graft_r"),
        sum(col("graft_nuc") * col("graft_nuc")).as("graft_sq"))
    val unitAgg = perUnit.agg(
      count(lit(1)).as("n_units"),
      min(col("graft_r")).as("graft_rmin"),
      max(col("graft_r")).as("graft_rmax"),
      sum(col("graft_sq")).as("graft_sqsum"))
    val catAgg = uc.groupBy(col("graft_c"))
      .agg(sum(col("graft_nuc")).as("graft_nc"))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("graft_nc").cast(big) * col("graft_nc").cast(big))
          .as("graft_csum"))
    val r = col("graft_rmin")
    val nTot = (col("n_units") * r).cast(big)            // N = n·r
    val aNum = col("graft_sqsum").cast(big) - nTot       // A
    val bDen = (col("n_units") * r * (r - 1)).cast(big)  // B
    val cSum = col("graft_csum").cast(big)               // C
    val dDen = (nTot * nTot).cast(big)                   // D
    // r = 1 has no within-unit pairs: P̄'s denominator is 0 — report
    // NULL agreement (visible), never a 0-division that one engine
    // NULLs and the other errors on
    unitAgg.crossJoin(catAgg)
      .select(col("n_units"), r.as("n_raters"), col("n_categories"),
        (col("graft_rmax") === col("graft_rmin")).as("complete"),
        when(r > 1, ExactRound.halfAwayDiv(
          (aNum * lit(1000000L).cast(big)).cast(big), bDen))
          .as("p_bar_micro"),
        ExactRound.halfAwayDiv((cSum * lit(1000000L).cast(big)).cast(big),
          dDen).as("p_e_micro"),
        when(r > 1 && dDen =!= cSum, ExactRound.halfAwayDiv(
          ((aNum * dDen - cSum * bDen) * lit(1000000L).cast(big))
            .cast(big),
          (bDen * (dDen - cSum)).cast(big))).as("kappa_micro"))
  }

  /**
   * Gwet's AC1 (Gwet, Brit. J. Math. Stat. Psych. 2008) — the
   * chance-corrected multi-rater agreement statistic that survives the
   * KAPPA PARADOX: on a skewed label distribution (one category
   * dominating, the usual shape of LLM-judge verdicts) Fleiss' κ can go
   * NEGATIVE while raters agree on nearly every unit, because κ's
   * chance model charges the marginal imbalance to the raters. AC1's
   * chance model P̄e = Σ_c π_c(1−π_c)/(C−1) instead asks how often
   * RANDOM raters would agree on a randomly-chosen category, so
   * near-universal agreement scores near 1 regardless of skew. Run it
   * NEXT TO [[fleissKappa]] (same input shape): κ ≪ AC1 is the
   * signature of marginal skew, not of unreliable judges.
   *
   * Exactness: with A = Σ n_uc² − N, B = n·r(r−1), C = Σ n_c², D = N²,
   * K = |categories|: P̄ = A/B, P̄e = (D − C)/((K−1)·D), and
   * AC1 = (A·(K−1)·D − B·(D−C)) / (B·((K−2)·D + C)) — one exact signed
   * integer rational over DECIMAL(38,0) products. The headroom is
   * TIGHTER than [[fleissKappa]]'s ~10⁹-unit bound: AC1's numerator
   * carries an extra (K−1)·D = (K−1)·n²r² factor, so the half-away
   * divide holds 2·(K−1)·n³r⁴·10⁶, which caps n at ~1.8·10⁸ units for
   * r ≤ 30, K = 2 (shrinking ∛(K−1)-fold with more categories; at
   * n = 10⁹, r = 30 the product is ~10³⁹ and the non-ANSI decimal
   * overflow would NULL the verdict). Guards: r = 1 ⇒ P̄ and
   * AC1 NULL (no within-unit pairs); K = 1 ⇒ P̄e and AC1 NULL (chance
   * agreement undefined on one category — never 0/0). κ is computed
   * with r = min; `complete` flags the fixed-r precondition.
   *
   * Scale shape: identical to [[fleissKappa]] — one (unit, category)
   * hash-agg, one unit-keyed and one category-keyed re-agg, two 1-row
   * frames cross-joined; the corpus is touched once.
   */
  def gwetAC1(df: DataFrame, unitCol: String,
              labelCol: String): DataFrame = {
    val big = DecimalType(38, 0)
    val uc = df.groupBy(col(unitCol), col(labelCol).as("graft_c"))
      .agg(count(lit(1)).as("graft_nuc"))
    val perUnit = uc.groupBy(col(unitCol))
      .agg(sum(col("graft_nuc")).as("graft_r"),
        sum(col("graft_nuc") * col("graft_nuc")).as("graft_sq"))
    val unitAgg = perUnit.agg(
      count(lit(1)).as("n_units"),
      min(col("graft_r")).as("graft_rmin"),
      max(col("graft_r")).as("graft_rmax"),
      sum(col("graft_sq")).as("graft_sqsum"))
    val catAgg = uc.groupBy(col("graft_c"))
      .agg(sum(col("graft_nuc")).as("graft_nc"))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("graft_nc").cast(big) * col("graft_nc").cast(big))
          .as("graft_csum"))
    val r = col("graft_rmin")
    val k = col("n_categories")
    val nTot = (col("n_units") * r).cast(big)            // N = n·r
    val aNum = col("graft_sqsum").cast(big) - nTot       // A
    val bDen = (col("n_units") * r * (r - 1)).cast(big)  // B
    val cSum = col("graft_csum").cast(big)               // C
    val dDen = (nTot * nTot).cast(big)                   // D
    unitAgg.crossJoin(catAgg)
      .select(col("n_units"), r.as("n_raters"), col("n_categories"),
        (col("graft_rmax") === col("graft_rmin")).as("complete"),
        when(r > 1, ExactRound.halfAwayDiv(
          (aNum * lit(1000000L).cast(big)).cast(big), bDen))
          .as("p_bar_micro"),
        when(k > 1, ExactRound.halfAwayDiv(
          ((dDen - cSum) * lit(1000000L).cast(big)).cast(big),
          ((k - 1).cast(big) * dDen).cast(big))).as("p_e_ac1_micro"),
        when(r > 1 && k > 1, ExactRound.halfAwayDiv(
          ((aNum * (k - 1).cast(big) * dDen - bDen * (dDen - cSum)) *
            lit(1000000L).cast(big)).cast(big),
          (bDen * ((k - 2).cast(big) * dDen + cSum)).cast(big)))
          .as("ac1_micro"))
  }

  /**
   * Krippendorff's alpha with the INTERVAL metric (Krippendorff 1970,
   * §metric differences) — the ordinal/graded-rating reliability
   * statistic [[krippendorffAlpha]]'s nominal metric cannot express:
   * nominal α charges "4 vs 5" and "1 vs 5" identically, but on Likert
   * rating scales (the universal LLM-judge output shape) disagreeing by
   * one notch and disagreeing across the whole scale are different
   * findings. Interval δ(c,k) = (x_c − x_k)² weighs each disagreement
   * by its squared distance on the integer-coded scale.
   *
   * Exactness: with fixed r (complete design; computed with r = min
   * and flagged by `complete`, the [[krippendorffAlpha]] contract),
   *   DO = Σ_u Σ_{c≠k} n_uc·n_uk·(x_c−x_k)²   (ordered pairs)
   *   DE = Σ_{c≠k} n_c·n_k·(x_c−x_k)²
   *   α  = ((r−1)·DE − (N−1)·DO) / ((r−1)·DE),  N = n·r
   * — one exact signed integer rational; DO/DE are REPORTED as the
   * exact int64 scaled surfaces. Value codes must be integers; the
   * int64 bound on the reported surfaces is n·r²·range² (10⁹ units at
   * r ≤ 3 and range ≤ 10⁴ fits). Guards: r = 1 ⇒ NULL (no within-unit
   * pairs); DE = 0 (every rating the same value) ⇒ NULL, never 0/0.
   *
   * Scale shape: one (unit, value) hash-agg, a unit-keyed self-join
   * with ≤ C² fan-out per unit (C = distinct values, metadata by the
   * rating-scale contract), one value-keyed re-agg, 1-row frames
   * cross-joined. Corpus touched once.
   */
  def krippendorffAlphaInterval(df: DataFrame, unitCol: String,
                                valueCol: String): DataFrame = {
    val big = DecimalType(38, 0)
    val uv = df.groupBy(col(unitCol),
        col(valueCol).cast(LongType).as("graft_v"))
      .agg(count(lit(1)).as("graft_n"))
    val perUnit = uv.groupBy(col(unitCol))
      .agg(sum(col("graft_n")).as("graft_r"))
    val unitAgg = perUnit.agg(
      count(lit(1)).as("n_units"),
      min(col("graft_r")).as("graft_rmin"),
      max(col("graft_r")).as("graft_rmax"))
    val doAgg = uv.as("a")
      .join(uv.as("b"), Seq(unitCol))
      .filter(col("a.graft_v") =!= col("b.graft_v"))
      .select((col("a.graft_n").cast(big) * col("b.graft_n").cast(big) *
        (col("a.graft_v") - col("b.graft_v")).cast(big) *
        (col("a.graft_v") - col("b.graft_v")).cast(big)).as("graft_t"))
      .agg(coalesce(sum(col("graft_t")), lit(0L).cast(big))
        .as("graft_do"))
    val marg = uv.groupBy(col("graft_v"))
      .agg(sum(col("graft_n")).as("graft_nc"))
      .localCheckpoint(eager = false) // self-joined + re-aggregated
    // inequality-only self-join over the C-row marginal table: broadcast
    // EXPLICITLY (the kendallTauA lesson — Spark can't size-estimate an
    // aggregated side and would fall back to CartesianProduct)
    val deAgg = marg.as("a")
      .join(broadcast(marg.as("b")),
        col("a.graft_v") =!= col("b.graft_v"))
      .select((col("a.graft_nc").cast(big) * col("b.graft_nc").cast(big) *
        (col("a.graft_v") - col("b.graft_v")).cast(big) *
        (col("a.graft_v") - col("b.graft_v")).cast(big)).as("graft_t"))
      .agg(coalesce(sum(col("graft_t")), lit(0L).cast(big))
        .as("graft_de"))
    val catAgg = marg.agg(count(lit(1)).as("n_categories"),
      sum(col("graft_nc")).as("graft_nn"))
    val r = col("graft_rmin")
    val nTot = col("graft_nn").cast(big)                 // N = n·r
    unitAgg.crossJoin(doAgg).crossJoin(deAgg).crossJoin(catAgg)
      .select(col("n_units"), r.as("n_raters"), col("n_categories"),
        (col("graft_rmax") === col("graft_rmin")).as("complete"),
        col("graft_do").cast(LongType).as("do_scaled"),
        col("graft_de").cast(LongType).as("de_scaled"),
        when(r > 1 && col("graft_de") =!= 0, ExactRound.halfAwayDiv(
          (((r - 1).cast(big) * col("graft_de") -
            (nTot - 1) * col("graft_do")) *
            lit(1000000L).cast(big)).cast(big),
          ((r - 1).cast(big) * col("graft_de")).cast(big)))
          .as("alpha_micro"))
  }

  /** The shared two-sample scaffold behind [[mannWhitneyU]] and
    * [[ksTwoSample]]: collapse both samples to ONE row per distinct
    * value with per-group counts and running cumulative counts. The
    * corpus is touched once (a (value, group) hash-agg); the window
    * runs UNPARTITIONED but over the |distinct values|-row table only —
    * metadata-scale when the metric is a bounded integer (lengths,
    * scores, bucket ids), which is the operator's documented contract. */
  private def twoSampleValueTable(df: DataFrame, valueCol: String,
                                  groupCol: String, groupA: String,
                                  groupB: String): DataFrame = {
    val byValue = df
      .filter(col(groupCol).isInCollection(Seq(groupA, groupB)))
      .groupBy(col(valueCol).cast(LongType).as("graft_v"))
      .agg(
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("graft_ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("graft_cb"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("graft_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    byValue
      .withColumn("graft_cuma", sum(col("graft_ca")).over(w))
      .withColumn("graft_cumb", sum(col("graft_cb")).over(w))
  }

  /**
   * Mann–Whitney U / two-sample rank statistic (Mann & Whitney 1947),
   * reported with its exact AUC interpretation: U_A counts (a, b) pairs
   * with a > b, ties at ½ — and U_A/(n_A·n_B) is literally P(A > B)
   * plus half the tie mass, the common-language effect size / ROC-AUC
   * between the two samples. The distribution-free "is source A's
   * metric stochastically larger than source B's" answer that a mean
   * comparison (q249's W1) cannot give under heavy tails.
   *
   * Exactness: everything is counts. Doubling clears the half-ties:
   * u2_a = Σ_v ca(v)·(2·cumb(v−) + cb(v)) is the EXACT 2·U_A integer,
   * and auc_micro = half-away(u2_a·10⁶ / (2·n_a·n_b)). No rank midpoint
   * ever materializes as a fraction.
   *
   * Scale shape: one (value, group) hash-agg collapses the corpus; the
   * cumulative window runs on the |distinct values|-row table (the
   * contract: a bounded integer metric — doc lengths, scores). One
   * final 1-row aggregate. Corpus rows are touched exactly once.
   */
  def mannWhitneyU(df: DataFrame, valueCol: String, groupCol: String,
                   groupA: String, groupB: String): DataFrame = {
    val vt = twoSampleValueTable(df, valueCol, groupCol, groupA, groupB)
    val big = DecimalType(38, 0)
    // u2_a ≈ 2·n_a·n_b: a LongType sum would silently WRAP under
    // non-ANSI Spark once n_a·n_b reaches ~2^62 (~2.1e9 rows per side) —
    // accumulate every term in DECIMAL(38,0) and cast the REPORTED
    // column to BIGINT, so a genuine int64 overflow surfaces as a NULL
    // instead of a plausible wrong integer (the r12 prioritySample /
    // neymanAllocation pattern)
    vt.agg(
        sum(col("graft_ca")).as("n_a"),
        sum(col("graft_cb")).as("n_b"),
        sum(col("graft_ca").cast(big) *
          (lit(2L) * (col("graft_cumb") - col("graft_cb")) +
            col("graft_cb")).cast(big)).cast(big).as("graft_u2"))
      .select(col("n_a"), col("n_b"),
        col("graft_u2").cast(LongType).as("u2_a"),
        when(col("n_a") > 0 && col("n_b") > 0, ExactRound.halfAwayDiv(
          col("graft_u2") * lit(1000000L).cast(big),
          (lit(2L).cast(big) * col("n_a").cast(big) *
            col("n_b").cast(big)).cast(big))).as("auc_micro"))
  }

  /**
   * Two-sample Kolmogorov–Smirnov statistic D = sup_v |F_A(v) − F_B(v)|
   * (Smirnov 1939) as an EXACT integer rational: at every distinct
   * value, |cumA·n_B − cumB·n_A| is an integer and D = max over values
   * of that numerator over the constant n_A·n_B. The whole-distribution
   * drift test that complements q188's chi² (categorical) and q249's W1
   * (mean shift): KS sees shape changes a mean can hide, with a
   * distribution-free null.
   *
   * Hashed surface: n_a, n_b, the exact (d_num, d_den) pair and the
   * half-away micro — no floating point anywhere. Scale shape: same as
   * [[mannWhitneyU]] (one corpus hash-agg + the metadata-scale value
   * table + one 1-row aggregate).
   */
  def ksTwoSample(df: DataFrame, valueCol: String, groupCol: String,
                  groupA: String, groupB: String): DataFrame = {
    // two consumers (totals + the max scan) — cut lineage so the
    // corpus agg behind the value table runs once, not per branch
    val vt = twoSampleValueTable(df, valueCol, groupCol, groupA, groupB)
      .localCheckpoint(eager = false)
    val big = DecimalType(38, 0)
    val withTotals = vt
      .crossJoin(broadcast(vt.agg(sum(col("graft_ca")).as("graft_na"),
        sum(col("graft_cb")).as("graft_nb"))))
    withTotals
      .select(col("graft_na"), col("graft_nb"),
        abs(col("graft_cuma").cast(big) * col("graft_nb").cast(big) -
          col("graft_cumb").cast(big) * col("graft_na").cast(big))
          .as("graft_dn"))
      .groupBy(col("graft_na"), col("graft_nb"))
      .agg(max(col("graft_dn")).as("graft_dmax"))
      .select(col("graft_na").as("n_a"), col("graft_nb").as("n_b"),
        col("graft_dmax").cast(LongType).as("d_num"),
        (col("graft_na").cast(big) * col("graft_nb").cast(big))
          .cast(LongType).as("d_den"),
        when(col("graft_na") > 0 && col("graft_nb") > 0,
          ExactRound.halfAwayDiv(
            col("graft_dmax").cast(big) * lit(1000000L).cast(big),
            (col("graft_na").cast(big) * col("graft_nb").cast(big))
              .cast(big))).as("d_micro"))
  }
}
