package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Trained text classification over the corpus — the learned-from-data
 * complement to the fixed-weight linear apply
 * ([[TextAnalysis.linearQualityScore]] ships weights in; here the
 * weights come OUT of a labeled corpus pass). Everything is exact
 * integer arithmetic end to end, so predictions are engine-portable
 * and gate-hashable — no libm anywhere (the q200 rule applied to a
 * trained model).
 *
 * Reference behavior matched: the reference pipeline has no trained
 * classifier (its analytics are fixed SQL); this extends the §2.13
 * training-data-curation surface where a source/domain classifier is a
 * standard router stage.
 */
object Classify {

  /**
   * Nearest-centroid (Rocchio) text classifier, trained and applied in
   * two corpus passes (Rocchio 1971 relevance feedback; the
   * nearest-centroid formulation as in Manning, Raghavan & Schütze,
   * "Introduction to Information Retrieval" §14.2). Train: class
   * centroid = the SUMMED term-frequency vector of the class's
   * documents — one (term, label) hash-agg, exact BIGINT weights.
   * Apply: score(d, c) = ⟨tf_d, w_c⟩ / n_tokens_c — the dot product
   * against the length-normalized centroid, computed as the exact
   * integer `norm_score_q` = ⌊10¹²·dot/n_tokens_c⌋ (DECIMAL(38,0)
   * integral division), so the argmax (ties → label asc) is
   * deterministic and bit-identical across engines. Docs sharing no
   * term with any centroid score 0 everywhere and fall to the
   * alphabetically first label — reported via `n_hit_terms` so callers
   * can route "no evidence" rows separately.
   *
   * `labels` must be the distinct label values (metadata-scale — a
   * handful of sources/domains); passing them explicitly keeps the
   * apply plan free of a driver-side distinct-collect.
   *
   * Returns one row per document: (idCol, labelCol, predicted,
   * norm_score_q, n_hit_terms).
   *
   * Scale shape: training is ONE (term, label)-keyed hash-agg
   * (map-side combinable — same state bound as the df/tf aggs
   * everywhere else); the centroid table is vocabulary-scale and joins
   * the exploded doc terms BY TERM (shuffle keyed on term, the
   * inverted-index shape, never corpus×corpus). The per-(doc, label)
   * dot collapse and the |labels|-way argmax window both run on
   * ≤ |labels| rows per doc. Nothing is collected to the driver.
   */
  def nearestCentroid(docs: DataFrame, idCol: String, textCol: String,
                      labelCol: String, labels: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_q").desc, col("candidate").asc)
    centroidScores(docs, idCol, textCol, labelCol, labels)
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .select(col(idCol), col(labelCol),
        col("candidate").as("predicted"),
        col("score_q").as("norm_score_q"),
        col("n_hit_terms"))
  }

  /**
   * The full (document × candidate label) score grid behind
   * [[nearestCentroid]] — one row per (doc, label) with the exact
   * integer `score_q` = ⌊10¹²·dot/n_tokens_c⌋ and the matched-term
   * count. Exposed so downstream selection can reason about the WHOLE
   * score vector (uncertainty margins, rejection thresholds,
   * second-choice analysis), not just the argmax.
   *
   * Scale shape: as [[nearestCentroid]] — the grid is |docs|·|labels|
   * rows with |labels| bounded at 64, so it is a constant fan-out of
   * the corpus, never quadratic.
   */
  def centroidScores(docs: DataFrame, idCol: String, textCol: String,
                     labelCol: String, labels: Seq[String]): DataFrame = {
    require(labels.nonEmpty && labels.size <= 64,
      s"labels size ${labels.size} out of range [1, 64]")
    val big = DecimalType(38, 0)
    val tf = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("graft_t"))
      .groupBy(col(idCol), col("graft_t"))
      .agg(count(lit(1)).as("graft_tf"))
    val labeled = docs.select(col(idCol), col(labelCol))
    // centroids: per-(term, label) summed tf + per-label token totals
    val cent = tf.join(labeled, Seq(idCol))
      .groupBy(col("graft_t"), col(labelCol).as("candidate"))
      .agg(sum(col("graft_tf")).as("graft_w"))
    val classTokens = cent.groupBy(col("candidate"))
      .agg(sum(col("graft_w")).as("graft_n"))
    // dots: join doc terms to centroids BY TERM — inverted-index shape
    val dots = tf.join(cent, Seq("graft_t"))
      .groupBy(col(idCol), col("candidate"))
      .agg(sum(col("graft_tf") * col("graft_w")).as("graft_dot"),
        count(lit(1)).as("graft_hits"))
    // every (doc, label) row, zero-filled, normalized
    val labelFrame = docs.sparkSession
      .createDataFrame(labels.map(Tuple1(_))).toDF("candidate")
    docs.select(col(idCol), col(labelCol))
      .crossJoin(broadcast(labelFrame))
      .join(dots, Seq(idCol, "candidate"), "left")
      .join(broadcast(classTokens), Seq("candidate"))
      .withColumn("graft_num",
        coalesce(col("graft_dot"), lit(0L)).cast(big) *
          lit(1000000000000L).cast(big))
      // IntegralDivide (`div`), NOT decimal `/` — a (38,0) cast of a
      // fractional quotient would HALF_UP round where the oracle floors
      .withColumn("score_q",
        expr("graft_num div cast(graft_n as decimal(38,0))")
          .cast(LongType))
      .select(col(idCol), col(labelCol), col("candidate"), col("score_q"),
        coalesce(col("graft_hits"), lit(0L)).as("n_hit_terms"))
  }

  /**
   * Margin-based uncertainty sampling (Lewis & Gale SIGIR'94; the
   * smallest-margin active-learning criterion, Scheffer 2001): the `k`
   * documents whose top-1 vs top-2 centroid scores are closest — the
   * rows a labeling budget should be spent on, and the standard
   * data-selection signal for boundary examples. Margin = score_q(1st)
   * − score_q(2nd), exact integers from [[centroidScores]]; the k-cut
   * is TakeOrderedAndProject on (margin asc, id asc).
   *
   * Needs ≥ 2 candidate labels (a margin is undefined otherwise).
   */
  def uncertaintyMargin(docs: DataFrame, idCol: String, textCol: String,
                        labelCol: String, labels: Seq[String],
                        k: Int): DataFrame = {
    require(labels.size >= 2, "uncertaintyMargin needs >= 2 labels")
    require(k >= 1, s"k=$k out of range")
    val grid = centroidScores(docs, idCol, textCol, labelCol, labels)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_q").desc, col("candidate").asc)
    val ranked = grid.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") <= 2)
    val top1 = ranked.filter(col("graft_rn") === 1)
      .select(col(idCol), col(labelCol),
        col("candidate").as("predicted"), col("score_q").as("graft_s1"))
    val top2 = ranked.filter(col("graft_rn") === 2)
      .select(col(idCol), col("candidate").as("runner_up"),
        col("score_q").as("graft_s2"))
    top1.join(top2, Seq(idCol))
      .withColumn("margin_q", col("graft_s1") - col("graft_s2"))
      .select(col(idCol), col(labelCol), col("predicted"),
        col("runner_up"), col("margin_q"))
      .orderBy(col("margin_q").asc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Distributed linear-probe TRAINING by exact normal equations — the
   * train half of [[TextAnalysis.linearQualityScore]]'s apply: fit the
   * least-squares linear probability model
   * `ŷ = β₀ + β₁x₁ + β₂x₂` (two integer features + intercept) with
   * `β = (XᵀX)⁻¹Xᵀy`, solved in closed form by Cramer's rule. This is
   * how a quality/language probe is actually fit at corpus scale: ONE
   * pass aggregates the 9 sufficient statistics (all exact integer
   * sums, map-side combinable), and the 3×3 solve is constant work on
   * that single row. No SGD, no iterations, no shuffle beyond the agg.
   *
   * Determinism: every determinant is an exact DECIMAL(38,0) cofactor
   * expansion of integer sums (exact while entry products stay under
   * 10³⁸ — safe into the ~10¹²-doc range with bounded features; beyond
   * that, center the features first and the magnitudes collapse);
   * β and R² are fixed-shape double expressions over those exact
   * integers, rounded to 6 dp. A singular XᵀX (constant feature,
   * n < 3) yields NULL coefficients, never a 0/0.
   *
   * Returns ONE row: n, the exact determinant, β₀..β₂, and in-sample
   * R² — computed from the same sufficient statistics
   * (SSE = Σy² − βᵀXᵀy), so no second corpus pass.
   */
  /** The exact normal-equation sufficient statistics behind
    * [[linearProbeTrain]]: ONE map-side-combinable agg to the 10 integer
    * sums, plus the four DECIMAL(38,0) cofactor determinants
    * (`graft_det`, `graft_d0..d2`). Shared by the double-surface and
    * exact-integer-surface train variants. */
  private def probeNormalEq(df: DataFrame, yCol: String, x1Col: String,
                            x2Col: String): DataFrame = {
    val big = DecimalType(38, 0)
    def d(c: Column): Column = c.cast(big)
    val stats = df.select(col(yCol).cast(LongType).as("graft_y"),
        col(x1Col).cast(LongType).as("graft_x1"),
        col(x2Col).cast(LongType).as("graft_x2"))
      .agg(count(lit(1)).as("n"),
        sum(col("graft_x1")).as("s1"), sum(col("graft_x2")).as("s2"),
        sum(col("graft_x1") * col("graft_x1")).as("s11"),
        sum(col("graft_x1") * col("graft_x2")).as("s12"),
        sum(col("graft_x2") * col("graft_x2")).as("s22"),
        sum(col("graft_y")).as("sy"),
        sum(col("graft_x1") * col("graft_y")).as("s1y"),
        sum(col("graft_x2") * col("graft_y")).as("s2y"),
        sum(col("graft_y") * col("graft_y")).as("syy"))
    val n = d(col("n")); val s1 = d(col("s1")); val s2 = d(col("s2"))
    val s11 = d(col("s11")); val s12 = d(col("s12"))
    val s22 = d(col("s22")); val sy = d(col("sy"))
    val s1y = d(col("s1y")); val s2y = d(col("s2y"))
    val det = n * (s11 * s22 - s12 * s12) -
      s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) -
      s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) -
      sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) -
      s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)
    stats
      .withColumn("graft_det", det)
      .withColumn("graft_d0", det0)
      .withColumn("graft_d1", det1)
      .withColumn("graft_d2", det2)
  }

  def linearProbeTrain(df: DataFrame, yCol: String, x1Col: String,
                       x2Col: String): DataFrame = {
    val withDet = probeNormalEq(df, yCol, x1Col, x2Col)
    def beta(dc: String): Column =
      when(col("graft_det") =!= 0,
        round(col(dc).cast(DoubleType) /
          col("graft_det").cast(DoubleType), 6))
    val b0 = col("graft_d0").cast(DoubleType) / col("graft_det").cast(DoubleType)
    val b1 = col("graft_d1").cast(DoubleType) / col("graft_det").cast(DoubleType)
    val b2 = col("graft_d2").cast(DoubleType) / col("graft_det").cast(DoubleType)
    val sse = col("syy").cast(DoubleType) -
      (b0 * col("sy").cast(DoubleType) + b1 * col("s1y").cast(DoubleType) +
        b2 * col("s2y").cast(DoubleType))
    val sst = col("syy").cast(DoubleType) -
      col("sy").cast(DoubleType) * col("sy").cast(DoubleType) /
        col("n").cast(DoubleType)
    withDet.select(col("n"),
      col("graft_det").cast(DecimalType(38, 0)).as("det"),
      beta("graft_d0").as("beta0"), beta("graft_d1").as("beta1"),
      beta("graft_d2").as("beta2"),
      when(col("graft_det") =!= 0 && sst > 0.0,
        round(lit(1.0) - sse / sst, 6)).as("r2"))
  }

  /**
   * [[linearProbeTrain]] with a fully engine-portable EXACT-INTEGER
   * surface — the gate-hashable variant (the q200/q260 rule: no IEEE
   * double ever reaches a hashed column). Same single-pass sufficient
   * statistics and Cramer determinants; the reported model is
   *
   *  - `beta{i}_ppm` = sign · ⌊10⁶·|dᵢ| / |det|⌋ — the coefficient in
   *    exact parts-per-million, via DECIMAL(38,0) integral division of
   *    NON-NEGATIVE operands (so truncation is unambiguous floor in
   *    every engine; the sign is reapplied explicitly, pinning
   *    truncation-toward-zero without relying on either engine's
   *    negative-division convention);
   *  - `r2_ppm` — in-sample R² in exact parts-per-million: the rational
   *    R² = [n·(d₀·Sy + d₁·S1y + d₂·S2y) − det·Sy²] / [det·(n·Σy² − Sy²)]
   *    (the algebraic clearing of 1 − SSE/SST over the common
   *    denominators det and n) pushed through one half-away integral
   *    division of its ABSOLUTE parts — R² ∈ [0, 1], so the report is
   *    always ≤ 10⁶. The raw numerator/denominator pair was the r13
   *    sf0.1-audit finding: it grows ~n³·x⁴·y² and blew past int64 at a
   *    mere 600k rows — Spark's non-ANSI cast nulled while DuckDB's
   *    HUGEINT→BIGINT cast ERRORED, a genuine cross-engine divergence.
   *    A bounded ratio cannot outgrow its type at any corpus size.
   *
   * Singular XᵀX (det = 0) or zero label variance (SST ≤ 0) yields NULL
   * coefficients / R², matching [[linearProbeTrain]]. Exactness bound:
   * DECIMAL(38,0) holds the internal products through ~10⁹ docs with
   * bounded integer features; center features first beyond that.
   *
   * Output types: every reported column is BIGINT — internals stay
   * DECIMAL(38,0), but the FINAL values are narrowed so the gate's
   * hashed surface never carries a DECIMAL wider than 18 digits (the
   * r11 comparator class: wide-decimal outputs hash divergently across
   * engines even when values are equal).
   */
  def linearProbeTrainExact(df: DataFrame, yCol: String, x1Col: String,
                            x2Col: String): DataFrame = {
    val big = DecimalType(38, 0)
    val withDet = probeNormalEq(df, yCol, x1Col, x2Col)
    def d(c: String): Column = col(c).cast(big)
    def ppm(dc: String): Column = {
      val mag = expr(s"(cast(1000000 as decimal(38,0)) * abs($dc)) " +
        "div abs(graft_det)").cast(big)
      when(col("graft_det") =!= 0,
        when((col(dc) < 0) =!= (col("graft_det") < 0), -mag)
          .otherwise(mag))
    }
    val sstNum = d("n") * d("syy") - d("sy") * d("sy")
    val r2num = d("n") *
      (col("graft_d0") * d("sy") + col("graft_d1") * d("s1y") +
        col("graft_d2") * d("s2y")) -
      col("graft_det") * (d("sy") * d("sy"))
    val r2den = col("graft_det") * sstNum
    val ok = col("graft_det") =!= 0 && sstNum > 0
    withDet.select(col("n"),
      col("graft_det").cast(big).cast(LongType).as("det"),
      ppm("graft_d0").cast(LongType).as("beta0_ppm"),
      ppm("graft_d1").cast(LongType).as("beta1_ppm"),
      ppm("graft_d2").cast(LongType).as("beta2_ppm"),
      // R² ∈ [0,1]: |num|/|den| through ONE half-away division (the
      // rational's sign cancels — det appears in both) keeps the report
      // ≤ 10⁶ at any corpus size; the raw pair overflowed int64 at sf0.1
      when(ok, ExactRound.halfAwayDiv(
        (abs(r2num.cast(big)) * lit(1000000L).cast(big)).cast(big),
        abs(r2den.cast(big)).cast(big))).as("r2_ppm"))
  }

  /**
   * Train-then-evaluate the [[linearProbeTrain]] probe in one pipeline:
   * per stratum, the confusion matrix of `ŷ ≥ 0.5` against the true
   * binary label — the per-source reliability read a probe gets before
   * it's trusted as a filter. The trained β row (already 6-dp-rounded,
   * so the decision boundary is engine-portable) broadcasts onto a
   * second corpus pass; the confusion is ONE stratum-keyed map-side
   * agg. Two corpus scans total (sufficient statistics + scoring) —
   * the minimum for train-then-apply.
   */
  def linearProbeConfusion(df: DataFrame, yCol: String, x1Col: String,
                           x2Col: String, strataCol: String): DataFrame = {
    val model = linearProbeTrain(df, yCol, x1Col, x2Col)
      .select(col("beta0"), col("beta1"), col("beta2"))
    val pred = col("beta0") +
      col("beta1") * col(x1Col).cast(DoubleType) +
      col("beta2") * col(x2Col).cast(DoubleType)
    df.crossJoin(broadcast(model))
      .withColumn("graft_yhat",
        when(pred >= 0.5, 1L).otherwise(0L))
      .withColumn("graft_yv", col(yCol).cast(LongType))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("graft_yv") === 1 && col("graft_yhat") === 1, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("graft_yv") === 0 && col("graft_yhat") === 1, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("graft_yv") === 1 && col("graft_yhat") === 0, 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("graft_yv") === 0 && col("graft_yhat") === 0, 1L)
          .otherwise(0L)).as("tn"))
  }

  /**
   * Split-conformal lower threshold + coverage audit (Vovk's conformal
   * prediction; Angelopoulos & Bates 2021 is the standard tutorial;
   * Laxhammar & Falkman apply this one-sided form as conformal anomaly
   * detection): from a held-out CALIBRATION split of scored rows,
   * q̂ = the k-th smallest score with k = ⌈α·(n_cal + 1)⌉ — then
   * flagging any test row with score < q̂ has false-alarm rate ≤ α
   * under exchangeability, a finite-sample guarantee needing NO model
   * assumptions. This is how a curation pipeline turns an arbitrary
   * quality score into a calibrated "bottom-α" cut with a provable
   * budget, instead of eyeballing a threshold.
   *
   * Everything is exact: scores must be integer-valued (the repo's
   * quantized-logit contract), k is integral ceiling arithmetic, and
   * the k-th order statistic comes from a total (score, id) order.
   * One summary row: (n_cal, k_rank, q_hat, n_test, n_flagged,
   * flagged_ppm). If the calibration split is too small for the rank
   * to exist (k = ⌈α·(n_cal+1)⌉ > n_cal), the summary row still
   * emits — with NULL q_hat and a zero flag count (a NULL threshold
   * flags nothing), matching the oracle's scalar-subquery semantics —
   * rather than silently vanishing.
   *
   * Scale shape: the order statistic uses [[GlobalRank]]'s range-
   * shuffle construction (no single-partition window over data rows);
   * the 1-row (k, q̂) result broadcasts onto one test-side aggregate.
   */
  def conformalLowerThreshold(df: DataFrame, idCol: String,
                              scoreCol: String, calFlagCol: String,
                              aNum: Long, aDen: Long): DataFrame = {
    require(aNum > 0 && aNum < aDen,
      s"alpha=$aNum/$aDen must be in (0, 1)")
    val cal = df.filter(col(calFlagCol)).select(col(idCol), col(scoreCol))
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
      .withColumn("k_rank",
        expr(s"($aNum * (n_cal + 1) + $aDen - 1) div $aDen"))
    val kth = GlobalRank.globalRowNumber(cal,
        Seq(col(scoreCol).asc, col(idCol).asc), "graft_rn")
      .crossJoin(broadcast(nCal))
      .filter(col("graft_rn") === col("k_rank"))
      .select(col("k_rank"), col(scoreCol).as("q_hat"))
    // left join so the summary row survives k_rank > n_cal (empty kth):
    // q_hat comes back NULL, exactly the oracle's scalar subquery
    val qHat = nCal.join(broadcast(kth), Seq("k_rank"), "left")
      .select(col("n_cal"), col("k_rank"), col("q_hat"))
    df.filter(!col(calFlagCol))
      .crossJoin(broadcast(qHat))
      .agg(first(col("n_cal")).as("n_cal"),
        first(col("k_rank")).as("k_rank"),
        first(col("q_hat")).as("q_hat"),
        count(lit(1)).as("n_test"),
        sum(when(col(scoreCol) < col("q_hat"), 1L).otherwise(0L))
          .as("n_flagged"))
      .withColumn("flagged_ppm",
        expr("cast(n_flagged * 1000000 as decimal(38,0)) div " +
          "cast(n_test as decimal(38,0))").cast(LongType))
  }

  /**
   * Confident-learning joint estimation (Northcutt, Jiang & Chuang,
   * JMLR 2021 "Confident Learning: Estimating Uncertainty in Dataset
   * Labels"): count the matrix C[ỹ=i][y*=j] of examples whose noisy
   * label is i but whose self-confidence for class j clears that
   * class's threshold t_j — the per-class MEAN score of examples
   * labeled j. Off-diagonal mass estimates label errors; the paper's
   * key insight is that per-class mean thresholds make the estimate
   * robust to miscalibrated scores, which is exactly why the exact
   * integer [[centroidScores]] surface (no probabilities needed)
   * works here.
   *
   * Portability: t_j stays the exact rational (Σ score_q, n_j); the
   * qualification test is integer cross-multiplication in
   * DECIMAL(38,0); the argmax among qualifying classes ties to the
   * alphabetically first label. Every hashed value is an exact count.
   * Examples clearing NO threshold are dropped (the paper's rule) but
   * accounted in `n_labeled` so the dropped mass is visible.
   *
   * Scale shape: [[centroidScores]]'s inverted-index passes, a
   * |labels|-row threshold broadcast, one per-doc window over ≤
   * |labels| rows, one (i, j) count agg — nothing new shuffles the
   * corpus.
   */
  def confidentJoint(docs: DataFrame, idCol: String, textCol: String,
                     labelCol: String, labels: Seq[String]): DataFrame = {
    val big = DecimalType(38, 0)
    val scores = centroidScores(docs, idCol, textCol, labelCol, labels)
    val thr = scores.filter(col(labelCol) === col("candidate"))
      .groupBy(col("candidate"))
      .agg(sum(col("score_q")).as("graft_tnum"),
        count(lit(1)).as("graft_tden"))
    val nLabeled = docs.groupBy(col(labelCol))
      .agg(count(lit(1)).as("n_labeled"))
    val qual = scores.join(broadcast(thr), Seq("candidate"))
      .filter(col("score_q").cast(big) * col("graft_tden").cast(big) >=
        col("graft_tnum").cast(big))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_q").desc, col("candidate").asc)
    val best = qual.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
    best.groupBy(col(labelCol), col("candidate").as("predicted"))
      .agg(count(lit(1)).as("n_confident"))
      .join(nLabeled, Seq(labelCol))
      .select(col(labelCol), col("predicted"), col("n_confident"),
        col("n_labeled"))
  }

  /**
   * Brier score with Murphy's decomposition (Brier 1950; Murphy 1973):
   * for a probabilistic judge whose predictions arrive as integer
   * PERCENT bins (0..100) with a boolean outcome, per stratum:
   * Brier = REL − RES + UNC, where reliability REL = Σnₖ(pₖ−ōₖ)²/N
   * (calibration error — the judge says 80% and is right 60% of the
   * time), resolution RES = Σnₖ(ōₖ−ō)²/N (how much the judge separates
   * outcomes), uncertainty UNC = ō(1−ō) (the task's own entropy). THE
   * audit an LLM-judge's confidence scores get before anyone trusts
   * them as probabilities — accuracy alone can't see an overconfident
   * judge. `ece_micro` reports the binned Expected Calibration Error
   * (Guo et al., ICML 2017) alongside: ECE = Σₖ (nₖ/N)·|pₖ − ōₖ| — the
   * single calibration number most LLM evals quote, exact here because
   * Σₖ|pₖnₖ − 100oₖ| is one integer sum.
   *
   * Exactness: pₖ is an integer percent, so every component is a sum of
   * exact rationals; each per-bin term is ONE floored integral division
   * to micro units (per-term flooring is part of the definition — both
   * engines sum the same integers), UNC and the raw Brier are single
   * half-away divisions. brier_micro is computed directly from
   * Σ(pₖ−100y)² — the identity Brier = REL − RES + UNC holds up to the
   * documented per-term flooring (≤ 1 micro × bins).
   *
   * Bound: the RES term's denominator carries N³ — exact through
   * N ≈ 10⁸ rows per stratum in DECIMAL(38,0); shard strata beyond
   * that. Scale shape: ONE (stratum, bin) count agg, a |strata|-row
   * re-agg, and a broadcast join back onto the ≤ 101-bin grid.
   */
  def brierDecomposition(df: DataFrame, strataCol: String,
                         pctCol: String, outcomeCol: Column): DataFrame = {
    val big = DecimalType(38, 0)
    val p = col("graft_p")
    val rows = df.select(col(strataCol),
        col(pctCol).cast(LongType).as("graft_p"),
        when(coalesce(outcomeCol.cast(BooleanType), lit(false)), 1L)
          .otherwise(0L).as("graft_y"))
      .filter(p.isNotNull && p >= 0 && p <= 100)
    val bins = rows.groupBy(col(strataCol), p)
      .agg(count(lit(1)).as("graft_nk"), sum(col("graft_y")).as("graft_ok"),
        sum((p - lit(100L) * col("graft_y")) *
          (p - lit(100L) * col("graft_y"))).as("graft_sq"))
    val tot = bins.groupBy(col(strataCol))
      .agg(sum(col("graft_nk")).as("graft_n"),
        sum(col("graft_ok")).as("graft_o"),
        sum(col("graft_sq")).as("graft_sqs"),
        // ECE numerator: Σₖ nₖ·|pₖ/100 − ōₖ| = Σₖ |pₖnₖ − 100oₖ| / 100
        // — ONE exact integer sum (Guo et al. 2017's binned expected
        // calibration error, the headline LLM-calibration number)
        sum(abs(p * col("graft_nk") - lit(100L) * col("graft_ok")))
          .as("graft_adev"),
        count(lit(1)).as("n_bins"))
    def d(c: Column): Column = c.cast(big)
    val withTot = bins.join(tot, Seq(strataCol))
    // REL term: (pₖnₖ − 100oₖ)² / (10⁴·nₖ·N) in floored micros
    val relT = call_function("div",
      (d(p * col("graft_nk") - lit(100L) * col("graft_ok")) *
        d(p * col("graft_nk") - lit(100L) * col("graft_ok")) *
        lit(1000000L).cast(big)).cast(big),
      (lit(10000L).cast(big) * d(col("graft_nk")) * d(col("graft_n")))
        .cast(big))
    // RES term: (oₖN − Onₖ)² / (nₖ·N³) in floored micros
    val resT = call_function("div",
      (d(col("graft_ok") * col("graft_n") -
          col("graft_o") * col("graft_nk")) *
        d(col("graft_ok") * col("graft_n") -
          col("graft_o") * col("graft_nk")) *
        lit(1000000L).cast(big)).cast(big),
      (d(col("graft_nk")) * d(col("graft_n")) * d(col("graft_n")) *
        d(col("graft_n"))).cast(big))
    withTot.groupBy(col(strataCol))
      .agg(max(col("graft_n")).as("n_rows"),
        max(col("graft_o")).as("n_positive"),
        max(col("n_bins")).as("n_bins"),
        sum(relT.cast(big)).cast(LongType).as("reliability_micro"),
        sum(resT.cast(big)).cast(LongType).as("resolution_micro"),
        max(ExactRound.halfAwayDiv(
          (d(col("graft_o")) * d(col("graft_n") - col("graft_o")) *
            lit(1000000L).cast(big)).cast(big),
          (d(col("graft_n")) * d(col("graft_n"))).cast(big)))
          .as("uncertainty_micro"),
        max(ExactRound.halfAwayDiv(
          (d(col("graft_sqs")) * lit(1000000L).cast(big)).cast(big),
          (lit(10000L).cast(big) * d(col("graft_n"))).cast(big)))
          .as("brier_micro"),
        max(ExactRound.halfAwayDiv(
          (d(col("graft_adev")) * lit(1000000L).cast(big)).cast(big),
          (lit(100L).cast(big) * d(col("graft_n"))).cast(big)))
          .as("ece_micro"))
  }

  /**
   * McNemar paired-filter disagreement (McNemar 1947): for two boolean
   * admission rules evaluated on the SAME documents, the per-stratum
   * 2×2 contingency (n11 both admit … n00 both reject) and the McNemar
   * statistic (b−c)²/(b+c) over the discordant cells — the correct
   * paired test for "does the new quality filter actually differ from
   * the old one, or do they disagree symmetrically" (marginal admit
   * rates alone can be identical while the filters disagree on half the
   * corpus; the discordant cells are the whole story).
   *
   * Hashed surface: the four exact cell counts and
   * `mcnemar_micro = half-away(10⁶·(b−c)²/(b+c))`; b + c = 0 (the
   * filters agree everywhere) reports NULL, never 0/0.
   *
   * Scale shape: ONE stratum-keyed map-side-combinable agg over a
   * narrow two-flag projection. The filters are arbitrary `Column`
   * predicates, so any scored signal plugs in without materializing an
   * intermediate table. A flag that evaluates to NULL counts as a
   * rejection (coalesced to false), so the four cells always partition
   * the stratum: n11 + n10 + n01 + n00 = row count.
   */
  def mcnemarFilters(df: DataFrame, strataCol: String, flagA: Column,
                     flagB: Column): DataFrame = {
    val big = DecimalType(38, 0)
    // coalesce to false AFTER the Boolean cast: a NULL flag would fall
    // into NONE of the four cells (NULL AND x → otherwise(0) in every
    // when), silently undercounting its stratum — a filter that cannot
    // evaluate a document has, for this paired test, rejected it
    val a = coalesce(flagA.cast(BooleanType), lit(false))
    val b = coalesce(flagB.cast(BooleanType), lit(false))
    val agg = df.groupBy(col(strataCol))
      .agg(
        sum(when(a && b, 1L).otherwise(0L)).as("n11"),
        sum(when(a && !b, 1L).otherwise(0L)).as("n10"),
        sum(when(!a && b, 1L).otherwise(0L)).as("n01"),
        sum(when(!a && !b, 1L).otherwise(0L)).as("n00"))
    val disc = col("n10") + col("n01")
    val diff = col("n10") - col("n01")
    agg.select(col(strataCol), col("n11"), col("n10"), col("n01"),
      col("n00"),
      when(disc > 0, ExactRound.halfAwayDiv(
        (diff.cast(big) * diff.cast(big) * lit(1000000L).cast(big))
          .cast(big),
        disc)).as("mcnemar_micro"))
  }
}
