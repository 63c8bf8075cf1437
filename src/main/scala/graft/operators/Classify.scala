package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

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
}
