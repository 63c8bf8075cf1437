package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Entity-resolution blocking: candidate same-entity pairs from shared
 * exact behavioral fingerprints — "two accounts that performed ≥ k
 * identical (action, amount, time-bucket) events are probably one
 * actor". The blocking pass of record linkage / alias detection; a
 * verifier (features + model, or a human) consumes the candidates.
 *
 * Same inverted-index shape as the text dedup family
 * ([[TextDedup.ngramJaccardPairs]]'s events cousin): distinct
 * (entity, fingerprint) postings, a frequency cap that drops ubiquitous
 * fingerprints (a fingerprint shared by m entities contributes m² pair
 * candidates but ~zero linkage signal — the df cap bounds Σdf² exactly
 * as in text dedup), then a self-equi-join on the fingerprint and a
 * pair-count cut. Never an all-pairs comparison of entities.
 */
object EntityResolution {

  /** Pairs of entities sharing at least `minShared` distinct fingerprint
    * values, counting only fingerprints shared by ≤ `maxDf` entities.
    * Output: (e1, e2, n_shared), e1 < e2. */
  def sharedFingerprintPairs(df: DataFrame, entityCol: String,
                             fingerprintCol: String, minShared: Int,
                             maxDf: Int): DataFrame = {
    require(minShared >= 1, s"minShared=$minShared must be positive")
    require(maxDf >= 2, s"maxDf=$maxDf must allow at least one pair")
    val posts = df.select(col(entityCol), col(fingerprintCol)).distinct()
    val keep = posts.groupBy(col(fingerprintCol))
      .agg(count(lit(1)).as("graft_df"))
      .filter(col("graft_df") >= 2 && col("graft_df") <= maxDf)
      .select(col(fingerprintCol))
    val filtered = posts.join(keep, Seq(fingerprintCol), "left_semi")
    filtered.select(col(fingerprintCol), col(entityCol).as("e1"))
      .join(filtered.select(col(fingerprintCol), col(entityCol).as("e2"))
        .hint("shuffle_hash"), Seq(fingerprintCol))
      .filter(col("e1") < col("e2"))
      .groupBy(col("e1"), col("e2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
