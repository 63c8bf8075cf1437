package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Latest-record-per-key dedup — the reference's W1+W2 window pattern
 * (`row_number() over (partition by id order by ts desc)` then `rn == 1`,
 * 3-spark_curated_analytics_full.py:67-74), generalized to any key/order.
 *
 * Scale notes: Catalyst ≥3.5 rewrites rank-limit filters into
 * `WindowGroupLimit`, which keeps only the per-key top row inside each map
 * task BEFORE the shuffle — so the exchange carries ~|keys| rows, not |input|
 * rows. That one rewrite is the difference between "sorts 100 TB" and
 * "shuffles the key cardinality"; `PlanShapeSpec` asserts it stays in the
 * physical plan.
 */
object LatestSnapshot {

  /** Keep the single latest row per key. Ties on the ordering are broken by
    * `tiebreak` when supplied (reference semantics: no tiebreak —
    * nondeterministic winner on equal timestamps; pass one for
    * deterministic tests/oracles). */
  def apply(df: DataFrame, keys: Seq[String], orderDesc: Column,
            tiebreak: Seq[Column] = Seq.empty): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(orderDesc.desc +: tiebreak.map(_.desc): _*)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Generalized per-key top-K (row_number ≤ k) with explicit sort order —
    * same WindowGroupLimit rewrite applies: each map task keeps at most k
    * rows per key before the shuffle. */
  def topK(df: DataFrame, keys: Seq[String], order: Column,
           tiebreak: Seq[Column], k: Int): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(order +: tiebreak: _*)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }
}
