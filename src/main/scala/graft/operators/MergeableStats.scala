package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Mergeable per-stratum corpus statistics — the incremental-maintenance
 * primitive: a 100 TB corpus's stats are computed once per ingest batch
 * and MERGED, never recomputed from raw data. Everything kept is a
 * semigroup (counts, sums, min/max), so `merge(stats(A), stats(B)) ==
 * stats(A ∪ B)` exactly — the algebraic law the q95 gate itself checks
 * (two halves merged vs the oracle's direct full-corpus computation).
 * Derived values (means) are computed FROM the sums at read time, never
 * stored — storing a mean would make the row unmergeable.
 *
 * Scale shape: one narrow projection (token counts) + one hash agg per
 * batch; merging is a union + re-agg over stratum-cardinality rows —
 * metadata-scale, not data-scale.
 */
object MergeableStats {

  /** Per-stratum token statistics of one batch: (strataCol, n_docs,
    * n_tokens, min_toks, max_toks) — all mergeable accumulators. */
  def tokenStats(docs: DataFrame, strataCol: String,
                 textCol: String): DataFrame =
    docs.select(col(strataCol),
        size(split(col(textCol), " ")).cast("long").as("graft_nt"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("graft_nt")).as("n_tokens"),
        min(col("graft_nt")).as("min_toks"),
        max(col("graft_nt")).as("max_toks"))

  /** Merge any number of stats tables produced by [[tokenStats]]:
    * accumulators combine by their own semigroup ops. */
  def merge(stats: Seq[DataFrame]): DataFrame = {
    require(stats.nonEmpty, "nothing to merge")
    stats.reduce(_ unionByName _)
      .groupBy(stats.head.columns.head)
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("min_toks")).as("min_toks"),
        max(col("max_toks")).as("max_toks"))
  }

  /** Read-time derived view: adds the mean token count from the sums
    * (6-dp rounded). */
  def withDerived(stats: DataFrame): DataFrame =
    stats.withColumn("mean_toks",
      round(col("n_tokens").cast(DoubleType) / col("n_docs"), 6))
}
