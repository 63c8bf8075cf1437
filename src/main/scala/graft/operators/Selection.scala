package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Budget-constrained corpus selection: keep the best rows under a total
 * weight budget — "fill a 300B-token training budget with the
 * highest-quality documents", the final cut of a curation pipeline.
 *
 * Greedy-by-rank is the exact optimum for this fractional-knapsack-
 * without-splitting-regret setting the pipelines actually use: order by
 * the quality key, keep while the running weight fits. The running sum
 * is an exact GLOBAL prefix sum under the caller's total order, computed
 * with the [[GlobalRank]]/[[Packing]] construction — range shuffle on
 * the order key, partition-local running sums, broadcast per-partition
 * offsets — so there is no single-partition window anywhere.
 */
object Selection {

  /**
   * Rows whose exclusive running weight (`cum_before`, added as a
   * column) still admits them: kept iff cum_before + weight ≤ budget.
   * `orderCols` must be a total order (unique tiebreak) for a
   * deterministic cut.
   */
  def underBudget(df: DataFrame, weightCol: String, orderCols: Seq[Column],
                  budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val parted = df.repartitionByRange(orderCols: _*)
      .withColumn("graft_pid", spark_partition_id())
    val w = Window.partitionBy(col("graft_pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("graft_lpre",
      coalesce(sum(col(weightCol)).over(w), lit(0L)))
    val counts = local.groupBy(col("graft_pid"))
      .agg(max(col("graft_lpre") + col(weightCol)).as("graft_n"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.graft_pid") < col("a.graft_pid"), "left")
      .groupBy(col("a.graft_pid").as("graft_pid"))
      .agg(coalesce(sum(col("b.graft_n")), lit(0L)).as("graft_off"))
    local.join(broadcast(offsets), "graft_pid")
      .withColumn("cum_before", col("graft_lpre") + col("graft_off"))
      .filter(col("cum_before") + col(weightCol) <= budget)
      .drop("graft_pid", "graft_lpre", "graft_off")
  }
}
