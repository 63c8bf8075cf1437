package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Exact global ranking without a single-partition window.
 *
 * `Window.orderBy` with no partition spec funnels EVERY row through one
 * task — the classic scale-killer for global row_number/ntile. The
 * distributed-exact construction here is the same trick RDD.zipWithIndex
 * uses, expressed declaratively:
 *
 *  1. `repartitionByRange(sortCols)` — range shuffle: partition i holds
 *     keys ≤ partition i+1's keys (Spark's RangePartitioner contract), so
 *     a per-partition rank plus the count of all earlier partitions IS the
 *     global rank.
 *  2. per-partition `row_number` over a window PARTITIONED by the physical
 *     partition id — parallel across the cluster.
 *  3. partition offsets = a join over the per-partition counts table
 *     (`n_partitions` rows — metadata-scale, broadcast), never a window
 *     over data rows.
 *
 * The counts are derived from the SAME window output (max local rank per
 * pid), not from a second scan, so AQE coalescing can never give the two
 * branches different partitionings. Every WindowExec in the resulting plan
 * has a nonempty partition spec (asserted in PlanShapeSpec).
 */
object GlobalRank {

  /** `df` plus `outCol` = exact 1-based global row number under the total
    * order `sortCols` (callers must make the order total — unique tiebreak
    * — for a deterministic result). */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
                      outCol: String = "rn"): DataFrame = {
    val parted = df.repartitionByRange(sortCols: _*)
      .withColumn("graft_pid", spark_partition_id())
    val localW = Window.partitionBy(col("graft_pid")).orderBy(sortCols: _*)
    val local = parted.withColumn("graft_lrn", row_number().over(localW))
    // rows-before-partition-p = Σ counts of partitions < p; counts come
    // from the same `local` lineage (max local rank per pid)
    val counts = local.groupBy(col("graft_pid"))
      .agg(max(col("graft_lrn")).as("graft_n"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.graft_pid") < col("a.graft_pid"), "left")
      .groupBy(col("a.graft_pid").as("graft_pid"))
      .agg(coalesce(sum(col("b.graft_n")), lit(0L)).as("graft_off"))
    // LongType: a rank column capped at 2^31 would silently cripple the
    // 100 TB posture (a corpus-half calibration split overflows int)
    local.join(broadcast(offsets), "graft_pid")
      .withColumn(outCol, (col("graft_lrn") + col("graft_off")).cast("long"))
      .drop("graft_pid", "graft_lrn", "graft_off")
  }

  /** `df` plus `outCol` = exact 1-based row number WITHIN each group of
    * `groupCols`, ordered by `sortCols` — the per-stratum analogue of
    * [[globalRowNumber]]. `Window.partitionBy(group).orderBy(...)` funnels
    * each group through ONE task, which is invisible when the group key
    * has thousands of values and fatal when it has three (a 100 TB corpus
    * with a 3-value stratum key full-sorts in ≤ 3 tasks — the q74-class
    * scale-killer). Here the range shuffle runs on (groupCols ++
    * sortCols), so every group spreads over MANY partitions; local ranks
    * are per-(pid, group) windows and the offsets table is
    * n_partitions·n_groups rows — metadata-scale, broadcast.
    *
    * Contract: group columns must be non-null (the offset attach joins by
    * name — a NULL group key would drop its rows) and `sortCols` must be
    * the same expressions the caller would put in the window's orderBy
    * (callers needing determinism of WHICH tied row takes which rank must
    * make the order total; value-at-rank is deterministic regardless).
    */
  def groupedRowNumber(df: DataFrame, groupCols: Seq[String],
                       sortCols: Seq[Column],
                       outCol: String = "rn"): DataFrame = {
    require(groupCols.nonEmpty, "need >= 1 group column (else use " +
      "globalRowNumber)")
    val gcols = groupCols.map(col)
    val parted = df.repartitionByRange((gcols ++ sortCols): _*)
      .withColumn("graft_pid", spark_partition_id())
    val localW = Window.partitionBy((col("graft_pid") +: gcols): _*)
      .orderBy(sortCols: _*)
    val local = parted.withColumn("graft_lrn", row_number().over(localW))
    val counts = local.groupBy((col("graft_pid") +: gcols): _*)
      .agg(max(col("graft_lrn")).as("graft_n"))
    // rows-before-(partition p, group g) = Σ counts of partitions < p for
    // the SAME group; the range partitioner orders pids consistently with
    // (group, sort) order, so the sum is exactly the group's head count
    val offsets = counts.as("a")
      .join(counts.as("b"),
        groupCols.map(g => col(s"a.$g") === col(s"b.$g")).reduce(_ && _) &&
          col("b.graft_pid") < col("a.graft_pid"), "left")
      .groupBy((col("a.graft_pid").as("graft_pid") +:
        groupCols.map(g => col(s"a.$g").as(g))): _*)
      .agg(coalesce(sum(col("b.graft_n")), lit(0L)).as("graft_off"))
    local.join(broadcast(offsets), "graft_pid" +: groupCols)
      .withColumn(outCol, (col("graft_lrn") + col("graft_off")).cast("long"))
      .drop("graft_pid", "graft_lrn", "graft_off")
  }

  /** Exact `ntile(buckets)` over the total order `sortCols` with SQL-window
    * semantics (first `n mod buckets` buckets get one extra row), computed
    * from the distributed global rank — no single-partition exchange. */
  def ntileExact(df: DataFrame, sortCols: Seq[Column], buckets: Int,
                 outCol: String = "bucket"): DataFrame = {
    val ranked = globalRowNumber(df, sortCols, "graft_grn")
    // total row count as a 1-row broadcast, not a collected scalar
    val total = ranked.agg(count(lit(1)).as("graft_total"))
    val r = col("graft_grn")
    // Spark's `/` on ints is double division — keep bucket arithmetic in
    // exact integer form via floor()
    val base = floor(col("graft_total") / buckets) // floor bucket size
    val rem = col("graft_total") % buckets         // first `rem` buckets +1
    val cut = (base + 1) * rem                     // rows in the big buckets
    val bucket = when(r <= cut, floor((r - 1) / (base + 1)) + 1)
      .otherwise(rem + floor((r - cut - 1) / base) + 1)
    ranked.crossJoin(broadcast(total))
      .withColumn(outCol, bucket.cast("int"))
      .drop("graft_grn", "graft_total")
  }
}
