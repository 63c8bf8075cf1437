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
    // Weights must be non-negative: the partition totals are derived as
    // max(prefix + weight), which is only the true total when the
    // running prefix is monotone. A negative weight would corrupt every
    // later partition's offset SILENTLY, so it raises instead — the
    // check rides the weight expression itself (can't be pruned).
    val wChecked = when(col(weightCol) >= 0, col(weightCol))
      .otherwise(raise_error(concat(
        lit("underBudget requires non-negative weights, got "),
        col(weightCol))).cast("long"))
    val parted = df.repartitionByRange(orderCols: _*)
      .withColumn("graft_w", wChecked)
      .withColumn("graft_pid", spark_partition_id())
    val w = Window.partitionBy(col("graft_pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("graft_lpre",
      coalesce(sum(col("graft_w")).over(w), lit(0L)))
    val counts = local.groupBy(col("graft_pid"))
      .agg(max(col("graft_lpre") + col("graft_w")).as("graft_n"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.graft_pid") < col("a.graft_pid"), "left")
      .groupBy(col("a.graft_pid").as("graft_pid"))
      .agg(coalesce(sum(col("b.graft_n")), lit(0L)).as("graft_off"))
    local.join(broadcast(offsets), "graft_pid")
      .withColumn("cum_before", col("graft_lpre") + col("graft_off"))
      .filter(col("cum_before") + col("graft_w") <= budget)
      .drop("graft_pid", "graft_lpre", "graft_off", "graft_w")
  }

  /**
   * Per-stratum budget caps — source quotas: within each stratum, rows
   * are admitted in `orderCols` order while the stratum's running weight
   * stays within ITS budget ("no source exceeds X tokens", the quota
   * form of corpus mixing). `budgets` maps stratum → cap; strata absent
   * from the map get `defaultBudget`.
   *
   * A bare `Window.partitionBy(stratum)` would funnel each ENTIRE
   * stratum through one task — at corpus scale the dominant source IS
   * most of the data, so that is the single-partition trap with a
   * stratum-shaped hat. Instead the [[underBudget]] construction runs
   * keyed within strata: range-shuffle on (stratum, order) puts every
   * stratum into contiguous partitions, per-(partition, stratum) local
   * prefix sums stay parallel, and the broadcast offsets join matches on
   * partition AND stratum, so no task ever holds more than one
   * partition's slice of a stratum.
   */
  def underBudgetPerStratum(df: DataFrame, weightCol: String,
                            strataCol: String, orderCols: Seq[Column],
                            budgets: Map[String, Long],
                            defaultBudget: Long): DataFrame = {
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      "budgets must be non-negative")
    val wChecked = when(col(weightCol) >= 0, col(weightCol))
      .otherwise(raise_error(concat(
        lit("underBudgetPerStratum requires non-negative weights, got "),
        col(weightCol))).cast("long"))
    val cap = budgets.foldRight(lit(defaultBudget): Column) {
      case ((stratum, b), rest) =>
        when(col(strataCol) === stratum, lit(b)).otherwise(rest)
    }
    val parted = df.repartitionByRange(col(strataCol) +: orderCols: _*)
      .withColumn("graft_w", wChecked)
      .withColumn("graft_pid", spark_partition_id())
    val w = Window.partitionBy(col("graft_pid"), col(strataCol))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("graft_lpre",
      coalesce(sum(col("graft_w")).over(w), lit(0L)))
    val counts = local.groupBy(col("graft_pid"), col(strataCol))
      .agg(max(col("graft_lpre") + col("graft_w")).as("graft_n"))
    val offsets = counts.as("a")
      .join(counts.as("b"),
        col("b.graft_pid") < col("a.graft_pid") &&
          col(s"b.$strataCol") === col(s"a.$strataCol"), "left")
      .groupBy(col("a.graft_pid").as("graft_pid"),
        col(s"a.$strataCol").as(strataCol))
      .agg(coalesce(sum(col("b.graft_n")), lit(0L)).as("graft_off"))
    local.join(broadcast(offsets), Seq("graft_pid", strataCol))
      .withColumn("cum_before", col("graft_lpre") + col("graft_off"))
      .filter(col("cum_before") + col("graft_w") <= cap)
      .drop("graft_pid", "graft_lpre", "graft_off", "graft_w")
  }

  /**
   * Pareto frontier (skyline) on two larger-is-better dimensions: keep
   * exactly the rows no other row strictly dominates (x' ≥ x, y' ≥ y,
   * at least one strict). The 2-D data-selection primitive — "no doc
   * both higher-quality AND longer exists" — without scoring the two
   * axes into one number first.
   *
   * Shape: collapse to one row per distinct x level (max y per level),
   * run ONE running-max window over the levels ordered by x desc, keep
   * levels whose max-y beats everything strictly above, and broadcast
   * the (tiny) frontier back onto the corpus as an equi-join. The window
   * is over LEVELS, not rows: with the project's 6-dp score quantization
   * the level count is bounded by 10⁶+1 — metadata scale — so the
   * single-partition window never sees corpus-sized input. The corpus
   * itself is touched by one hash-agg and one broadcast join.
   */
  def paretoFrontier(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val levels = df.groupBy(col(xCol)).agg(max(col(yCol)).as("graft_ymax"))
    // distributed staircase: |levels| = distinct x, which for a
    // CONTINUOUS score is data-scale — an unpartitioned running-max
    // window would funnel it through one task. Range-partition by x
    // desc instead: strictly-above max = local window max ⊕ the max of
    // every higher-x partition (the GlobalRank offsets pattern with max
    // for sum — max is associative, so the split is exact). The `<`
    // offsets join runs on n_partitions rows (metadata).
    val parted = levels.repartitionByRange(col(xCol).desc)
      .withColumn("graft_pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("graft_pid"))
      .orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("graft_labove",
      max(col("graft_ymax")).over(wLocal))
    val counts = local.groupBy(col("graft_pid"))
      .agg(max(col("graft_ymax")).as("graft_pmax"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.graft_pid") < col("a.graft_pid"), "left")
      .groupBy(col("a.graft_pid").as("graft_pid"))
      .agg(max(col("b.graft_pmax")).as("graft_off"))
    val frontier = local.join(broadcast(offsets), Seq("graft_pid"))
      // greatest() skips nulls: first level overall has both null
      .withColumn("graft_yabove",
        greatest(col("graft_labove"), col("graft_off")))
      // strictly-higher-x levels all have smaller max-y (or none exist)
      .filter(col("graft_yabove").isNull ||
        col("graft_ymax") > col("graft_yabove"))
      .select(col(xCol), col("graft_ymax"))
    df.join(broadcast(frontier), Seq(xCol))
      // within the level, only the max-y rows are undominated
      .filter(col(yCol) === col("graft_ymax"))
      .drop("graft_ymax")
  }

  /**
   * Filter-threshold sweep: for each candidate cut `t`, how many
   * documents and tokens survive `score >= t` — the calibration curve a
   * curation pipeline computes BEFORE freezing a classifier threshold
   * (every quality-filter paper publishes exactly this kept-fraction
   * table; GPT-3's Appendix A document-filtering describes choosing the
   * cut against retained volume). Output: one row per threshold with
   * exact kept/total counts and ⌊10⁶·kept/total⌋ ppm shares.
   *
   * Scale shape: ONE hash aggregation over the corpus computes all
   * |T| conditional sums simultaneously (map-side combinable — each
   * task folds its rows into 2·|T|+2 counters); the explode that
   * unpivots the 1-row result to |T| rows touches metadata only. No
   * per-threshold rescans, no fan-out of the corpus.
   */
  def thresholdSweep(df: DataFrame, scoreCol: String, weightCol: String,
                     thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty && thresholds.size <= 64,
      s"thresholds size ${thresholds.size} out of range [1, 64]")
    require(thresholds.distinct.size == thresholds.size,
      "thresholds must be distinct")
    val idx = thresholds.zipWithIndex
    val aggCols = idx.flatMap { case (t, i) => Seq(
      sum(when(col(scoreCol) >= t, 1L).otherwise(0L)).as(s"graft_d$i"),
      sum(when(col(scoreCol) >= t, col(weightCol)).otherwise(0L))
        .as(s"graft_w$i"))
    } ++ Seq(count(lit(1)).as("graft_nd"),
      sum(col(weightCol)).as("graft_nw"))
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val rows = idx.map { case (t, i) =>
      struct(lit(t).as("t"), col(s"graft_d$i").as("d"),
        col(s"graft_w$i").as("w"))
    }
    one.select(explode(array(rows: _*)).as("graft_r"),
        col("graft_nd"), col("graft_nw"))
      .select(col("graft_r.t").as("threshold"),
        col("graft_r.d").as("n_docs_kept"),
        col("graft_r.w").cast("long").as("n_tokens_kept"),
        col("graft_nd").as("n_docs_total"),
        col("graft_nw").cast("long").as("n_tokens_total"),
        expr("cast(graft_r.d * 1000000 as decimal(38,0)) div " +
          "cast(graft_nd as decimal(38,0))").cast("long").as("docs_ppm"),
        when(col("graft_nw") > 0,
          expr("cast(graft_r.w * 1000000 as decimal(38,0)) div " +
            "cast(graft_nw as decimal(38,0))").cast("long"))
          .otherwise(0L).as("tokens_ppm"))
  }
}
