package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Histogram-quantized percentiles — the scalable percentile path.
 *
 * Exact percentiles need a global sort (or `GlobalRank`'s range exchange);
 * `approx_percentile` sketches are engine-specific and not
 * oracle-reproducible. The middle road used by every warehouse's ANALYZE:
 * quantize the value into `2^bits` equi-width integer buckets against the
 * global min/max (integer-exact — [[Layout.rank]] is the shared
 * quantizer), count per bucket, and read percentiles off the cumulative
 * counts. Error is bounded by one bucket width, the output is
 * deterministic and engine-portable, and the whole thing costs one corpus
 * pass + one metadata-scale aggregation (≤ 2^bits · strata rows) — no
 * global sort, ever.
 *
 * The threshold test is integer-exact: bucket b is the p-th percentile
 * bucket iff it is the first with `100·cum ≥ p·n` (no float `ceil`
 * to diverge on). Bucket bounds are dequantized with the same int64 `div`
 * the forward rank uses.
 */
object Histogram {

  /**
   * Per-stratum percentile summary of a LONG column. Output one row per
   * (stratum, pct): the quantized bucket that crosses the percentile,
   * its dequantized [lo, hi) bounds, the cumulative count at the bucket,
   * and the stratum total.
   *
   * Global (not per-stratum) min/max anchor the buckets so bounds are
   * comparable across strata. The min/max aggregate is collected eagerly
   * and [[Layout.rank]]'s int64 domain bound is verified against the data
   * before the projection is built (same guard as [[Layout.withZValue]]).
   */
  /** [[quantizedPercentiles]] with every row counted `weightCol` times —
    * token-weighted length percentiles and the like ("the median BYTE is
    * in a document of length…", not "the median document"). Same
    * integer-exact crossing test over cumulative weight. */
  def weightedQuantizedPercentiles(df: DataFrame, valueCol: String,
                                   weightCol: String, strataCol: String,
                                   bits: Int = 12,
                                   pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame =
    quantizedPercentiles(df, valueCol, strataCol, bits, pcts,
      weightCol = Some(weightCol))

  def quantizedPercentiles(df: DataFrame, valueCol: String,
                           strataCol: String, bits: Int = 12,
                           pcts: Seq[Int] = Seq(50, 90, 99),
                           weightCol: Option[String] = None): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be within [1, 100]: $pcts")
    // NULL values carry no rank information and would bucket as NULL —
    // sorted FIRST by Spark's window but LAST by most other engines,
    // shifting every cumulative count. Excluded up front (documented:
    // percentiles are over non-NULL values, as in SQL aggregates).
    val nonNull = df.filter(col(valueCol).isNotNull)
    val row = nonNull.agg(min(col(valueCol).cast(LongType)),
      max(col(valueCol).cast(LongType))).head()
    // empty input: any literal domain gives the correctly-shaped empty
    // result (counts below are empty either way)
    val (mn, mx) =
      if (row.isNullAt(0)) (0L, 1L) else (row.getLong(0), row.getLong(1))
    val top = (1L << bits) - 1
    // (top + 1): the upper-bound dequantization computes (bucket+1)·(mx−mn)
    // and the top bucket's upper edge uses bucket+1 = top+1
    require((BigInt(mx) - BigInt(mn)) * (top + 1) <= Long.MaxValue,
      s"quantizedPercentiles overflows int64: ($mx - $mn) * ${top + 1}; " +
        "pre-scale the column or lower bits")

    // A NULL weight would silently drop the row from the cumulative sum
    // and a non-positive weight makes cumulative weight non-monotone, so
    // the crossing test could match zero or multiple buckets — raise
    // instead, riding the weight expression so it can't be pruned (the
    // same un-skippable guard as Sampling.weightedSample). The sum below
    // accumulates through cast(LongType), so the guard must also reject
    // FRACTIONAL weights: 0.4 would pass a `> 0` check and then truncate
    // to 0 in the sum — exactly the non-monotone hazard again — and 1.5
    // would silently count as 1. Weights are counts ("this row stands for
    // w tokens"); require integral w >= 1 so the contract matches the
    // arithmetic actually performed. (The cast-roundtrip equality is
    // double-exact for any realistic count; int64-range weights past 2^53
    // would overflow the cumulative sum long before the guard matters.)
    val guardedW = weightCol.map { wc =>
      when(col(wc).isNotNull && col(wc) >= 1 &&
          col(wc).cast(LongType).cast(DoubleType) ===
            col(wc).cast(DoubleType),
          col(wc))
        .otherwise(raise_error(concat(
          lit(s"quantizedPercentiles requires integral $wc >= 1 " +
            "(non-null), got "),
          coalesce(col(wc).cast(StringType), lit("NULL"))))
          .cast(LongType))
    }.getOrElse(lit(1L))
    val counts = nonNull
      .select(col(strataCol),
        Layout.rank(col(valueCol), lit(mn), lit(mx), bits).as("bucket"),
        guardedW.as("graft_w"))
      .groupBy(col(strataCol), col("bucket"))
      .agg(sum(col("graft_w").cast(LongType)).as("graft_cnt"))
    val wCum = Window.partitionBy(col(strataCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col(strataCol))
    val cum = counts
      .withColumn("n_le", sum(col("graft_cnt")).over(wCum))
      .withColumn("n", sum(col("graft_cnt")).over(wTot))
    // crossing bucket per pct: first with 100*cum >= p*n, i.e. the
    // predecessor cumulative (cum - cnt) is still short of the threshold
    val pctsDf = df.sparkSession.createDataFrame(
      pcts.map(Tuple1(_))).toDF("pct")
    def dequant(b: org.apache.spark.sql.Column) =
      lit(mn) + call_function("div", b * (mx - mn), lit(top))
    cum.crossJoin(broadcast(pctsDf))
      .filter(lit(100L) * col("n_le") >= col("pct").cast(LongType) * col("n") &&
        lit(100L) * (col("n_le") - col("graft_cnt")) <
          col("pct").cast(LongType) * col("n"))
      .select(col(strataCol), col("pct"), col("bucket"),
        dequant(col("bucket")).as("lo"),
        dequant(col("bucket") + 1).as("hi"),
        col("n_le"), col("n"))
  }

  /**
   * Equi-width bucket counts against an EXPLICIT domain — the mergeable
   * histogram building block. Fixing [mn, mx] up front (rather than
   * deriving it from the data) is what makes partial histograms from
   * different batches/sources/days addable: every producer quantizes
   * identically, so merging is plain per-bucket count addition
   * ([[mergeBucketCounts]]) — the semigroup law the gate verifies on
   * q117. Out-of-domain values CLAMP to the edge buckets (0 and 2^bits−1):
   * letting them run through the rank arithmetic raw would bucket
   * negative numerators differently across engines (int64 `div` truncates
   * toward zero, DuckDB `//` floors) and risk overflow far above mx.
   */
  def bucketCounts(df: DataFrame, valueCol: String, bits: Int,
                   mn: Long, mx: Long): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    require(mx > mn, s"need mx > mn: [$mn, $mx]")
    val top = (1L << bits) - 1
    // (top + 1) covers downstream dequantizations of the top bucket's
    // UPPER edge ((bucket+1)·(mx−mn), e.g. otsuThreshold's
    // threshold_value), not just the forward rank's top·(mx−mn)
    require((BigInt(mx) - BigInt(mn)) * (top + 1) <= Long.MaxValue,
      s"bucketCounts overflows int64: ($mx - $mn) * ${top + 1}")
    val clamped = least(greatest(col(valueCol).cast(LongType), lit(mn)),
      lit(mx))
    df.select(Layout.rank(clamped, lit(mn), lit(mx), bits).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * Calibration bins (reliability diagram): quantize an integer score
   * into `2^bits` equi-width bins over the EXPLICIT domain [mn, mx]
   * (same clamp + rank as [[bucketCounts]], so bins are mergeable and
   * engine-exact) and report, per bin, the count, the positive count,
   * the empirical positive rate, and the mean score — "when the model
   * says 0.8, is it right 80% of the time?", the diagnostic every
   * classifier-based quality filter needs before its scores become
   * keep/drop decisions.
   *
   * `posCol` must be 0/1 int; `scoreQCol` a LONG (quantize floats
   * upstream via round(x·10^6) — the project float rule). Sums stay
   * int64-exact; the only doubles are the two final divisions, each
   * exactly-representable-int over int, deterministic across engines.
   */
  def calibrationBins(df: DataFrame, scoreQCol: String, posCol: String,
                      bits: Int, mn: Long, mx: Long): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    require(mx > mn, s"need mx > mn: [$mn, $mx]")
    val top = (1L << bits) - 1
    require((BigInt(mx) - BigInt(mn)) * top <= Long.MaxValue,
      s"calibrationBins overflows int64: ($mx - $mn) * $top")
    val clamped = least(greatest(col(scoreQCol).cast(LongType), lit(mn)),
      lit(mx))
    df.select(Layout.rank(clamped, lit(mn), lit(mx), bits).as("bucket"),
        clamped.as("graft_q"), col(posCol).cast(LongType).as("graft_pos"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("graft_pos")).as("n_pos"),
        sum(col("graft_q")).as("graft_sq"))
      .select(col("bucket"), col("n"), col("n_pos"),
        round(col("n_pos").cast(DoubleType) / col("n"), 6).as("pos_rate"),
        round(col("graft_sq").cast(DoubleType) / col("n"), 6)
          .as("mean_score_q"))
  }

  /** Merge partial histograms from [[bucketCounts]] (same domain/bits):
    * per-bucket count addition — associative and commutative, so batches
    * can merge in any order and incrementally. */
  def mergeBucketCounts(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "mergeBucketCounts: no partial histograms")
    parts.reduce(_ unionByName _)
      .groupBy(col("bucket"))
      .agg(sum(col("n")).as("n"))
  }

  /**
   * Otsu's method over the quantized histogram: the bucket threshold
   * maximizing between-class variance — the data-driven "where do I cut
   * quality scores?" answer, instead of a hand-picked 0.5. Class 0 is
   * buckets ≤ t; between-class variance ∝ (s0·w1 − s1·w0)² / (w0·w1)
   * with w = class counts and s = class Σ(bucket·count) — all int64
   * until one final double division, so the argmax is engine-exact
   * (ties break toward the smaller threshold).
   *
   * Shape: one corpus pass for the histogram ([[bucketCounts]]), then
   * cumulative windows and the argmax over ≤ 2^bits rows — metadata
   * scale, single partition by construction. Int64 bound: the cross
   * products need (2^bits−1)·n² to fit — at bits=8, corpora to ~2×10⁸
   * rows; shift to DECIMAL sums beyond that.
   */
  def otsuThreshold(df: DataFrame, valueCol: String, bits: Int,
                    mn: Long, mx: Long): DataFrame = {
    val counts = bucketCounts(df, valueCol, bits, mn, mx)
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val d = (col("s0") * col("w1") - col("s1") * col("w0")).cast(DoubleType)
    val scored = counts
      .withColumn("w0", sum(col("n")).over(wCum))
      .withColumn("s0", sum(col("bucket") * col("n")).over(wCum))
      .withColumn("w1", sum(col("n")).over(wAll) - col("w0"))
      .withColumn("s1", sum(col("bucket") * col("n")).over(wAll) - col("s0"))
      .filter(col("w0") > 0 && col("w1") > 0)
      .withColumn("between_var",
        round(d * d / (col("w0") * col("w1")).cast(DoubleType), 6))
    scored
      .withColumn("graft_rk", row_number().over(
        Window.orderBy(col("between_var").desc, col("bucket").asc)))
      .filter(col("graft_rk") === 1)
      .select(col("bucket").as("threshold_bucket"),
        (lit(mn) + call_function("div",
          (col("bucket") + 1) * (mx - mn), lit((1L << bits) - 1)))
          .as("threshold_value"),
        col("between_var"), col("w0"), col("w1"))
  }

  /**
   * Isotonic calibration over score bins — pool-adjacent-violators via
   * the MINIMAX identity: iso_i = max_{j≤i} min_{k≥i} wavg(j..k), the
   * closed form of the PAV fit (Ayer et al. 1955; Robertson–Wright–
   * Dykstra 1988 §1.2), which turns the sequential pooling loop into a
   * data-parallel expression. The calibration-map producer behind
   * "turn this quality score into an actual probability" — the natural
   * consumer of [[calibrationBins]]' reliability diagram.
   *
   * The corpus never sees any of this: the bins relation is
   * metadata-scale BY CONSTRUCTION (bounded bucket count), so one
   * sort_array(collect_list(...)) gathers it into a single row and the
   * whole O(B³) minimax runs inside one projection of nested
   * higher-order functions — no joins, no window, no driver collect.
   *
   * Determinism: bin counts are int64; each weighted average is one
   * int64-sum / int64-sum double division rounded to 6 dp; min/max over
   * identical doubles are engine-exact. Output is monotone nondecreasing
   * in the bucket order by construction.
   */
  def isotonicCalibration(bins: DataFrame, bucketCol: String, nCol: String,
                          posCol: String): DataFrame = {
    val one = bins.groupBy().agg(
      sort_array(collect_list(struct(
        col(bucketCol).cast(LongType).as("b"),
        col(nCol).cast(LongType).as("n"),
        col(posCol).cast(LongType).as("p")))).as("graft_rows"))
    def fieldArr(f: String) =
      transform(col("graft_rows"), r => r.getField(f))
    def segSum(arr: Column, j: Column, k: Column): Column =
      aggregate(slice(arr, j, k - j + 1), lit(0L), (acc, x) => acc + x)
    def wavg(j: Column, k: Column): Column =
      round(segSum(col("graft_ps"), j, k).cast(DoubleType) /
        segSum(col("graft_ns"), j, k).cast(DoubleType), 6)
    val m = size(col("graft_rows"))
    // guard the no-bins case: sequence(1, 0) runs BACKWARDS in Spark,
    // which would fabricate a 2-element iso array and two null-padded
    // rows out of the arrays_zip — empty in, empty out instead
    val iso = when(m >= 1,
      transform(sequence(lit(1), m), i =>
        array_max(transform(sequence(lit(1), i), j =>
          array_min(transform(sequence(i, m), k => wavg(j, k)))))))
      .otherwise(array().cast("array<double>"))
    one
      .withColumn("graft_bk", fieldArr("b"))
      .withColumn("graft_ns", fieldArr("n"))
      .withColumn("graft_ps", fieldArr("p"))
      .withColumn("graft_iso", iso)
      .select(explode(arrays_zip(col("graft_bk"), col("graft_ns"),
        col("graft_ps"), col("graft_iso"))).as("graft_z"))
      .select(col("graft_z.graft_bk").as("bucket"),
        col("graft_z.graft_ns").as("n"),
        col("graft_z.graft_ps").as("n_pos"),
        round(col("graft_z.graft_ps").cast(DoubleType) /
          col("graft_z.graft_ns").cast(DoubleType), 6).as("raw_rate"),
        col("graft_z.graft_iso").as("iso_rate"))
  }
}
