package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/**
 * Timeline analytics over irregular event streams: time-weighted
 * averages, interval-union coverage, and CUSUM change detection — the
 * "what was the state, for how long, and when did it shift" layer that
 * plain event-count aggregates can't answer because they ignore HOW LONG
 * each observation was in force.
 *
 * All three are one-entity-keyed-window + one-hash-agg shapes: state per
 * entity is O(1), nothing self-joins the event log, and every
 * aggregation is map-side combinable, so the operators hold at
 * 100 TB / 1000 executors exactly like [[Funnel]] and [[Sessionize]].
 *
 * Determinism contract (the DuckDB-gate rules): event order is the total
 * (ts, id) order; durations are int64 microseconds; double sums go
 * through the 6-dp-round → DECIMAL accumulate pattern; decimal-exact
 * quantities exported as integers are scaled by 10⁶ rather than cast to
 * double (no dependence on decimal→double rounding).
 */
object Timeline {

  /**
   * Per-entity time-weighted average (TWAP): each observation of
   * `valueCol` is weighted by how long it remained current — the gap to
   * the next event — so a metric sampled irregularly (the crypto-ticker
   * shape of the reference's poll loop) averages by TIME IN FORCE, not
   * by sample count. The last observation of an entity has no successor
   * and carries zero weight; single-event entities have no weighted
   * rows and are ABSENT from the output; an entity whose events all
   * share one timestamp (total weight 0) yields NULL twap via an
   * explicit guard — Spark's 0/0 is NULL but DuckDB's is IEEE, so the
   * guard is what keeps the engines aligned.
   *
   * Weights are seconds as doubles (gap_us/1e6 — both factors exact,
   * IEEE division is correctly rounded, so engines agree bitwise);
   * value·weight products round to 6 dp and accumulate as
   * DECIMAL(38,6); the denominator Σgap stays int64 µs. One lead
   * window + one hash-agg.
   */
  def twap(events: DataFrame, entityCol: String, idCol: String,
           tsCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col("graft_tus"), col(idCol))
    val gapUs = lead(col("graft_tus"), 1).over(w) - col("graft_tus")
    val v = col(valueCol).cast(DoubleType)
    val weighted = events
      .select(col(entityCol), col(idCol), v.as("graft_v"),
        unix_micros(col(tsCol)).as("graft_tus"))
      .withColumn("graft_gap", gapUs)
      .filter(col("graft_gap").isNotNull)
    weighted.groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_weighted"),
        sum(col("graft_gap")).cast(LongType).as("graft_sw_us"),
        sum(round(col("graft_v") * (col("graft_gap").cast(DoubleType) /
          lit(1000000.0)), 6).cast(DecimalType(38, 6))).as("graft_swv"))
      .select(col(entityCol), col("n_weighted"),
        round(col("graft_sw_us").cast(DoubleType) / lit(1000000.0), 6)
          .as("span_s"),
        when(col("graft_sw_us") > 0,
          round(col("graft_swv").cast(DoubleType) /
            (col("graft_sw_us").cast(DoubleType) / lit(1000000.0)), 6))
          .as("twap"))
  }

  /**
   * Per-entity interval-union coverage: each event opens an interval
   * [ts, ts + holdUs); overlapping and touching intervals merge, and the
   * operator reports how much wall-clock each entity actually covered
   * and in how many contiguous runs — the "active seconds" metric that
   * naive Σduration double-counts whenever events overlap.
   *
   * The merge is the gaps-and-islands running-max trick: an interval
   * starts a new island iff its start lies strictly beyond the max end
   * seen so far (touching intervals — start == max end — merge, matching
   * half-open semantics). One entity-keyed window (running max + running
   * island count) and two entity-keyed aggs that reuse its partitioning.
   * Everything is int64 µs — exact, no float rules needed.
   */
  def intervalCoverage(events: DataFrame, entityCol: String, idCol: String,
                       tsCol: String, holdUs: Long): DataFrame = {
    require(holdUs > 0, s"holdUs must be positive: $holdUs")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col("graft_tus"), col(idCol))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val opened = events
      .select(col(entityCol), col(idCol),
        unix_micros(col(tsCol)).as("graft_tus"))
      .withColumn("graft_end", col("graft_tus") + lit(holdUs))
      // strictly-greater: a start equal to the running max end touches
      // the previous interval and must merge under half-open semantics
      .withColumn("graft_new",
        when(col("graft_tus") > coalesce(max(col("graft_end")).over(wPrev),
          lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("graft_island", sum(col("graft_new")).over(wRun))
    opened
      .groupBy(col(entityCol), col("graft_island"))
      .agg(min(col("graft_tus")).as("graft_st"),
        max(col("graft_end")).as("graft_en"),
        count(lit(1)).as("graft_n"))
      .groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("graft_en") - col("graft_st")).cast(LongType)
          .as("covered_us"),
        max(col("graft_en") - col("graft_st")).as("max_island_us"),
        sum(col("graft_n")).cast(LongType).as("n_events"))
  }

  /**
   * Per-entity one-sided CUSUM change detection (Page 1954): the running
   * statistic S_i = max(0, S_{i−1} + (x_i − (μ + slack·σ))) alarms when
   * it exceeds h = `hSigma`·σ, flagging sustained upward drift that
   * per-point outlier tests (z-scores) miss. μ, σ are the entity's own
   * series statistics, so the operator is self-calibrating per key.
   *
   * The sequential-looking recurrence is windowable: with prefix sums
   * P_i = Σ_{j≤i} d_j (P_0 = 0), S_i = P_i − min(0, min_{j≤i} P_j) —
   * so ONE pass (running sum + running min) replaces the per-row loop,
   * which is what makes the operator distributable at all.
   *
   * Exactness: deviations are DECIMAL(18,6) (6-dp-rounded values minus a
   * 6-dp-rounded reference), prefix sums and mins stay decimal (order
   * independent — associative decimal adds), the threshold compare is
   * decimal-vs-decimal, and the exported peak statistic is scaled to an
   * int64 micro-unit rather than cast to double. The μ/σ pass is the
   * [[Standardize.zScores]] 6-dp-decimal moment pattern, joined back by
   * entity key (an equi-join — no broadcast-nested-loop anywhere).
   */
  def cusum(events: DataFrame, entityCol: String, idCol: String,
            tsCol: String, valueCol: String, slack: Double = 0.5,
            hSigma: Double = 5.0): DataFrame = {
    require(hSigma > 0, s"hSigma must be positive: $hSigma")
    require(slack >= 0, s"slack must be nonnegative: $slack")
    val v = col(valueCol).cast(DoubleType)
    val base = events.select(col(entityCol), col(idCol),
      unix_micros(col(tsCol)).as("graft_tus"),
      round(v, 6).cast(DecimalType(18, 6)).as("graft_rv"))
    val stats = base.groupBy(col(entityCol)).agg(
      count(lit(1)).as("graft_n"),
      sum(col("graft_rv")).as("graft_s1"),
      sum(round(col("graft_rv").cast(DoubleType) *
        col("graft_rv").cast(DoubleType), 6).cast(DecimalType(38, 6)))
        .as("graft_s2"))
    val mean = col("graft_s1").cast(DoubleType) / col("graft_n")
    val variance = greatest(
      col("graft_s2").cast(DoubleType) / col("graft_n") - mean * mean,
      lit(0.0))
    val withRef = base.join(
      stats.select(col(entityCol),
        round(mean + lit(slack) * sqrt(variance), 6)
          .cast(DecimalType(18, 6)).as("graft_ref"),
        round(lit(hSigma) * sqrt(variance), 6)
          .cast(DecimalType(18, 6)).as("graft_h")),
      Seq(entityCol))
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col("graft_tus"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = withRef
      .withColumn("graft_p",
        sum(col("graft_rv") - col("graft_ref")).over(w))
      .withColumn("graft_s",
        col("graft_p") - least(lit(BigDecimal(0).setScale(6)),
          min(col("graft_p")).over(w)))
      .withColumn("graft_alarm", col("graft_s") > col("graft_h"))
    scored.groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("graft_alarm"), 1L).otherwise(0L)).cast(LongType)
          .as("n_alarms"),
        min(when(col("graft_alarm"), col("graft_tus"))).as("first_alarm_us"),
        (max(col("graft_s")) * lit(1000000)).cast(LongType)
          .as("peak_s_micros"))
  }

  /**
   * Trailing-window distinct actives: for every UTC day, how many
   * distinct entities were active in the trailing `windowDays` days —
   * the rolling-DAU/WAU metric. Distinct-over-sliding-window does NOT
   * decompose into per-day counts (a user active twice in the window
   * must count once), and the textbook fix is this bounded fan-out: each
   * distinct (entity, day) contributes itself to the `windowDays` target
   * days it stays visible in, then one distinct-agg per target day.
   *
   * Shape: one (entity, day) distinct — map-side combinable, collapsing
   * the event log — a ×windowDays explode (bounded by the parameter, not
   * the data), and one count-distinct agg keyed by day. Target days past
   * the corpus's last day are cut by a 1-row max-day broadcast
   * (metadata-scale, the q113 decayed-score shape). Day arithmetic is
   * int64-exact.
   */
  def slidingActive(events: DataFrame, entityCol: String, tsCol: String,
                    windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    val day = call_function("div", unix_micros(col(tsCol)),
      lit(86400000000L))
    val entityDays = events
      .select(col(entityCol), day.as("graft_day")).distinct()
    val maxDay = entityDays.agg(max(col("graft_day")).as("graft_mxd"))
    entityDays
      .select(col(entityCol), explode(sequence(col("graft_day"),
        col("graft_day") + lit(windowDays - 1L))).as("day"))
      .join(broadcast(maxDay))
      .filter(col("day") <= col("graft_mxd"))
      .groupBy(col("day"))
      .agg(countDistinct(col(entityCol)).as("n_active"))
  }

  /**
   * Theil–Sen robust trend per entity (Theil 1950; Sen 1968): the
   * LOWER MEDIAN of pairwise slopes between the entity's per-bucket
   * mean values — the outlier-resistant alternative to OLS slope
   * ([[Standardize.groupOls]]) with a 29% breakdown point; one wild
   * day can't flip the trend sign.
   *
   * The pair fan-out is over BUCKETS (days), not events: an entity with
   * a year of daily aggregates costs ~66k pairs regardless of event
   * volume, and pairs join on the entity key (equi-join reusing the
   * aggregate's partitioning — no theta-join). The lower median is an
   * exact row_number selection at position ⌈n/2⌉ — no interpolation, so
   * no (a+b)/2 association to match across engines. Bucket means are
   * 6-dp-decimal sums / int64 counts; slopes divide those identical
   * doubles by exact int64 day deltas; the selection order
   * (slope, day pair) is total.
   */
  def theilSen(events: DataFrame, entityCol: String, tsCol: String,
               valueCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    val day = call_function("div", unix_micros(col(tsCol)), lit(bucketUs))
    val daily = events
      .select(col(entityCol), day.as("graft_day"),
        round(col(valueCol).cast(DoubleType), 6)
          .cast(DecimalType(18, 6)).as("graft_rv"))
      .groupBy(col(entityCol), col("graft_day"))
      .agg(sum(col("graft_rv")).as("graft_sy"),
        count(lit(1)).as("graft_c"))
    val a = daily.select(col(entityCol), col("graft_day").as("graft_d1"),
      col("graft_sy").as("graft_sy1"), col("graft_c").as("graft_c1"))
    val b = daily.select(col(entityCol), col("graft_day").as("graft_d2"),
      col("graft_sy").as("graft_sy2"), col("graft_c").as("graft_c2"))
    // Each pair slope (ȳ2−ȳ1)/(d2−d1) is carried as the exact rational
    // num/den (num DECIMAL-scale-6, den positive int): the double form
    // orders the pairs (correctly-rounded division — engine-identical),
    // and the selected median is emitted via ExactRound in micro-units,
    // so the hashed value can never sit on a half-boundary tie.
    val pairs = a.join(b, Seq(entityCol))
      .filter(col("graft_d2") > col("graft_d1"))
      .withColumn("graft_num",
        col("graft_sy2") * col("graft_c1") - col("graft_sy1") * col("graft_c2"))
      .withColumn("graft_den",
        col("graft_c1") * col("graft_c2") *
          (col("graft_d2") - col("graft_d1")))
      .withColumn("graft_slope",
        (col("graft_num") * lit(1000000L)).cast(LongType).cast(DoubleType) /
          col("graft_den").cast(DoubleType))
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col("graft_slope"), col("graft_d1"), col("graft_d2"))
    val counted = pairs
      .withColumn("graft_rn", row_number().over(w))
      .withColumn("graft_np",
        count(lit(1)).over(Window.partitionBy(col(entityCol))))
    counted
      .filter(col("graft_rn") ===
        call_function("div", col("graft_np") + 1, lit(2L)))
      .select(col(entityCol), col("graft_np").as("n_pairs"),
        ExactRound.microOfRatio(col("graft_num"), col("graft_den"))
          .as("slope_micro"))
  }

  /** Per-(entity, bucket) closing value: the LAST observation in the
    * bucket by the total (ts, id) order — the shared first stage of the
    * return-based statistics below. */
  private def bucketCloses(events: DataFrame, entityCol: String,
                           idCol: String, tsCol: String, valueCol: String,
                           bucketUs: Long): DataFrame = {
    val bucket = call_function("div", unix_micros(col(tsCol)), lit(bucketUs))
    val w = Window.partitionBy(col(entityCol), col("graft_bucket"))
      .orderBy(unix_micros(col(tsCol)).desc, col(idCol).desc)
    events
      .withColumn("graft_bucket", bucket)
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .select(col(entityCol), col("graft_bucket"),
        col(valueCol).cast(DoubleType).as("graft_close"))
  }

  /**
   * Realized volatility per entity: the population standard deviation of
   * log returns between consecutive observed bucket closes — the risk
   * metric of the reference's crypto domain, next to [[twap]]'s level
   * average. Returns are ln(close_t / close_{t−1}) over OBSERVED buckets
   * (no gap filling — a missing day contributes one longer-horizon
   * return, the standard convention for irregular series).
   *
   * Determinism: the ln of an identical IEEE ratio is the proven
   * Spark-log ↔ DuckDB-ln idiom; each return and its square round to
   * 6 dp and accumulate as decimals (order-free); the variance clamp at
   * zero keeps both engines off NaN on constant series. Shape: one
   * (entity, bucket) window for closes, one lag window, one hash-agg —
   * all on one entity partitioning.
   */
  def volatility(events: DataFrame, entityCol: String, idCol: String,
                 tsCol: String, valueCol: String,
                 bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    val closes = bucketCloses(events, entityCol, idCol, tsCol, valueCol,
      bucketUs)
    val wLag = Window.partitionBy(col(entityCol)).orderBy(col("graft_bucket"))
    val r = col("graft_r")
    val returns = closes
      .withColumn("graft_prev", lag(col("graft_close"), 1).over(wLag))
      // a log return is UNDEFINED off a non-positive close (ln(0) is
      // -inf here and an ERROR in DuckDB — the sf0.1 audit caught a
      // 0-value close): both endpoints must be > 0, and the filter runs
      // AFTER the lag so the zero close still separates its neighbors'
      // returns identically in both engines
      .filter(col("graft_prev").isNotNull &&
        col("graft_prev") > 0 && col("graft_close") > 0)
      .withColumn("graft_r", log(col("graft_close") / col("graft_prev")))
    val mean = col("graft_s1").cast(DoubleType) / col("n_returns")
    val variance = greatest(
      col("graft_s2").cast(DoubleType) / col("n_returns") - mean * mean,
      lit(0.0))
    // mean return: Σr̂/n is an exact rational (r̂ 6-dp decimals) →
    // ExactRound micro-units, never a half-boundary tie. volatility's
    // sqrt is irrational and correctly rounded — safe as a double.
    returns.groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_returns"),
        sum(round(r, 6).cast(DecimalType(18, 6))).as("graft_s1"),
        sum(round(r * r, 6).cast(DecimalType(28, 6))).as("graft_s2"))
      .select(col(entityCol), col("n_returns"),
        ExactRound.microOfRatio(col("graft_s1"), col("n_returns"))
          .as("mean_return_micro"),
        round(sqrt(variance), 6).as("volatility"))
  }

  /**
   * Maximum drawdown per entity: the worst peak-to-trough loss fraction
   * 1 − close/runmax over the bucket-close series — the other half of
   * the risk picture ([[volatility]] measures wiggle, drawdown measures
   * pain). One running-max window over the closes; drawdowns are
   * identical IEEE ratios in both engines, rounded at the output.
   */
  def maxDrawdown(events: DataFrame, entityCol: String, idCol: String,
                  tsCol: String, valueCol: String,
                  bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    val closes = bucketCloses(events, entityCol, idCol, tsCol, valueCol,
      bucketUs)
    val wRun = Window.partitionBy(col(entityCol)).orderBy(col("graft_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    closes
      .withColumn("graft_peak", max(col("graft_close")).over(wRun))
      .withColumn("graft_dd",
        lit(1.0) - col("graft_close") / col("graft_peak"))
      .groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_buckets"),
        round(max(col("graft_dd")), 6).as("max_drawdown"),
        round(max(col("graft_close")), 6).as("peak_close"))
  }
}
