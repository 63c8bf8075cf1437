package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ordered funnel analysis — "how many users did s1, THEN s2, THEN s3" —
 * the product-analytics staple the events table exists for.
 *
 * A user completes the funnel iff events of each step type exist in
 * strictly increasing timestamp order. The computation is greedy
 * earliest-completion, which is exact: choosing the EARLIEST valid
 * timestamp for step i can only widen the choices for step i+1, so a
 * user is dropped iff no valid ordering exists.
 *
 * Scale shape: one user-keyed aggregation per step, and every join and
 * groupBy is keyed on the same user column — the per-step steps reuse
 * one hash-partitioning end to end (no exchange between steps under
 * ENSURE_REQUIREMENTS reuse). No per-user event arrays are collected,
 * no window over the event log is taken: state per user is just the k
 * completion timestamps. k steps cost k passes over the (step-filtered)
 * events — each pass's input is pre-filtered to ONE event type, so the
 * scan feeding each aggregation is a pushed-down predicate slice, not
 * the whole log.
 */
object Funnel {

  /** One row per user completing ALL `steps` in order: (userCol,
    * t1 … tk) with t1 < t2 < … < tk, each ti the earliest feasible
    * timestamp of step i given t(i−1). */
  def earliestCompletion(events: DataFrame, userCol: String, typeCol: String,
                         tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var reached = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    for (i <- 1 until steps.length) {
      // earlier completion times are constant per user — min() just
      // carries them through the aggregate
      val carry = (1 to i).map(j => min(col(s"t$j")).as(s"t$j"))
      val aggs = carry :+ min(col(tsCol)).as(s"t${i + 1}")
      reached = events.filter(col(typeCol) === steps(i))
        .join(reached, userCol)
        .filter(col(tsCol) > col(s"t$i"))
        .groupBy(col(userCol))
        .agg(aggs.head, aggs.tail: _*)
    }
    reached
  }

  /**
   * Cohort retention matrix: users are grouped by their first-seen date
   * (the cohort), and each (cohort, day_offset) cell counts users active
   * exactly `day_offset` days after their cohort date — the
   * retention-curve input of product analytics.
   *
   * Scale shape: one user-keyed aggregation for first-seen, one distinct
   * over (user, day) — both map-side combinable — and a user-keyed join
   * that reuses the first agg's partitioning; the matrix rollup groups
   * on (cohort, offset), whose cardinality is days², metadata-scale.
   */
  def retentionMatrix(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort"))
    val active = events.select(col(userCol), to_date(col(tsCol)).as("day"))
      .distinct()
    active.join(first, userCol)
      .groupBy(col("cohort"), datediff(col("day"), col("cohort"))
        .as("day_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /**
   * Event-type transition matrix: counts of consecutive (from → to)
   * event pairs per user's timeline — the Markov-chain view of user
   * behavior that feeds next-action models and anomaly detection. One
   * user-keyed window (lag) and one global count aggregation; ties at
   * equal timestamps break on `tiebreakCol` so the sequence (and the
   * matrix) is deterministic.
   */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, tiebreakCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tiebreakCol))
    events
      .withColumn("graft_prev", lag(col(typeCol), 1).over(w))
      .filter(col("graft_prev").isNotNull)
      .groupBy(col("graft_prev").as("from_type"),
        col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Funnel summary: (step_idx, step, n_users) — how many users reach
    * each prefix of the funnel. Step i's count re-derives steps 1..i
    * (k²/2 step-filtered aggregations total — fine for the handful of
    * steps funnels have; persist `events` upstream for long funnels). */
  def stepCounts(events: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, steps: Seq[String]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    steps.indices.map { i =>
      val n = earliestCompletion(events, userCol, typeCol, tsCol,
        steps.take(i + 1)).count()
      (i + 1, steps(i), n)
    }.toDF("step_idx", "step", "n_users")
  }

  /**
   * Last-touch attribution: each conversion event is credited to the
   * user's most recent preceding `sourceType` event within
   * `windowSec` seconds — the marketing-analytics primitive ("which
   * click gets the purchase"). Conversions with no in-window source stay
   * unattributed (NULL id / gap).
   *
   * One user-partitioned window pass with `last(..., ignoreNulls)` over
   * the running event log — no self-join of the event table on an
   * inequality, which is the O(n·m)-per-user trap. Ordering is
   * (ts, event id): a total order, so ties are deterministic.
   */
  def lastTouch(events: DataFrame, userCol: String, typeCol: String,
                tsCol: String, idCol: String, sourceType: String,
                convType: String, windowSec: Long): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive: $windowSec")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val tsSec = unix_micros(col(tsCol))
    val lastId = last(when(col(typeCol) === sourceType, col(idCol)),
      ignoreNulls = true).over(w)
    val lastTs = last(when(col(typeCol) === sourceType, tsSec),
      ignoreNulls = true).over(w)
    events
      .withColumn("graft_src_id", lastId)
      .withColumn("graft_gap",
        (tsSec - lastTs).cast(org.apache.spark.sql.types.LongType))
      .filter(col(typeCol) === convType)
      .select(col(idCol), col(userCol),
        when(col("graft_gap") <= windowSec * 1000000L, col("graft_src_id"))
          .as("attributed_id"),
        when(col("graft_gap") <= windowSec * 1000000L,
          call_function("div", col("graft_gap"), lit(1000000L)))
          .as("gap_s"))
  }
}
