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

  /**
   * Per-user activity streaks (gaps-and-islands over active DAYS): the
   * engagement summary behind "longest daily streak" features and
   * churn-risk signals. A streak is a maximal run of consecutive UTC
   * days on which the user produced at least one event; the classic
   * islands trick — `day − row_number(day)` is constant exactly within
   * a consecutive run — turns run detection into a plain groupBy, no
   * self-join on day±1.
   *
   * Scale shape: one distinct over (user, day) — map-side combinable,
   * collapsing the event log to at most users·days rows — then two
   * user-keyed aggregations that REUSE the same hash partitioning; the
   * only window is per-user over active days (bounded by days, not
   * events). Day = epoch-micros div 86400e6 (integer-exact, UTC).
   */
  def activityStreaks(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val day = call_function("div", unix_micros(col(tsCol)),
      lit(86400000000L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("graft_day"))
    events.select(col(userCol), day.as("graft_day")).distinct()
      .withColumn("graft_island",
        col("graft_day") - row_number().over(w))
      .groupBy(col(userCol), col("graft_island"))
      .agg(count(lit(1)).as("graft_len"), min(col("graft_day")).as("graft_st"))
      .groupBy(col(userCol))
      .agg(sum(col("graft_len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("graft_len")).as("max_streak"),
        // argmax via int64 encode (len, start-day both < 10^9): picks the
        // longest streak, latest start on ties — engine-portable, no
        // struct-ordering semantics to match
        max(col("graft_len") * lit(1000000000L) + col("graft_st"))
          .as("graft_best"))
      .select(col(userCol), col("n_active_days"), col("n_streaks"),
        col("max_streak"),
        pmod(col("graft_best"), lit(1000000000L)).as("best_streak_start_day"))
  }

  /**
   * Deterministic ingestion rate limiting: keep at most `k` events per
   * (`userCol`, fixed `bucketUs`-microsecond time bucket), earliest
   * first — the abuse-throttling / spam-capping primitive that bounds
   * any single producer's contribution to a training corpus.
   *
   * Order within a bucket is (ts, id) — a total order, so the kept set
   * is deterministic under ties. The `row_number ≤ k` filter compiles
   * to WindowGroupLimit: per-partition top-k heaps cut the stream
   * BEFORE the shuffle, so a hot key's flood dies map-side instead of
   * travelling the wire.
   */
  def rateLimit(events: DataFrame, userCol: String, idCol: String,
                tsCol: String, bucketUs: Long, k: Int): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    require(k >= 1, s"k must be >= 1: $k")
    val tus = unix_micros(col(tsCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol), col("rl_bucket"))
      .orderBy(col("graft_tus"), col(idCol))
    events
      .withColumn("graft_tus", tus)
      .withColumn("rl_bucket", call_function("div", tus, lit(bucketUs)))
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") <= k)
      .drop("graft_rn", "graft_tus")
  }

  /**
   * Top event-type paths of length 3: the most common consecutive
   * (A → B → C) behavior sequences across users — the path-mining step
   * behind "what do users actually do", one order of depth beyond
   * [[transitionMatrix]]'s bigrams.
   *
   * One user-partitioned window (two leads share it), one hash-agg with
   * map-side combine over ≤ |event types|³ keys, and a
   * TakeOrderedAndProject cut — no per-user sequence arrays, no
   * self-joins. Ordering is the total (ts, id) order; paths never span
   * users (leads are partition-bounded).
   */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
               tsCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("graft_tus"), col(idCol))
    events
      .select(col(userCol), col(typeCol), col(idCol),
        unix_micros(col(tsCol)).as("graft_tus"))
      .withColumn("graft_t2", lead(col(typeCol), 1).over(w))
      .withColumn("graft_t3", lead(col(typeCol), 2).over(w))
      // the head type must be checked too: concat_ws would silently SKIP
      // a NULL and count a malformed 2-segment "path"
      .filter(col(typeCol).isNotNull &&
        col("graft_t2").isNotNull && col("graft_t3").isNotNull)
      .groupBy(concat_ws(">", col(typeCol), col("graft_t2"),
        col("graft_t3")).as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /**
   * Sequence-pattern counting (the portable core of SQL MATCH_RECOGNIZE):
   * each entity's event-type sequence is rendered as an ordered string
   * of type initials and scanned with a regular expression — "how many
   * times did view → (views/clicks)* → purchase actually happen, per
   * user" — the behavioral-motif query that window functions alone
   * can't express for variable-length patterns.
   *
   * Ordering is deterministic WITHOUT a window: events collect as
   * (ts, id, initial) structs and array_sort's lexicographic struct
   * order is exactly the total (ts, id) order — one hash-agg, map-side
   * combinable, no WindowExec. Per-entity sequence length is bounded by
   * the entity's own events (cap upstream with [[rateLimit]] for
   * adversarial producers). The regex scan is leftmost, non-overlapping
   * in both engines.
   */
  def sequencePatternCounts(events: DataFrame, userCol: String,
                            typeCol: String, tsCol: String, idCol: String,
                            pattern: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    events
      .select(col(userCol), struct(
        unix_micros(col(tsCol)).as("t"), col(idCol).as("i"),
        substring(col(typeCol), 1, 1).as("c")).as("graft_e"))
      .groupBy(col(userCol))
      .agg(array_join(transform(array_sort(collect_list(col("graft_e"))),
        e => e.getField("c")), "").as("graft_seq"))
      .select(col(userCol),
        length(col("graft_seq")).cast(LongType).as("n_events"),
        size(regexp_extract_all(col("graft_seq"), lit(pattern), lit(0)))
          .cast(LongType).as("n_matches"))
  }

  /**
   * Per-user inter-event gap statistics and burstiness index
   * B = (σ−μ)/(σ+μ) over inter-arrival times (Goh & Barabási 2008):
   * B → −1 for metronome regularity, 0 for Poisson, → 1 for extreme
   * bursts — the behavioral fingerprint separating organic users from
   * schedulers and spam floods.
   *
   * Determinism: gaps are int64 microseconds (lag over the total
   * (ts, id) order); Σgap stays int64, Σgap² goes through the 6-dp
   * double-round → DECIMAL(38,6) sum (a gap² near 10²² needs the wide
   * decimal; order-independent, engine-portable). Population variance
   * is clamped at zero like [[Standardize.zScores]]; all-zero-gap users
   * (every event at one instant) get NULL burstiness via the guard, not
   * an engine-specific 0/0 NaN.
   *
   * Shape: one user-partitioned lag window + one map-side-combinable
   * hash-agg — no self-join of the event log.
   */
  def burstiness(events: DataFrame, userCol: String, idCol: String,
                 tsCol: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("graft_tus"), col(idCol))
    val g = col("graft_gap").cast(DoubleType)
    val gaps = events
      .select(col(userCol), col(idCol), unix_micros(col(tsCol)).as("graft_tus"))
      .withColumn("graft_gap",
        col("graft_tus") - lag(col("graft_tus"), 1).over(w))
      .filter(col("graft_gap").isNotNull)
    val mean = col("graft_s1").cast(DoubleType) / col("n_gaps")
    val variance = greatest(
      col("graft_s2").cast(DoubleType) / col("n_gaps") - mean * mean,
      lit(0.0))
    val std = sqrt(variance)
    // mean gap is reported in exact integer MICROSECONDS (= micro-units
    // of seconds): Σgap/n is an exact rational whose 6-dp double
    // rounding can land on engine-divergent half-boundary ties, so it
    // goes through ExactRound instead. std stays a seconds double: its
    // sqrt is irrational (never on a rounding boundary) and
    // division/sqrt are correctly rounded in both engines. The
    // dimensionless burstiness ratio uses the raw µs doubles (scale
    // cancels).
    gaps.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("graft_gap")).as("graft_s1"),
        sum(round(g * g, 6).cast(DecimalType(38, 6))).as("graft_s2"))
      .select(col(userCol), col("n_gaps"),
        ExactRound.halfAwayDiv(col("graft_s1"), col("n_gaps"))
          .as("mean_gap_us"),
        round(std / 1000000.0, 6).as("std_gap_s"),
        when(std + mean > 0.0,
          round((std - mean) / (std + mean), 6)).as("burstiness"))
  }
}
