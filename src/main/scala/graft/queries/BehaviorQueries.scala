package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Funnel, Histogram, Profiling}
import graft.sources.Sources

/** Round-6 behavioral-analytics and data-quality operators: activity
  * streaks (gaps-and-islands), functional-dependency audits, deterministic
  * ingestion rate limiting, and classifier calibration bins — the
  * observe-the-producers layer over the events/documents/embeddings
  * tables, each with a DuckDB oracle reproducing the arithmetic exactly. */
object BehaviorQueries {

  // ── q138: per-user activity streaks ────────────────────────────────────

  /** q138: longest/total daily-activity streaks per user — the
    * gaps-and-islands engagement summary; one distinct + two user-keyed
    * aggs sharing a partitioning, window bounded by active days. */
  def q138Streaks(s: SparkSession, dir: String): DataFrame =
    Funnel.activityStreaks(Sources.events(s, dir), "user_id", "ts")
      .orderBy(col("user_id"))

  val q138Sql: String =
    """WITH d AS (SELECT DISTINCT user_id,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) // 86400000000 AS day
      |  FROM events),
      |i AS (SELECT user_id, day,
      |        day - row_number() OVER (PARTITION BY user_id ORDER BY day)
      |          AS island
      |      FROM d),
      |r AS (SELECT user_id, island, count(*) AS len, min(day) AS st
      |      FROM i GROUP BY 1, 2)
      |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
      |  COUNT(*) AS n_streaks, MAX(len) AS max_streak,
      |  MAX(len * 1000000000 + st) % 1000000000 AS best_streak_start_day
      |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin

  // ── q139: functional-dependency audit ──────────────────────────────────

  /** q139: sources violating "source determines lang" — the
    * data-quality constraint audit, one hash agg with two-phase
    * distinct; min/max langs ride along as conflict witnesses. */
  def q139FdAudit(s: SparkSession, dir: String): DataFrame =
    Profiling.fdViolations(Sources.documents(s, dir), Seq("source"), "lang")
      .orderBy(col("source"))

  val q139Sql: String =
    """SELECT source, count(*) AS n_rows,
      |  count(DISTINCT lang) AS n_distinct_rhs,
      |  min(lang) AS rhs_min, max(lang) AS rhs_max
      |FROM documents GROUP BY source
      |HAVING count(DISTINCT lang) > 1
      |ORDER BY source""".stripMargin

  // ── q140: deterministic rate limiting ──────────────────────────────────

  /** q140: at most 3 events kept per (user, UTC hour), earliest first —
    * the producer-capping primitive; WindowGroupLimit cuts floods
    * map-side before the shuffle. */
  def q140RateLimit(s: SparkSession, dir: String): DataFrame =
    Funnel.rateLimit(Sources.events(s, dir), "user_id", "event_id", "ts",
        bucketUs = 3600000000L, k = 3)
      .select(col("event_id"), col("user_id"),
        col("rl_bucket").as("hour_bucket"))
      .orderBy(col("event_id"))

  val q140Sql: String =
    """WITH e AS (SELECT event_id, user_id,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) AS tus FROM events)
      |SELECT event_id, user_id, tus // 3600000000 AS hour_bucket
      |FROM e
      |QUALIFY row_number() OVER (PARTITION BY user_id, tus // 3600000000
      |  ORDER BY tus, event_id) <= 3
      |ORDER BY event_id""".stripMargin

  // ── q141: calibration bins (reliability diagram) ───────────────────────

  /** q141: 16-bin reliability diagram of a score (first embedding
    * component, quantized to 10^-6) against a binary label — per bin:
    * count, positives, empirical rate, mean score; int64-exact sums,
    * fixed [-1e6, 1e6] domain so partial diagrams merge. */
  def q141Calibration(s: SparkSession, dir: String): DataFrame = {
    val e = Sources.embeddings(s, dir).select(
      round(element_at(col("embedding"), 1).cast(DoubleType) * 1000000.0, 0)
        .cast(LongType).as("q"),
      when(col("label") <= 4, 1L).otherwise(0L).as("pos"))
    Histogram.calibrationBins(e, "q", "pos", bits = 4,
        mn = -1000000L, mx = 1000000L)
      .orderBy(col("bucket"))
  }

  val q141Sql: String =
    """WITH q AS (SELECT
      |    CAST(round(embedding[1]::DOUBLE * 1000000.0, 0) AS BIGINT) AS q,
      |    CASE WHEN label <= 4 THEN 1 ELSE 0 END AS pos
      |  FROM embeddings),
      |c AS (SELECT LEAST(GREATEST(q, -1000000), 1000000) AS cq, pos FROM q),
      |b AS (SELECT ((cq + 1000000) * 15) // 2000000 AS bucket, cq, pos
      |      FROM c)
      |SELECT bucket, count(*) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
      |  round(CAST(SUM(pos) AS DOUBLE) / count(*), 6) AS pos_rate,
      |  round(CAST(SUM(cq) AS DOUBLE) / count(*), 6) AS mean_score_q
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  // ── q149: inter-event burstiness ───────────────────────────────────────

  /** q149: per-user inter-arrival gap stats and the Goh–Barabási
    * burstiness index — one lag window + one hash-agg; Σgap² through
    * the 6-dp-decimal sum rule. */
  def q149Burstiness(s: SparkSession, dir: String): DataFrame =
    Funnel.burstiness(Sources.events(s, dir), "user_id", "event_id", "ts")
      .orderBy(col("user_id"))

  val q149Sql: String =
    """WITH e AS (SELECT event_id, user_id,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) AS tus FROM events),
      |g AS (SELECT user_id,
      |        tus - lag(tus) OVER (PARTITION BY user_id
      |          ORDER BY tus, event_id) AS gap
      |      FROM e),
      |s AS (SELECT user_id, count(*) AS n_gaps,
      |        CAST(SUM(gap) AS BIGINT) AS s1,
      |        SUM(CAST(round(CAST(gap AS DOUBLE) * gap, 6)
      |          AS DECIMAL(38,6))) AS s2
      |      FROM g WHERE gap IS NOT NULL GROUP BY user_id),
      |m AS (SELECT user_id, n_gaps, s1,
      |        CAST(s1 AS DOUBLE) / n_gaps AS mean,
      |        sqrt(GREATEST(CAST(s2 AS DOUBLE) / n_gaps
      |          - (CAST(s1 AS DOUBLE) / n_gaps)
      |            * (CAST(s1 AS DOUBLE) / n_gaps), 0.0)) AS std
      |      FROM s)
      |SELECT user_id, n_gaps,
      |  (2 * s1 + n_gaps) // (2 * n_gaps) AS mean_gap_us,
      |  round(std / 1000000.0, 6) AS std_gap_s,
      |  CASE WHEN std + mean > 0.0
      |    THEN round((std - mean) / (std + mean), 6) END AS burstiness
      |FROM m ORDER BY user_id""".stripMargin

  // ── q151: time-series resample + forward fill ──────────────────────────

  /** q151: per-user DAILY state grid with the last observed `value`
    * carried across gaps — the as-of-every-tick view; grid fan-out
    * bounded by span/bucket, one entity-keyed window fill. */
  def q151ForwardFill(s: SparkSession, dir: String): DataFrame =
    graft.operators.Resample.forwardFill(Sources.events(s, dir), "user_id",
        "event_id", "ts", "value", bucketUs = 86400000000L)
      .orderBy(col("user_id"), col("bucket"))

  val q151Sql: String =
    """WITH e AS (SELECT event_id, user_id, value,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) AS tus FROM events),
      |b AS (SELECT user_id, value, tus, event_id,
      |        tus // 86400000000 AS bucket FROM e),
      |obs AS (SELECT user_id, bucket, value AS obs FROM b
      |        QUALIFY row_number() OVER (PARTITION BY user_id, bucket
      |          ORDER BY tus DESC, event_id DESC) = 1),
      |sp AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
      |       FROM b GROUP BY user_id),
      |grid AS (SELECT user_id, unnest(generate_series(b0, b1)) AS bucket
      |         FROM sp)
      |SELECT g.user_id, g.bucket,
      |  last_value(o.obs IGNORE NULLS) OVER (PARTITION BY g.user_id
      |    ORDER BY g.bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
      |  o.obs IS NOT NULL AS is_observed
      |FROM grid g LEFT JOIN obs o
      |  ON g.user_id = o.user_id AND g.bucket = o.bucket
      |ORDER BY g.user_id, g.bucket""".stripMargin

  // ── q152: top behavior paths ───────────────────────────────────────────

  /** q152: the 15 most common consecutive event-type trigrams
    * (A→B→C paths) — one shared user window, one hash-agg, a
    * TakeOrderedAndProject cut. */
  def q152TopPaths(s: SparkSession, dir: String): DataFrame =
    Funnel.topPaths(Sources.events(s, dir), "user_id", "event_type",
        "ts", "event_id", k = 15)

  val q152Sql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) AS tus FROM events),
      |t AS (SELECT event_type AS t1,
      |        lead(event_type, 1) OVER w AS t2,
      |        lead(event_type, 2) OVER w AS t3
      |      FROM e
      |      WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
      |SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS n
      |FROM t WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 15""".stripMargin

  // ── q185: sequence-pattern matching ────────────────────────────────────

  /** q185: per-user count of view→(view|click)*→purchase motifs — the
    * MATCH_RECOGNIZE-style variable-length pattern scan over the
    * type-initial sequence; one hash-agg (struct array_sort gives the
    * total order, no window), regex scan per entity. */
  def q185PatternMatch(s: SparkSession, dir: String): DataFrame =
    Funnel.sequencePatternCounts(Sources.events(s, dir), "user_id",
        "event_type", "ts", "event_id", pattern = "v[vc]*p")
      .orderBy(col("user_id"))

  val q185Sql: String =
    """WITH e AS (SELECT user_id, substr(event_type, 1, 1) AS c,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) AS tus, event_id
      |  FROM events),
      |s AS (SELECT user_id,
      |        string_agg(c, '' ORDER BY tus, event_id) AS seq
      |      FROM e GROUP BY user_id)
      |SELECT user_id, CAST(length(seq) AS BIGINT) AS n_events,
      |  CAST(len(regexp_extract_all(seq, 'v[vc]*p')) AS BIGINT)
      |    AS n_matches
      |FROM s ORDER BY user_id""".stripMargin

  // ── q189: conversion latency by cohort ─────────────────────────────────

  /** q189: lower-median signup→purchase latency per signup-day cohort
    * — the funnel's earliest-completion times fed through the exact
    * row-selection median (no interpolation); int64 microseconds end
    * to end. */
  def q189ConversionLatency(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = Funnel.earliestCompletion(Sources.events(s, dir), "user_id",
      "event_type", "ts", Seq("signup", "purchase"))
    val lat = f.select(col("user_id"),
      to_date(col("t1")).as("cohort_day"),
      (unix_micros(col("t2")) - unix_micros(col("t1"))).as("graft_lat"))
    val w = Window.partitionBy(col("cohort_day"))
      .orderBy(col("graft_lat"), col("user_id"))
    lat
      .withColumn("graft_rn", row_number().over(w))
      .withColumn("graft_np",
        count(lit(1)).over(Window.partitionBy(col("cohort_day"))))
      .filter(col("graft_rn") ===
        call_function("div", col("graft_np") + 1, lit(2L)))
      .select(col("cohort_day"), col("graft_np").as("n_converted"),
        call_function("div", col("graft_lat"), lit(1000000L))
          .as("median_latency_s"))
      .orderBy(col("cohort_day"))
  }

  val q189Sql: String =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |            WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |       JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > s1.t1
      |       GROUP BY 1),
      |c AS (SELECT s1.user_id,
      |        CAST(s1.t1 AS DATE) AS cohort_day,
      |        (epoch_ns(s2.t2) - epoch_ns(s1.t1)) // 1000 AS lat
      |      FROM s1 JOIN s2 ON s1.user_id = s2.user_id),
      |r AS (SELECT cohort_day, user_id, lat,
      |        row_number() OVER (PARTITION BY cohort_day
      |          ORDER BY lat, user_id) AS rn,
      |        count(*) OVER (PARTITION BY cohort_day) AS np
      |      FROM c)
      |SELECT cohort_day, CAST(np AS BIGINT) AS n_converted,
      |  lat // 1000000 AS median_latency_s
      |FROM r WHERE rn = (np + 1) // 2
      |ORDER BY cohort_day""".stripMargin
}
