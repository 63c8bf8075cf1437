package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Resample, Timeline}
import graft.sources.Sources

/** Round-7 timeline operators: linear-interpolation resampling,
  * time-weighted averages, interval-union coverage, and CUSUM change
  * detection over the events stream — each a one-window + one-agg shape
  * with a DuckDB oracle reproducing the arithmetic exactly. */
object TimelineQueries {

  // ── q159: linear-interpolation resample ────────────────────────────────

  /** q159: per-user DAILY grid with gap ticks linearly interpolated
    * between the surrounding observations — the continuous-metric
    * resampler next to q151's step-function forward fill. */
  def q159Interpolate(s: SparkSession, dir: String): DataFrame =
    Resample.interpolate(Sources.events(s, dir), "user_id",
        "event_id", "ts", "value", bucketUs = 86400000000L)
      .orderBy(col("user_id"), col("bucket"))

  val q159Sql: String =
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
      |         FROM sp),
      |j AS (SELECT g.user_id, g.bucket, o.obs
      |      FROM grid g LEFT JOIN obs o
      |        ON g.user_id = o.user_id AND g.bucket = o.bucket),
      |f AS (SELECT user_id, bucket, obs,
      |        last_value(obs IGNORE NULLS) OVER wb AS v0,
      |        last_value(CASE WHEN obs IS NOT NULL THEN bucket END
      |          IGNORE NULLS) OVER wb AS pb,
      |        first_value(obs IGNORE NULLS) OVER wf AS v1,
      |        first_value(CASE WHEN obs IS NOT NULL THEN bucket END
      |          IGNORE NULLS) OVER wf AS nb
      |      FROM j
      |      WINDOW wb AS (PARTITION BY user_id ORDER BY bucket
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |        wf AS (PARTITION BY user_id ORDER BY bucket
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, bucket,
      |  round(CASE WHEN obs IS NOT NULL THEN obs
      |    ELSE v0 + (v1 - v0) * (CAST(bucket - pb AS DOUBLE)
      |      / CAST(nb - pb AS DOUBLE)) END, 6) AS value,
      |  obs IS NOT NULL AS is_observed
      |FROM f ORDER BY user_id, bucket""".stripMargin

  // ── q160: time-weighted average ────────────────────────────────────────

  /** q160: per-user TWAP of `value` — each observation weighted by its
    * time in force (gap to the next event); the irregular-sampling
    * average a plain AVG gets wrong. */
  def q160Twap(s: SparkSession, dir: String): DataFrame =
    Timeline.twap(Sources.events(s, dir), "user_id", "event_id",
        "ts", "value")
      .orderBy(col("user_id"))

  val q160Sql: String =
    """WITH e AS (SELECT event_id, user_id, value,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) AS tus FROM events),
      |g AS (SELECT user_id, value,
      |        lead(tus) OVER (PARTITION BY user_id
      |          ORDER BY tus, event_id) - tus AS gap
      |      FROM e),
      |s AS (SELECT user_id, count(*) AS n_weighted,
      |        CAST(SUM(gap) AS BIGINT) AS sw,
      |        SUM(CAST(round(value * (CAST(gap AS DOUBLE) / 1000000.0), 6)
      |          AS DECIMAL(38,6))) AS swv
      |      FROM g WHERE gap IS NOT NULL GROUP BY user_id)
      |SELECT user_id, n_weighted,
      |  round(CAST(sw AS DOUBLE) / 1000000.0, 6) AS span_s,
      |  CASE WHEN sw > 0 THEN round(CAST(swv AS DOUBLE)
      |    / (CAST(sw AS DOUBLE) / 1000000.0), 6) END AS twap
      |FROM s ORDER BY user_id""".stripMargin

  // ── q161: interval-union coverage ──────────────────────────────────────

  /** q161: per-user active-time coverage — each event holds a 5-minute
    * interval open; overlapping/touching intervals merge (islands via
    * running max-end), reporting exactly-covered microseconds. */
  def q161Coverage(s: SparkSession, dir: String): DataFrame =
    Timeline.intervalCoverage(Sources.events(s, dir), "user_id",
        "event_id", "ts", holdUs = 300000000L)
      .orderBy(col("user_id"))

  val q161Sql: String =
    """WITH e AS (SELECT event_id, user_id,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) AS tus FROM events),
      |o AS (SELECT user_id, event_id, tus,
      |        tus + 300000000 AS en FROM e),
      |m AS (SELECT user_id, event_id, tus, en,
      |        CASE WHEN tus > coalesce(max(en) OVER (PARTITION BY user_id
      |            ORDER BY tus, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |          -9223372036854775808) THEN 1 ELSE 0 END AS nw
      |      FROM o),
      |i AS (SELECT user_id, tus, en,
      |        CAST(SUM(nw) OVER (PARTITION BY user_id
      |          ORDER BY tus, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          AS BIGINT) AS island
      |      FROM m),
      |r AS (SELECT user_id, island, min(tus) AS st, max(en) AS fin,
      |        count(*) AS n
      |      FROM i GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_islands,
      |  CAST(SUM(fin - st) AS BIGINT) AS covered_us,
      |  max(fin - st) AS max_island_us,
      |  CAST(SUM(n) AS BIGINT) AS n_events
      |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin

  // ── q162: CUSUM change detection ───────────────────────────────────────

  /** q162: per-user one-sided CUSUM over `value` (slack 0.5σ, threshold
    * 5σ) via the prefix-sum − running-min identity — decimal-exact
    * running statistic, alarms counted and located. */
  def q162Cusum(s: SparkSession, dir: String): DataFrame =
    Timeline.cusum(Sources.events(s, dir), "user_id", "event_id",
        "ts", "value", slack = 0.5, hSigma = 5.0)
      .orderBy(col("user_id"))

  val q162Sql: String =
    """WITH e AS (SELECT event_id, user_id,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) AS tus,
      |    CAST(round(value, 6) AS DECIMAL(18,6)) AS rv FROM events),
      |st AS (SELECT user_id, count(*) AS n,
      |         SUM(rv) AS s1,
      |         SUM(CAST(round(CAST(rv AS DOUBLE) * CAST(rv AS DOUBLE), 6)
      |           AS DECIMAL(38,6))) AS s2
      |       FROM e GROUP BY user_id),
      |rf AS (SELECT user_id,
      |         CAST(round(CAST(s1 AS DOUBLE) / n + 0.5 * sqrt(GREATEST(
      |           CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
      |             * (CAST(s1 AS DOUBLE) / n), 0.0)), 6)
      |           AS DECIMAL(18,6)) AS ref,
      |         CAST(round(5.0 * sqrt(GREATEST(
      |           CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
      |             * (CAST(s1 AS DOUBLE) / n), 0.0)), 6)
      |           AS DECIMAL(18,6)) AS h
      |       FROM st),
      |p AS (SELECT e.user_id, e.tus, e.event_id, rf.h,
      |        SUM(e.rv - rf.ref) OVER (PARTITION BY e.user_id
      |          ORDER BY e.tus, e.event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pf
      |      FROM e JOIN rf ON e.user_id = rf.user_id),
      |q AS (SELECT user_id, tus, h, pf,
      |        MIN(pf) OVER (PARTITION BY user_id ORDER BY tus, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
      |      FROM p),
      |sc AS (SELECT user_id, tus, h,
      |         pf - LEAST(CAST(0 AS DECIMAL(38,6)), mn) AS sv
      |       FROM q)
      |SELECT user_id, count(*) AS n_events,
      |  CAST(SUM(CASE WHEN sv > h THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_alarms,
      |  min(CASE WHEN sv > h THEN tus END) AS first_alarm_us,
      |  CAST(max(sv) * 1000000 AS BIGINT) AS peak_s_micros
      |FROM sc GROUP BY user_id ORDER BY user_id""".stripMargin

  // ── q170: trailing-window distinct actives ─────────────────────────────

  /** q170: rolling 7-day distinct active users per UTC day — the WAU
    * curve; bounded ×7 fan-out of the (user, day) distinct set, one
    * count-distinct per day, max-day bound broadcast. */
  def q170SlidingActive(s: SparkSession, dir: String): DataFrame =
    Timeline.slidingActive(Sources.events(s, dir), "user_id", "ts",
        windowDays = 7)
      .orderBy(col("day"))

  val q170Sql: String =
    """WITH d AS (SELECT DISTINCT user_id,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) // 86400000000 AS day
      |  FROM events),
      |mx AS (SELECT max(day) AS mxd FROM d),
      |t AS (SELECT user_id,
      |        unnest(generate_series(day, day + 6)) AS day2 FROM d)
      |SELECT t.day2 AS day, count(DISTINCT t.user_id) AS n_active
      |FROM t, mx WHERE t.day2 <= mx.mxd
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ── q171: Theil–Sen robust trend ───────────────────────────────────────

  /** q171: per-user Theil–Sen slope over daily mean values — the lower
    * median of pairwise day slopes (exact row_number selection, no
    * interpolation); pair fan-out bounded by days², equi-joined on the
    * user key. */
  def q171TheilSen(s: SparkSession, dir: String): DataFrame =
    Timeline.theilSen(Sources.events(s, dir), "user_id", "ts", "value",
        bucketUs = 86400000000L)
      .orderBy(col("user_id"))

  val q171Sql: String =
    """WITH e AS (SELECT user_id,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) // 86400000000 AS day,
      |    CAST(round(value, 6) AS DECIMAL(18,6)) AS rv FROM events),
      |g AS (SELECT user_id, day, SUM(rv) AS sy, count(*) AS c
      |      FROM e GROUP BY 1, 2),
      |p AS (SELECT a.user_id, a.day AS d1, b.day AS d2,
      |        CAST((b.sy * a.c - a.sy * b.c) * 1000000 AS BIGINT) AS num,
      |        a.c * b.c * (b.day - a.day) AS den
      |      FROM g a JOIN g b ON a.user_id = b.user_id AND b.day > a.day),
      |r AS (SELECT user_id, num, den,
      |        row_number() OVER (PARTITION BY user_id
      |          ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE), d1, d2)
      |          AS rn,
      |        count(*) OVER (PARTITION BY user_id) AS np
      |      FROM p)
      |SELECT user_id, CAST(np AS BIGINT) AS n_pairs,
      |  CASE WHEN num < 0 THEN -((2 * (-num) + den) // (2 * den))
      |       ELSE (2 * num + den) // (2 * den) END AS slope_micro
      |FROM r WHERE rn = (np + 1) // 2 ORDER BY user_id""".stripMargin

  // ── q176: realized volatility ──────────────────────────────────────────

  /** q176: per-user realized volatility — population std of log returns
    * between consecutive daily closes; decimal moment sums over
    * 6-dp-rounded returns. */
  def q176Volatility(s: SparkSession, dir: String): DataFrame =
    Timeline.volatility(Sources.events(s, dir), "user_id", "event_id",
        "ts", "value", bucketUs = 86400000000L)
      .orderBy(col("user_id"))

  val q176Sql: String =
    """WITH e AS (SELECT user_id, event_id, value,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) AS tus FROM events),
      |c AS (SELECT user_id, tus // 86400000000 AS bucket, value AS close
      |      FROM e
      |      QUALIFY row_number() OVER (PARTITION BY user_id,
      |        tus // 86400000000 ORDER BY tus DESC, event_id DESC) = 1),
      |p AS (SELECT user_id, close,
      |        lag(close) OVER (PARTITION BY user_id ORDER BY bucket)
      |          AS prev
      |      FROM c),
      |r AS (SELECT user_id, ln(close / prev) AS r FROM p
      |      WHERE prev IS NOT NULL AND prev > 0 AND close > 0),
      |s AS (SELECT user_id, count(*) AS n_returns,
      |        SUM(CAST(round(r, 6) AS DECIMAL(18,6))) AS s1,
      |        SUM(CAST(round(r * r, 6) AS DECIMAL(28,6))) AS s2
      |      FROM r GROUP BY user_id),
      |t AS (SELECT user_id, n_returns,
      |        CAST(s1 * 1000000 AS BIGINT) AS sm, s1, s2
      |      FROM s)
      |SELECT user_id, n_returns,
      |  CASE WHEN sm < 0 THEN -((2 * (-sm) + n_returns) // (2 * n_returns))
      |       ELSE (2 * sm + n_returns) // (2 * n_returns)
      |  END AS mean_return_micro,
      |  round(sqrt(GREATEST(CAST(s2 AS DOUBLE) / n_returns
      |    - (CAST(s1 AS DOUBLE) / n_returns)
      |      * (CAST(s1 AS DOUBLE) / n_returns), 0.0)), 6) AS volatility
      |FROM t ORDER BY user_id""".stripMargin

  // ── q177: maximum drawdown ─────────────────────────────────────────────

  /** q177: per-user worst peak-to-trough loss over daily closes — one
    * running-max window; the pain metric next to q176's wiggle. */
  def q177Drawdown(s: SparkSession, dir: String): DataFrame =
    Timeline.maxDrawdown(Sources.events(s, dir), "user_id", "event_id",
        "ts", "value", bucketUs = 86400000000L)
      .orderBy(col("user_id"))

  val q177Sql: String =
    """WITH e AS (SELECT user_id, event_id, value,
      |    CAST(epoch_ns(ts) // 1000 AS BIGINT) AS tus FROM events),
      |c AS (SELECT user_id, tus // 86400000000 AS bucket, value AS close
      |      FROM e
      |      QUALIFY row_number() OVER (PARTITION BY user_id,
      |        tus // 86400000000 ORDER BY tus DESC, event_id DESC) = 1),
      |d AS (SELECT user_id, close,
      |        max(close) OVER (PARTITION BY user_id ORDER BY bucket
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      |      FROM c)
      |SELECT user_id, count(*) AS n_buckets,
      |  round(max(1.0 - close / peak), 6) AS max_drawdown,
      |  round(max(close), 6) AS peak_close
      |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin
}
