package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.operators.{GlobalRank, Sessionize, VectorAggs}
import graft.sources.Sources

/**
 * Round-2 operator widening: multidimensional aggregation (CUBE /
 * grouping_id), exact percentiles, deterministic second-moment statistics,
 * time bucketing, sessionization, argmax aggregates, JSON extraction,
 * regexp functions, deterministic hash sampling, full-outer join,
 * correlated subqueries, ordered string aggregation, vector centroids and
 * IVF ANN, by-name union, and ntile bucketing — each with a DuckDB oracle.
 *
 * Determinism rules carried over from CoreQueries/PipelineQueries:
 * exact DECIMAL accumulation for anything summed, 6-dp rounding before any
 * score ranking, total ORDER BY with unique tiebreaks everywhere.
 */
object AnalyticsQueries {

  private def dsum(c: String): Column =
    sum(col(c).cast(DecimalType(18, 2))).cast(DoubleType)

  // ── q42: CUBE + grouping_id (multidimensional OLAP aggregation) ────────

  /** q42: CUBE over (returnflag, linestatus) with grouping_id — the full
    * 2^d lattice in one pass (Catalyst `Expand`: d+1 copies map-side, still
    * a single shuffle; no per-grouping rescan at scale). */
  def q42Cube(s: SparkSession, dir: String): DataFrame =
    Sources.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        dsum("l_quantity").as("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val q42Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  GROUPING(l_returnflag, l_linestatus) AS gid, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // ── q43: exact interpolated percentiles per group ──────────────────────

  /** q43: exact percentile (linear interpolation at p·(n-1)) per return
    * flag. Exact percentile needs the group sorted — fine per-group here;
    * at 100 TB swap in approx_percentile (t-digest) for the same API. */
  def q43Percentiles(s: SparkSession, dir: String): DataFrame =
    Sources.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_quantity"), lit(0.5)), 6).as("p50_qty"),
        round(percentile(col("l_quantity"), lit(0.9)), 6).as("p90_qty"),
        round(percentile(col("l_extendedprice"), lit(0.5)), 6).as("p50_price"),
        round(percentile(col("l_extendedprice"), lit(0.99)), 6).as("p99_price"))
      .orderBy(col("l_returnflag"))

  val q43Sql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
      |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
      |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price,
      |  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ── q44: second-moment statistics, exact two-pass ──────────────────────

  /**
   * q44: mean / variance / stddev / correlation per return flag, computed
   * as an exact two-pass: pass 1 takes the exact decimal mean, pass 2 sums
   * exact decimal squared deviations around it. Deviation sums are
   * order-independent (decimal), so results don't depend on partitioning —
   * and the small per-group mean table broadcasts back for pass 2. Output
   * scales (var 2 dp, std 4 dp, corr 6 dp) sit far above the one-ulp
   * decimal→double conversion noise, keeping the oracle hash exact.
   */
  def q44StatsMoments(s: SparkSession, dir: String): DataFrame = {
    val li = Sources.lineitem(s, dir)
    val d4 = DecimalType(18, 4)
    val means = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      round(sum(col("l_extendedprice").cast(d4)).cast(DoubleType) /
        count(lit(1)), 4).as("mean_price"),
      round(sum(col("l_quantity").cast(d4)).cast(DoubleType) /
        count(lit(1)), 4).as("mean_qty"))
    val dx = col("l_extendedprice").cast(d4) - col("mean_price").cast(d4)
    val dy = col("l_quantity").cast(d4) - col("mean_qty").cast(d4)
    li.join(broadcast(means), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        first(col("n")).as("n"),
        first(col("mean_price")).as("mean_price"),
        sum(dx * dx).cast(DoubleType).as("sxx"),
        sum(dy * dy).cast(DoubleType).as("syy"),
        sum(dx * dy).cast(DoubleType).as("sxy"))
      .select(col("l_returnflag"), col("n"), col("mean_price"),
        round(col("sxx") / (col("n") - 1), 2).as("var_price"),
        round(sqrt(col("sxx") / (col("n") - 1)), 4).as("std_price"),
        round(col("sxy") / sqrt(col("sxx") * col("syy")), 6).as("corr_price_qty"))
      .orderBy(col("l_returnflag"))
  }

  val q44Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
      |      / COUNT(*), 4) AS mean_price,
      |    round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
      |      / COUNT(*), 4) AS mean_qty
      |  FROM lineitem GROUP BY l_returnflag),
      |s AS (
      |  SELECT l.l_returnflag, m.n, m.mean_price,
      |    CAST(SUM((CAST(l.l_extendedprice AS DECIMAL(18,4))
      |        - CAST(m.mean_price AS DECIMAL(18,4)))
      |      * (CAST(l.l_extendedprice AS DECIMAL(18,4))
      |        - CAST(m.mean_price AS DECIMAL(18,4)))) AS DOUBLE) AS sxx,
      |    CAST(SUM((CAST(l.l_quantity AS DECIMAL(18,4))
      |        - CAST(m.mean_qty AS DECIMAL(18,4)))
      |      * (CAST(l.l_quantity AS DECIMAL(18,4))
      |        - CAST(m.mean_qty AS DECIMAL(18,4)))) AS DOUBLE) AS syy,
      |    CAST(SUM((CAST(l.l_extendedprice AS DECIMAL(18,4))
      |        - CAST(m.mean_price AS DECIMAL(18,4)))
      |      * (CAST(l.l_quantity AS DECIMAL(18,4))
      |        - CAST(m.mean_qty AS DECIMAL(18,4)))) AS DOUBLE) AS sxy
      |  FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
      |  GROUP BY l.l_returnflag, m.n, m.mean_price)
      |SELECT l_returnflag, n, mean_price,
      |  round(sxx / (n - 1), 2) AS var_price,
      |  round(sqrt(sxx / (n - 1)), 4) AS std_price,
      |  round(sxy / sqrt(sxx * syy), 6) AS corr_price_qty
      |FROM s ORDER BY l_returnflag""".stripMargin

  // ── q45: tumbling time-window aggregation ──────────────────────────────

  /** q45: 1-hour tumbling windows over event time via `window()` — the
    * same construct Structured Streaming uses with a watermark; batch form
    * here is a plain hash aggregation on the derived bucket. */
  def q45TimeBucket(s: SparkSession, dir: String): DataFrame =
    Sources.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"), dsum("value").as("total_value"))
      .select(col("w.start").as("bucket_start"), col("n_events"),
        col("total_value"))
      .orderBy(col("bucket_start"))

  val q45Sql: String =
    """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket_start,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ── q89: ordered funnel (view → click → purchase) ──────────────────────

  /** q89: users completing the view→click→purchase funnel in timestamp
    * order, with earliest-completion times — k user-keyed aggregations
    * sharing one hash-partitioning, no per-user event collection. */
  def q89Funnel(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.earliestCompletion(Sources.events(s, dir),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .orderBy(col("user_id"))

  val q89Sql: String =
    """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
      |            WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, MIN(s1.t1) AS t1, MIN(e.ts) AS t2
      |       FROM events e JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'click' AND e.ts > s1.t1
      |       GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, MIN(s2.t1) AS t1, MIN(s2.t2) AS t2,
      |              MIN(e.ts) AS t3
      |       FROM events e JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |       GROUP BY e.user_id)
      |SELECT user_id, t1, t2, t3 FROM s3 ORDER BY user_id""".stripMargin

  // ── q94: cohort retention matrix ───────────────────────────────────────

  /** q94: users bucketed by first-seen date, counted per day-offset of
    * later activity — the retention curve. Two map-side-combinable aggs
    * and a user-keyed join; the matrix itself is days², metadata-scale. */
  def q94Retention(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.retentionMatrix(Sources.events(s, dir),
        "user_id", "ts")
      .orderBy(col("cohort"), col("day_offset"))

  val q94Sql: String =
    """WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
      |           FROM events GROUP BY user_id),
      |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      |SELECT f.cohort,
      |  CAST(datediff('day', f.cohort, a.day) AS INTEGER) AS day_offset,
      |  COUNT(DISTINCT a.user_id) AS n_users
      |FROM a JOIN f ON a.user_id = f.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ── q102: normalization-aware exact dedup keys ─────────────────────────

  /** q102: canonical-form hash per document (lowercase, punctuation →
    * space, collapsed) plus the normalized length — the dedup key that
    * catches case/punctuation variants raw-text hashing misses. */
  def q102Normalize(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.withNormalized(
        Sources.documents(s, dir), "text")
      .select(col("doc_id"), col("norm_md5"), col("n_chars_norm"))
      .orderBy(col("doc_id"))

  val q102Sql: String =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_md5,
      |  length(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS n_chars_norm
      |FROM documents ORDER BY doc_id""".stripMargin

  // ── q103: event-type transition matrix ─────────────────────────────────

  /** q103: Markov transition counts over each user's event sequence
    * (event-id tiebreak at equal timestamps) — one user-keyed lag window
    * + one global count. */
  def q103Transitions(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.transitionMatrix(Sources.events(s, dir),
        "user_id", "event_type", "ts", "event_id")
      .orderBy(col("from_type"), col("to_type"))

  val q103Sql: String =
    """WITH seq AS (SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev_type
      |  FROM events)
      |SELECT prev_type AS from_type, event_type AS to_type,
      |  COUNT(*) AS n
      |FROM seq WHERE prev_type IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ── q105: trailing-hour RANGE-frame window ─────────────────────────────

  /** q105: per event, the user's trailing-1-hour event count and value
    * sum via a RANGE frame over epoch seconds — the event-time sliding
    * feature rows-frames can't express (ties at one timestamp share one
    * frame, so no tiebreak is needed for determinism). */
  def q105TrailingWindow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"))
      .rangeBetween(-3599, 0)
    Sources.events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"),
        col("ts").cast("long").as("tsec"))
      .withColumn("n_trailing_1h", count(lit(1)).over(w))
      .withColumn("sum_trailing_1h",
        sum(col("value").cast(DecimalType(18, 2))).over(w)
          .cast(DoubleType))
      .select(col("event_id"), col("user_id"), col("tsec"),
        col("n_trailing_1h"), col("sum_trailing_1h"))
      .orderBy(col("event_id"))
  }

  val q105Sql: String =
    """WITH e AS (SELECT event_id, user_id, value,
      |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS tsec FROM events)
      |SELECT event_id, user_id, tsec,
      |  COUNT(*) OVER w AS n_trailing_1h,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |    AS sum_trailing_1h
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY tsec
      |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ── q46: gap-based sessionization ──────────────────────────────────────

  /** q46: 30-minute-gap sessions per user (lag flag + running sum), rolled
    * up to one row per session. */
  def q46Sessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(Sources.events(s, dir), Seq("user_id"), "ts",
        gapSeconds = 1800, tiebreak = Seq(col("event_id")))
      .select(col("user_id"), col("session_id"), col("n_events"),
        unix_micros(col("session_start")).as("session_start_us"),
        unix_micros(col("session_end")).as("session_end_us"))
      .orderBy(col("user_id"), col("session_id"))

  // Oracle notes: the gate projection reports session bounds as epoch
  // MICROSECOND BIGINTs, not timestamps. MIN/MAX(ts) over the parquet
  // TIMESTAMP(NANOS) column is DuckDB TIMESTAMP_NS while Spark carries a
  // µs timestamp — every textual-timestamp normalization we tried still
  // stringified differently in the driver's hasher (r2 CAST fix did not
  // green it in r3). int64 has exactly one representation everywhere.
  // epoch_ns // 1000 floor-matches Spark's `ts DIV 1000` read conversion
  // (positive epochs). The running-sum window carries the event_id
  // tiebreak of the lag window: with duplicate (user_id, ts) rows the
  // numbering would otherwise be nondeterministic. The window SUM must be
  // CAST to BIGINT: DuckDB window SUM over INTEGER yields HUGEINT, whose
  // Arrow export hashes differently from Spark's int64 session_id.
  val q46Sql: String =
    """WITH f AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS nf
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |ses AS (
      |  SELECT user_id, ts, CAST(SUM(nf) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM f)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  CAST(epoch_ns(MIN(ts)) // 1000 AS BIGINT) AS session_start_us,
      |  CAST(epoch_ns(MAX(ts)) // 1000 AS BIGINT) AS session_end_us
      |FROM ses GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // ── q47: argmax / argmin aggregates ────────────────────────────────────

  /** q47: max_by/min_by with a struct ordering key — deterministic argmax
    * (highest value, then highest event_id) in one aggregation pass, no
    * self-join or window needed. */
  def q47Argmax(s: SparkSession, dir: String): DataFrame =
    Sources.events(s, dir).filter(col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        max_by(col("event_id"), struct(col("value"), col("event_id")))
          .as("best_event_id"),
        max(col("value")).as("max_value"),
        min_by(col("event_id"), struct(col("value"), col("event_id")))
          .as("worst_event_id"),
        min(col("value")).as("min_value"))
      .orderBy(col("user_id"))

  val q47Sql: String =
    """WITH nn AS (SELECT * FROM events WHERE value IS NOT NULL),
      |b AS (SELECT user_id, event_id AS best_event_id FROM (
      |  SELECT user_id, event_id, row_number() OVER (
      |    PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rn
      |  FROM nn) t WHERE rn = 1),
      |w AS (SELECT user_id, event_id AS worst_event_id FROM (
      |  SELECT user_id, event_id, row_number() OVER (
      |    PARTITION BY user_id ORDER BY value ASC, event_id ASC) AS rn
      |  FROM nn) t WHERE rn = 1),
      |m AS (SELECT user_id, MAX(value) AS max_value, MIN(value) AS min_value
      |      FROM nn GROUP BY user_id)
      |SELECT m.user_id, b.best_event_id, m.max_value, w.worst_event_id,
      |  m.min_value
      |FROM m JOIN b ON m.user_id = b.user_id JOIN w ON m.user_id = w.user_id
      |ORDER BY m.user_id""".stripMargin

  // ── q48: JSON extraction from a string column ──────────────────────────

  /** q48: both JSON paths Spark offers — path extraction
    * (get_json_object) and schema-on-read parsing (from_json) — over the
    * events `props` column, plus an aggregate over the extracted value. */
  def q48Json(s: SparkSession, dir: String): DataFrame = {
    val parsed = Sources.events(s, dir)
      .withColumn("k_path",
        get_json_object(col("props"), "$.k").cast(LongType))
      .withColumn("k_parsed",
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k"))
    parsed.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k_path")).as("sum_k"),
        sum(when(col("k_path") === col("k_parsed"), 1L).otherwise(0L))
          .as("n_consistent"))
      .orderBy(col("event_type"))
  }

  // Oracle notes: DuckDB SUM(BIGINT) returns HUGEINT — CAST back to BIGINT
  // for the driver's hasher. n_consistent mirrors the two genuinely
  // different extraction paths (string-path extraction + cast vs typed
  // JSON extraction), matching the Spark get_json_object / from_json split.
  val q48Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |    AS BIGINT) AS sum_k,
      |  CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
      |    = CAST(json_extract(props, '$.k') AS BIGINT)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ── q49: regexp extraction / counting / replacement ────────────────────

  /** q49: regexp_extract / regexp_count / regexp_replace over document
    * text (patterns chosen to behave identically under Java regex and
    * RE2). */
  def q49Regexp(s: SparkSession, dir: String): DataFrame =
    Sources.documents(s, dir).select(
      col("doc_id"),
      regexp_extract(col("text"), "[0-9]+", 0).as("first_num"),
      regexp_count(col("text"), lit("[0-9]+")).as("n_nums"),
      length(regexp_replace(col("text"), "[aeiou]", "")).as("len_no_vowels"))
    .orderBy(col("doc_id"))

  val q49Sql: String =
    """SELECT doc_id,
      |  regexp_extract(text, '[0-9]+') AS first_num,
      |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_nums,
      |  length(regexp_replace(text, '[aeiou]', '', 'g')) AS len_no_vowels
      |FROM documents ORDER BY doc_id""".stripMargin

  // ── q50: deterministic hash-based sampling ─────────────────────────────

  /** q50: ~10% deterministic sample of lineitem — first md5 byte of the
    * composite key < 26/256. Unlike TABLESAMPLE/rand(), this is seedless,
    * engine-portable, and stable under repartitioning — the property a
    * training-data pipeline needs for reproducible holdouts. */
  def q50HashSample(s: SparkSession, dir: String): DataFrame = {
    val h = md5(concat_ws("_", col("l_orderkey"), col("l_linenumber")))
    val bucket = conv(substring(h, 1, 2), 16, 10).cast(IntegerType)
    Sources.lineitem(s, dir)
      .withColumn("bucket", bucket)
      .filter(col("bucket") < 26)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("bucket"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val q50Sql: String =
    """WITH h AS (SELECT l_orderkey, l_linenumber, l_extendedprice,
      |  (strpos('0123456789abcdef',
      |     substr(md5(l_orderkey || '_' || l_linenumber), 1, 1)) - 1) * 16
      |  + strpos('0123456789abcdef',
      |     substr(md5(l_orderkey || '_' || l_linenumber), 2, 1)) - 1 AS bucket
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber, l_extendedprice, bucket
      |FROM h WHERE bucket < 26
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ── q51: full outer join ───────────────────────────────────────────────

  /** q51: FULL OUTER between per-user event counts and the customer dim —
    * both unmatched sides survive with nulls; coalesced key. */
  def q51FullOuter(s: SparkSession, dir: String): DataFrame = {
    val perUser = Sources.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val cust = Sources.customer(s, dir)
      .select(col("c_custkey"), col("c_name"))
    perUser.join(cust, col("user_id") === col("c_custkey"), "full_outer")
      .select(coalesce(col("user_id"), col("c_custkey")).as("ukey"),
        col("c_name"), coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("ukey"))
  }

  val q51Sql: String =
    """SELECT COALESCE(e.user_id, c.c_custkey) AS ukey, c.c_name,
      |  COALESCE(e.n_events, 0) AS n_events
      |FROM (SELECT user_id, COUNT(*) AS n_events FROM events
      |      GROUP BY user_id) e
      |FULL OUTER JOIN customer c ON e.user_id = c.c_custkey
      |ORDER BY ukey""".stripMargin

  // ── q52: correlated scalar subquery ────────────────────────────────────

  private val q52Text =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      |WHERE o_totalprice > (
      |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |         / COUNT(*)
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** q52: orders above their customer's average order value — a correlated
    * scalar subquery, which Catalyst de-correlates into an aggregate +
    * self-join (no per-row re-execution; same SQL text runs in DuckDB). */
  def q52CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    Sources.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(q52Text)
  }

  val q52Sql: String = q52Text

  // ── q53: ordered collection aggregation ────────────────────────────────

  /** q53: per-user distinct event types as a sorted CSV (collect_set →
    * array_sort → array_join) — deterministic despite collect_set's
    * unordered accumulation. */
  def q53StringAgg(s: SparkSession, dir: String): DataFrame =
    Sources.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        array_join(array_sort(collect_set(col("event_type"))), ",")
          .as("types_csv"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy(col("user_id"))

  val q53Sql: String =
    """SELECT user_id,
      |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
      |  COUNT(DISTINCT event_type) AS n_types
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ── q54: vector centroids (exact distributed mean per dimension) ───────

  /** q54: per-label embedding centroid, long format — posexplode +
    * (label, dim) aggregation with exact decimal accumulation; the mean
    * is hashed in exact micro-units (ExactRound — the decimal-sum/count
    * quotient is an exact rational, so a rounded double would sit on
    * engine-divergent half-boundary ties). */
  def q54VectorCentroid(s: SparkSession, dir: String): DataFrame =
    VectorAggs.centroidsMicro(Sources.embeddings(s, dir), "label",
        "embedding")
      .orderBy(col("label"), col("dim"))

  val q54Sql: String =
    """WITH s AS (SELECT label, d - 1 AS dim,
      |    CAST(SUM(CAST(round(embedding[d]::DOUBLE, 6)
      |      AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS sm,
      |    COUNT(*) AS n
      |  FROM embeddings CROSS JOIN range(1, 65) t(d)
      |  GROUP BY label, d)
      |SELECT label, dim,
      |  CASE WHEN sm < 0 THEN -((2 * (-sm) + n) // (2 * n))
      |       ELSE (2 * sm + n) // (2 * n) END AS centroid_micro
      |FROM s ORDER BY label, dim""".stripMargin

  // ── q55: IVF approximate nearest neighbor ──────────────────────────────

  /** q55: IVF ANN — queries 0–4 probe their 2 nearest centroid buckets
    * (label = coarse quantizer), exact cosine re-rank, top-5. */
  def q55IvfAnn(s: SparkSession, dir: String): DataFrame =
    VectorAggs.ivfTopK(Sources.embeddings(s, dir), "vec_id", "embedding",
        "label", col("vec_id") < 5, k = 5, nprobe = 2)
      .orderBy(col("q_id"), col("c_id"))

  val q55Sql: String =
    """WITH dims AS (
      |  SELECT label, d, round(CAST(SUM(CAST(round(embedding[d]::DOUBLE, 6)
      |      AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS c
      |  FROM embeddings CROSS JOIN range(1, 65) t(d) GROUP BY label, d),
      |cvec AS (SELECT label, array_agg(c ORDER BY d) AS cv
      |         FROM dims GROUP BY label),
      |ccos AS (
      |  SELECT e.vec_id, e.embedding, v.label, round(
      |    list_sum(list_transform(range(1, 65),
      |      i -> e.embedding[i]::DOUBLE * v.cv[i])) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> v.cv[i] * v.cv[i])))), 6) AS ccos
      |  FROM embeddings e CROSS JOIN cvec v),
      |assign AS (
      |  SELECT vec_id AS c_id, embedding AS c_vec, label AS cluster FROM (
      |    SELECT vec_id, embedding, label, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY ccos DESC, label ASC) AS rn
      |    FROM ccos) t WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS q_id, embedding AS q_vec, label AS cluster FROM (
      |    SELECT vec_id, embedding, label, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY ccos DESC, label ASC) AS rn
      |    FROM ccos WHERE vec_id < 5) t WHERE rn <= 2),
      |cands AS (
      |  SELECT p.q_id, a.c_id, round(
      |    list_sum(list_transform(range(1, 65),
      |      i -> p.q_vec[i]::DOUBLE * a.c_vec[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(range(1, 65),
      |       i -> p.q_vec[i]::DOUBLE * p.q_vec[i]::DOUBLE))) *
      |     sqrt(list_sum(list_transform(range(1, 65),
      |       i -> a.c_vec[i]::DOUBLE * a.c_vec[i]::DOUBLE)))), 6) AS cosine
      |  FROM probes p JOIN assign a ON p.cluster = a.cluster
      |  WHERE p.q_id <> a.c_id)
      |SELECT q_id, c_id, cosine FROM (
      |  SELECT q_id, c_id, cosine, row_number() OVER (
      |    PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rn
      |  FROM cands) t WHERE rn <= 5
      |ORDER BY q_id, c_id""".stripMargin

  // ── q56: union by name (schema-evolution-tolerant append) ──────────────

  /** q56: unionByName with allowMissingColumns — the append path when a
    * source drops/reorders columns (missing side null-filled); positional
    * union would silently mis-assign here. */
  def q56UnionByName(s: SparkSession, dir: String): DataFrame = {
    val ev = Sources.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("value"), col("event_id"))
    clicks.unionByName(purchases, allowMissingColumns = true)
      .orderBy(col("event_id"))
  }

  val q56Sql: String =
    """SELECT * FROM (
      |  SELECT event_id, user_id, value FROM events
      |  WHERE event_type = 'click'
      |  UNION ALL BY NAME
      |  SELECT value, event_id FROM events WHERE event_type = 'purchase') t
      |ORDER BY event_id""".stripMargin

  // ── q57: ntile decile bucketing ────────────────────────────────────────

  /** q57: global ntile(10) over order value with unique tiebreak —
    * computed by GlobalRank.ntileExact (range repartition + per-partition
    * rank + broadcast offsets), NOT a partition-less window: same exact
    * SQL-ntile semantics, but every window in the plan is partitioned, so
    * the query survives a 100× scale-up where `Window.orderBy` would
    * funnel all rows through one task. */
  def q57Ntile(s: SparkSession, dir: String): DataFrame =
    GlobalRank.ntileExact(Sources.orders(s, dir),
        Seq(col("o_totalprice").asc, col("o_orderkey").asc), 10, "decile")
      .select(col("o_orderkey"), col("o_totalprice"), col("decile"))
      .orderBy(col("o_orderkey"))

  val q57Sql: String =
    """SELECT o_orderkey, o_totalprice,
      |  ntile(10) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS decile
      |FROM orders ORDER BY o_orderkey""".stripMargin
}
