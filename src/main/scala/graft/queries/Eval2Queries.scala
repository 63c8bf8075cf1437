package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Preference, Standardize}
import graft.sources.Sources

/** Round-14 widening of the preference/eval layer (the r13 verdict's
  * item-7 continuations): multi-judge agreement (Fleiss' kappa), the
  * per-judge self-consistency / verdict-flip audit, the verbosity-bias
  * audit, the comparison-graph identifiability audit, Schulze beatpath
  * ranking, and the Borda positional baseline for the q337 listwise
  * fixture. Same discipline as EvalQueries: items are metadata-scale by
  * contract, every hashed surface is exact int64/micro fixed point, and
  * each oracle replays the operator's arithmetic verbatim. */
object Eval2Queries {

  // ── q340: Fleiss' kappa over repeated ratings ──────────────────────────

  /** q340: [[Standardize.fleissKappa]] — "units" are customers with ≥ 3
    * orders, their first three orders' priorities (by order key) acting
    * as 3 raters assigning a nominal label; the multi-rater
    * generalization of the gated pairwise Cohen kappa (q164). */
  def q340FleissKappa(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val wAll = Window.partitionBy(col("o_custkey"))
    val ratings = Sources.orders(s, dir)
      .select(col("o_custkey"), col("o_orderpriority").as("graft_lbl"),
        col("o_orderkey"))
      .withColumn("graft_rn", row_number().over(wOrd))
      .withColumn("graft_cnt", count(lit(1)).over(wAll))
      .filter(col("graft_cnt") >= 3 && col("graft_rn") <= 3)
    Standardize.fleissKappa(ratings, "o_custkey", "graft_lbl")
  }

  val q340Sql: String =
    """WITH rk AS (SELECT o_custkey, o_orderpriority AS lbl,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
      |  FROM orders),
      |r AS (SELECT o_custkey, lbl FROM rk WHERE cnt >= 3 AND rn <= 3),
      |uc AS (SELECT o_custkey, lbl, COUNT(*) AS nuc FROM r GROUP BY 1, 2),
      |pu AS (SELECT o_custkey, SUM(nuc) AS rr, SUM(nuc * nuc) AS sq
      |       FROM uc GROUP BY 1),
      |ua AS (SELECT COUNT(*) AS n_units, MIN(rr) AS rmin, MAX(rr) AS rmax,
      |         SUM(sq) AS sqsum FROM pu),
      |ca AS (SELECT COUNT(*) AS n_categories,
      |         SUM(nc::HUGEINT * nc) AS csum
      |       FROM (SELECT lbl, SUM(nuc) AS nc FROM uc GROUP BY 1)),
      |t AS (SELECT n_units, rmin, rmax, n_categories,
      |        (sqsum - n_units * rmin)::HUGEINT AS a,
      |        (n_units * rmin * (rmin - 1))::HUGEINT AS b,
      |        csum::HUGEINT AS c,
      |        (n_units::HUGEINT * rmin * n_units * rmin) AS d
      |      FROM ua CROSS JOIN ca)
      |SELECT n_units::BIGINT AS n_units, rmin::BIGINT AS n_raters,
      |  n_categories::BIGINT AS n_categories,
      |  (rmax = rmin) AS complete,
      |  CASE WHEN rmin > 1 THEN
      |    CAST((2 * a * 1000000 + b) // (2 * b) AS BIGINT)
      |  END AS p_bar_micro,
      |  CAST((2 * c * 1000000 + d) // (2 * d) AS BIGINT) AS p_e_micro,
      |  CASE WHEN rmin > 1 AND d <> c THEN
      |    CASE WHEN a * d >= c * b THEN
      |      CAST((2 * (a * d - c * b) * 1000000 + b * (d - c))
      |        // (2 * b * (d - c)) AS BIGINT)
      |    ELSE
      |      -CAST((2 * (c * b - a * d) * 1000000 + b * (d - c))
      |        // (2 * b * (d - c)) AS BIGINT)
      |    END
      |  END AS kappa_micro
      |FROM t""".stripMargin

  // ── q354: Gwet's AC1 over the same repeated-ratings fixture ───────────

  /** q354: [[Standardize.gwetAC1]] on q340's exact fixture — the
    * paradox-resistant twin read NEXT TO the kappa: κ ≪ AC1 flags
    * marginal skew (one dominant priority), not unreliable raters. */
  def q354GwetAC1(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val wAll = Window.partitionBy(col("o_custkey"))
    val ratings = Sources.orders(s, dir)
      .select(col("o_custkey"), col("o_orderpriority").as("graft_lbl"),
        col("o_orderkey"))
      .withColumn("graft_rn", row_number().over(wOrd))
      .withColumn("graft_cnt", count(lit(1)).over(wAll))
      .filter(col("graft_cnt") >= 3 && col("graft_rn") <= 3)
    Standardize.gwetAC1(ratings, "o_custkey", "graft_lbl")
  }

  val q354Sql: String =
    """WITH rk AS (SELECT o_custkey, o_orderpriority AS lbl,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
      |  FROM orders),
      |r AS (SELECT o_custkey, lbl FROM rk WHERE cnt >= 3 AND rn <= 3),
      |uc AS (SELECT o_custkey, lbl, COUNT(*) AS nuc FROM r GROUP BY 1, 2),
      |pu AS (SELECT o_custkey, SUM(nuc) AS rr, SUM(nuc * nuc) AS sq
      |       FROM uc GROUP BY 1),
      |ua AS (SELECT COUNT(*) AS n_units, MIN(rr) AS rmin, MAX(rr) AS rmax,
      |         SUM(sq) AS sqsum FROM pu),
      |ca AS (SELECT COUNT(*) AS n_categories,
      |         SUM(nc::HUGEINT * nc) AS csum
      |       FROM (SELECT lbl, SUM(nuc) AS nc FROM uc GROUP BY 1)),
      |t AS (SELECT n_units, rmin, rmax, n_categories AS k,
      |        (sqsum - n_units * rmin)::HUGEINT AS a,
      |        (n_units * rmin * (rmin - 1))::HUGEINT AS b,
      |        csum::HUGEINT AS c,
      |        (n_units::HUGEINT * rmin * n_units * rmin) AS d
      |      FROM ua CROSS JOIN ca)
      |SELECT n_units::BIGINT AS n_units, rmin::BIGINT AS n_raters,
      |  k::BIGINT AS n_categories,
      |  (rmax = rmin) AS complete,
      |  CASE WHEN rmin > 1 THEN
      |    CAST((2 * a * 1000000 + b) // (2 * b) AS BIGINT)
      |  END AS p_bar_micro,
      |  CASE WHEN k > 1 THEN
      |    CAST((2 * (d - c) * 1000000 + (k - 1) * d)
      |      // (2 * (k - 1) * d) AS BIGINT)
      |  END AS p_e_ac1_micro,
      |  CASE WHEN rmin > 1 AND k > 1 THEN
      |    CASE WHEN a * (k - 1) * d >= b * (d - c) THEN
      |      CAST((2 * (a * (k - 1) * d - b * (d - c)) * 1000000
      |          + b * ((k - 2) * d + c))
      |        // (2 * b * ((k - 2) * d + c)) AS BIGINT)
      |    ELSE
      |      -CAST((2 * (b * (d - c) - a * (k - 1) * d) * 1000000
      |          + b * ((k - 2) * d + c))
      |        // (2 * b * ((k - 2) * d + c)) AS BIGINT)
      |    END
      |  END AS ac1_micro
      |FROM t""".stripMargin

  // ── q355: interval-metric Krippendorff alpha (ordinal ratings) ─────────

  /** q355: [[Standardize.krippendorffAlphaInterval]] on q340's fixture
    * with the priority's leading DIGIT as the integer-coded ordinal
    * value — nominal agreement (q301/q340/q354) charges "4 vs 5" and
    * "1 vs 5" identically; the interval metric weighs each disagreement
    * by its squared scale distance, the right lens for Likert-style
    * judge ratings. */
  def q355AlphaInterval(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val wAll = Window.partitionBy(col("o_custkey"))
    val ratings = Sources.orders(s, dir)
      .select(col("o_custkey"),
        substring(col("o_orderpriority"), 1, 1).cast(LongType)
          .as("graft_v"),
        col("o_orderkey"))
      .withColumn("graft_rn", row_number().over(wOrd))
      .withColumn("graft_cnt", count(lit(1)).over(wAll))
      .filter(col("graft_cnt") >= 3 && col("graft_rn") <= 3)
    Standardize.krippendorffAlphaInterval(ratings, "o_custkey", "graft_v")
  }

  val q355Sql: String =
    """WITH rk AS (SELECT o_custkey,
      |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS v,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
      |  FROM orders),
      |r AS (SELECT o_custkey, v FROM rk WHERE cnt >= 3 AND rn <= 3),
      |uv AS (SELECT o_custkey, v, COUNT(*) AS n FROM r GROUP BY 1, 2),
      |pu AS (SELECT o_custkey, SUM(n) AS rr FROM uv GROUP BY 1),
      |ua AS (SELECT COUNT(*) AS n_units, MIN(rr) AS rmin, MAX(rr) AS rmax
      |       FROM pu),
      |dp AS (SELECT COALESCE(SUM(a.n::HUGEINT * b.n
      |           * (a.v - b.v) * (a.v - b.v)), 0) AS do_s
      |       FROM uv a JOIN uv b
      |         ON a.o_custkey = b.o_custkey AND a.v <> b.v),
      |mg AS (SELECT v, SUM(n) AS nc FROM uv GROUP BY 1),
      |de AS (SELECT COALESCE(SUM(a.nc::HUGEINT * b.nc
      |           * (a.v - b.v) * (a.v - b.v)), 0) AS de_s
      |       FROM mg a JOIN mg b ON a.v <> b.v),
      |ca AS (SELECT COUNT(*) AS n_categories, SUM(nc) AS nn FROM mg)
      |SELECT n_units::BIGINT AS n_units, rmin::BIGINT AS n_raters,
      |  n_categories::BIGINT AS n_categories,
      |  (rmax = rmin) AS complete,
      |  do_s::BIGINT AS do_scaled, de_s::BIGINT AS de_scaled,
      |  CASE WHEN rmin > 1 AND de_s <> 0 THEN
      |    CASE WHEN (rmin - 1) * de_s >= (nn - 1) * do_s THEN
      |      CAST((2 * ((rmin - 1)::HUGEINT * de_s - (nn - 1) * do_s)
      |          * 1000000 + (rmin - 1) * de_s)
      |        // (2 * (rmin - 1)::HUGEINT * de_s) AS BIGINT)
      |    ELSE
      |      -CAST((2 * ((nn - 1)::HUGEINT * do_s - (rmin - 1) * de_s)
      |          * 1000000 + (rmin - 1) * de_s)
      |        // (2 * (rmin - 1)::HUGEINT * de_s) AS BIGINT)
      |    END
      |  END AS alpha_micro
      |FROM ua CROSS JOIN dp CROSS JOIN de CROSS JOIN ca""".stripMargin

  // ── q341: per-judge self-consistency / verdict-flip audit ──────────────

  /** The per-judge comparisons fixture: one game per (customer, order
    * YEAR) — the year acts as the judge, so every judge re-judges the
    * same priority pairs across many customers and the repeated-pair
    * consistency is measurable. Same argmax/argmin key discipline as
    * [[EvalQueries.comparisons]]. */
  private def judgedComparisons(s: SparkSession, dir: String): DataFrame = {
    val key = (floor(col("o_totalprice") * lit(100)).cast(LongType) *
      lit(10000000000L) + col("o_orderkey")).as("graft_k")
    Sources.orders(s, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).as("judge"),
        col("o_orderpriority").as("graft_p"), key)
      .groupBy(col("o_custkey"), col("judge"))
      .agg(max_by(col("graft_p"), col("graft_k")).as("winner"),
        min_by(col("graft_p"), col("graft_k")).as("loser"))
      .filter(col("winner") =!= col("loser"))
  }

  private val judgedSql: String =
    """jc AS (SELECT o_custkey, year(o_orderdate) AS judge,
      |    arg_max(o_orderpriority,
      |      CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000000
      |        + o_orderkey) AS winner,
      |    arg_min(o_orderpriority,
      |      CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000000
      |        + o_orderkey) AS loser
      |  FROM orders GROUP BY 1, 2),
      |jg AS (SELECT CAST(judge AS VARCHAR) AS judge, winner, loser
      |       FROM jc WHERE winner <> loser)""".stripMargin

  /** q341: [[Preference.judgeConsistency]] — each order-year "judge"
    * re-judges the same priority pairs across customers; the audit
    * reports how often the repeated verdicts agree with themselves
    * (flip pairs + majority-direction consistency). */
  def q341JudgeConsistency(s: SparkSession, dir: String): DataFrame =
    Preference.judgeConsistency(judgedComparisons(s, dir), "judge",
        "winner", "loser")
      .orderBy(col("judge"))

  val q341Sql: String =
    s"""WITH $judgedSql,
       |pr AS (SELECT judge, least(winner, loser) AS a,
       |         greatest(winner, loser) AS b,
       |         SUM(CASE WHEN winner < loser THEN 1 ELSE 0 END) AS wlo,
       |         SUM(CASE WHEN winner > loser THEN 1 ELSE 0 END) AS whi
       |       FROM jg GROUP BY 1, 2, 3),
       |px AS (SELECT judge, wlo + whi AS n, GREATEST(wlo, whi) AS maj,
       |         (wlo > 0 AND whi > 0) AS flip
       |       FROM pr)
       |SELECT judge, COUNT(*)::BIGINT AS n_pairs,
       |  SUM(n)::BIGINT AS n_games,
       |  SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END)::BIGINT
       |    AS n_pairs_repeated,
       |  SUM(CASE WHEN n >= 2 THEN n ELSE 0 END)::BIGINT
       |    AS n_games_repeated,
       |  SUM(CASE WHEN flip THEN 1 ELSE 0 END)::BIGINT AS n_flip_pairs,
       |  CASE WHEN SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) > 0 THEN
       |    CAST((2 * SUM(CASE WHEN n >= 2 THEN maj ELSE 0 END)::HUGEINT
       |        * 1000000 + SUM(CASE WHEN n >= 2 THEN n ELSE 0 END))
       |      // (2 * SUM(CASE WHEN n >= 2 THEN n ELSE 0 END)::HUGEINT)
       |      AS BIGINT)
       |  END AS consistency_micro
       |FROM px GROUP BY judge ORDER BY judge""".stripMargin

  // ── q342: verbosity-bias audit ─────────────────────────────────────────

  /** q342: [[Preference.verbosityBias]] — response "length" is the
    * line-item count of each side's order, so the audit asks whether the
    * bigger order's priority wins; the Zheng et al. 2023 §3.2 check with
    * the Wilson interval making a small decided-game count visible. */
  def q342VerbosityBias(s: SparkSession, dir: String): DataFrame = {
    val key = (floor(col("o_totalprice") * lit(100)).cast(LongType) *
      lit(10000000000L) + col("o_orderkey")).as("graft_k")
    val games = Sources.orders(s, dir)
      .select(col("o_custkey"), col("o_orderpriority").as("graft_p"), key)
      .groupBy(col("o_custkey"))
      .agg(max_by(col("graft_p"), col("graft_k")).as("winner"),
        min_by(col("graft_p"), col("graft_k")).as("loser"),
        (max(col("graft_k")) % lit(10000000000L)).as("graft_wok"),
        (min(col("graft_k")) % lit(10000000000L)).as("graft_lok"))
      .filter(col("winner") =!= col("loser"))
    val lc = Sources.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("graft_n"))
    val withLens = games
      .join(lc.select(col("l_orderkey").as("graft_wok"),
        col("graft_n").as("graft_wn")), Seq("graft_wok"), "left")
      .join(lc.select(col("l_orderkey").as("graft_lok"),
        col("graft_n").as("graft_ln")), Seq("graft_lok"), "left")
      .select(coalesce(col("graft_wn"), lit(0L)).as("winner_len"),
        coalesce(col("graft_ln"), lit(0L)).as("loser_len"))
    Preference.verbosityBias(withLens, "winner_len", "loser_len")
  }

  val q342Sql: String =
    """WITH c AS (SELECT o_custkey,
      |    arg_max(o_orderpriority,
      |      CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000000
      |        + o_orderkey) AS winner,
      |    arg_min(o_orderpriority,
      |      CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000000
      |        + o_orderkey) AS loser,
      |    MAX(CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000000
      |        + o_orderkey) % 10000000000 AS wok,
      |    MIN(CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000000
      |        + o_orderkey) % 10000000000 AS lok
      |  FROM orders GROUP BY 1),
      |g AS (SELECT wok, lok FROM c WHERE winner <> loser),
      |lc AS (SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY 1),
      |lens AS (SELECT COALESCE(w.n, 0) AS wl, COALESCE(l.n, 0) AS ll
      |         FROM g LEFT JOIN lc w ON w.l_orderkey = g.wok
      |                LEFT JOIN lc l ON l.l_orderkey = g.lok),
      |a AS (SELECT COUNT(*) AS n_games,
      |        SUM(CASE WHEN wl > ll THEN 1 ELSE 0 END) AS nl,
      |        SUM(CASE WHEN wl < ll THEN 1 ELSE 0 END) AS ns,
      |        SUM(CASE WHEN wl = ll THEN 1 ELSE 0 END) AS ne
      |      FROM lens),
      |b AS (SELECT *, nl + ns AS nd,
      |        (nl + ns)::HUGEINT
      |          * (nl::HUGEINT * ns + (nl + ns)) AS x
      |      FROM a),
      |s0 AS (SELECT *, CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT)
      |         AS y0 FROM b),
      |s1 AS (SELECT *, y0 - CASE WHEN y0::HUGEINT * y0 > x
      |         THEN 1 ELSE 0 END AS y1 FROM s0),
      |s2 AS (SELECT *, y1 + CASE WHEN (y1 + 1)::HUGEINT * (y1 + 1) <= x
      |         THEN 1 ELSE 0 END AS isq FROM s1)
      |SELECT n_games::BIGINT AS n_games, nl::BIGINT AS n_longer_won,
      |  ns::BIGINT AS n_shorter_won, ne::BIGINT AS n_equal_len,
      |  CASE WHEN nd > 0 THEN
      |    CAST((2 * nl::HUGEINT * 1000000 + nd) // (2 * nd::HUGEINT)
      |      AS BIGINT) END AS longer_win_micro,
      |  CASE WHEN nd > 0 THEN
      |    CAST((2 * ((nl + 2)::HUGEINT * nd - 2 * isq) * 1000000
      |        + nd::HUGEINT * (nd + 4))
      |      // (2 * nd::HUGEINT * (nd + 4)) AS BIGINT)
      |  END AS wilson_lb_micro,
      |  CASE WHEN nd > 0 THEN
      |    CAST((2 * ((nl + 2)::HUGEINT * nd + 2 * isq) * 1000000
      |        + nd::HUGEINT * (nd + 4))
      |      // (2 * nd::HUGEINT * (nd + 4)) AS BIGINT)
      |  END AS wilson_ub_micro
      |FROM s2""".stripMargin

  // ── q343: comparison-graph identifiability audit ───────────────────────

  /** q343: [[Preference.comparisonGraphAudit]] — connectivity, pair
    * coverage, and the undefeated/winless MLE-boundary counts of the
    * q323 comparison graph; the Ford-1957 precondition check that must
    * pass before any BT/RC leaderboard is read as one ranking. */
  def q343GraphAudit(s: SparkSession, dir: String): DataFrame =
    Preference.comparisonGraphAudit(EvalQueries.comparisons(s, dir),
      "winner", "loser")

  val q343Sql: String =
    s"""WITH RECURSIVE ${EvalQueries.comparisonsSql},
       |und AS (SELECT DISTINCT least(w, l) AS a, greatest(w, l) AS b
       |        FROM wd),
       |sym AS (SELECT a, b FROM und UNION SELECT b, a FROM und),
       |reach(n, m) AS (
       |  SELECT a AS n, a AS m FROM sym
       |  UNION
       |  SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a),
       |comp AS (SELECT n AS item, MIN(m) AS c FROM reach GROUP BY 1),
       |cagg AS (SELECT COUNT(*) AS n_components,
       |           MAX(cs) AS largest_component
       |         FROM (SELECT c, COUNT(*) AS cs FROM comp GROUP BY 1)),
       |it AS (SELECT COUNT(*) AS n_items FROM comp),
       |pc AS (SELECT COUNT(*) AS n_observed_pairs FROM und),
       |bnd AS (SELECT
       |    SUM(CASE WHEN item NOT IN (SELECT w FROM wd) THEN 1 ELSE 0
       |      END) AS n_winless,
       |    SUM(CASE WHEN item NOT IN (SELECT l FROM wd) THEN 1 ELSE 0
       |      END) AS n_undefeated
       |  FROM comp)
       |SELECT n_items::BIGINT AS n_items,
       |  n_observed_pairs::BIGINT AS n_observed_pairs,
       |  CASE WHEN n_items > 1 THEN
       |    CAST((2 * n_observed_pairs::HUGEINT * 2000000
       |        + n_items::HUGEINT * (n_items - 1))
       |      // (2 * n_items::HUGEINT * (n_items - 1)) AS BIGINT)
       |  END AS pair_coverage_micro,
       |  n_components::BIGINT AS n_components,
       |  largest_component::BIGINT AS largest_component,
       |  n_undefeated::BIGINT AS n_undefeated,
       |  n_winless::BIGINT AS n_winless
       |FROM it CROSS JOIN pc CROSS JOIN cagg CROSS JOIN bnd""".stripMargin

  // ── q344: Schulze beatpath ranking ─────────────────────────────────────

  /** q344: [[Preference.schulzeRanking]] — widest-path (beatpath) wins
    * over the q323 comparison log, 3 max–min squaring rounds (covers
    * 8-hop paths ≫ the 5-item fixture's 4-hop bound); the Condorcet
    * completion that resolves q328's cyclic triads by decisiveness. */
  def q344Schulze(s: SparkSession, dir: String): DataFrame =
    Preference.schulzeRanking(EvalQueries.comparisons(s, dir), "winner",
        "loser", iters = 3)
      .orderBy(col("item"))

  val q344Sql: String = {
    def sq(n: Int): String =
      s"""p$n AS (SELECT i, j, MAX(s) AS s FROM (
         |    SELECT i, j, s FROM p${n - 1}
         |    UNION ALL
         |    SELECT x.i, y.j, LEAST(x.s, y.s)
         |    FROM p${n - 1} x JOIN p${n - 1} y
         |      ON x.j = y.i AND x.i <> y.j)
         |  GROUP BY 1, 2)""".stripMargin
    s"""WITH ${EvalQueries.comparisonsSql},
       |cb AS (SELECT x.w AS i, x.l AS j, x.cnt AS cij,
       |         COALESCE(y.cnt, 0) AS cji
       |       FROM wd x LEFT JOIN wd y ON x.w = y.l AND x.l = y.w),
       |p0 AS (SELECT i, j, cij AS s FROM cb WHERE cij > cji),
       |${sq(1)},
       |${sq(2)},
       |${sq(3)},
       |items AS (SELECT i AS item FROM cb
       |          UNION SELECT j FROM cb),
       |nn AS (SELECT COUNT(*) AS n FROM items),
       |vs AS (SELECT i, COALESCE(a.s, 0) AS s, COALESCE(b.st, 0) AS st
       |       FROM p3 a
       |       FULL JOIN (SELECT j AS i, i AS j, s AS st FROM p3) b
       |         USING (i, j)),
       |sc AS (SELECT i AS item,
       |         SUM(CASE WHEN s > st THEN 1 ELSE 0 END) AS pw,
       |         SUM(CASE WHEN s < st THEN 1 ELSE 0 END) AS plo
       |       FROM vs GROUP BY 1)
       |SELECT items.item, (n - 1)::BIGINT AS n_rivals,
       |  COALESCE(pw, 0)::BIGINT AS path_wins,
       |  COALESCE(plo, 0)::BIGINT AS path_losses,
       |  (n - 1 - COALESCE(pw, 0) - COALESCE(plo, 0))::BIGINT
       |    AS path_ties,
       |  (2 * COALESCE(pw, 0) + n - 1 - COALESCE(pw, 0)
       |    - COALESCE(plo, 0))::BIGINT AS schulze2
       |FROM items LEFT JOIN sc USING (item) CROSS JOIN nn
       |ORDER BY items.item""".stripMargin
  }

  // ── q347: bootstrap bands on Bradley–Terry strengths ───────────────────

  /** q347: [[Preference.bradleyTerryBootstrap]] — the Chatbot-Arena
    * leaderboard shape: the q323 BT point strengths with a 20-replicate
    * hashed-Poisson 5%-trimmed band from refitting the full MM fixed
    * point on whole-game resamples; overlapping bands mean the log does
    * not separate the items. The oracle replays all 20 replicates ×
    * 3 MM rounds with the rep key carried through every join. */
  def q347BtBootstrap(s: SparkSession, dir: String): DataFrame =
    Preference.bradleyTerryBootstrap(EvalQueries.comparisons(s, dir),
        "o_custkey", "winner", "loser", salt = "btb14", reps = 20,
        iters = 3)
      .orderBy(col("item"))

  val q347Sql: String = {
    def iter(n: Int): String =
      s"""d$n AS (SELECT p.i AS item,
         |  SUM((p.nij::HUGEINT * 1000000 * 1000000)
         |      // (pi.bt + pj.bt)) AS d
         |  FROM pair p
         |  JOIN p${n - 1} pi ON p.i = pi.item
         |  JOIN p${n - 1} pj ON p.j = pj.item GROUP BY 1),
         |p$n AS (SELECT t.item,
         |  GREATEST(1, (t.wt * 1000000 * 1000000) // d$n.d) AS bt
         |  FROM tot t JOIN d$n USING (item))""".stripMargin
    def riter(n: Int): String =
      s"""bd$n AS (SELECT p.rep, p.i AS item,
         |  SUM((p.nij::HUGEINT * 1000000 * 1000000)
         |      // (pi.bt + pj.bt)) AS d
         |  FROM pairr p
         |  JOIN b${n - 1} pi ON p.rep = pi.rep AND p.i = pi.item
         |  JOIN b${n - 1} pj ON p.rep = pj.rep AND p.j = pj.item
         |  GROUP BY 1, 2),
         |b$n AS (SELECT t.rep, t.item,
         |  GREATEST(1, (t.wt * 1000000 * 1000000) // d.d) AS bt
         |  FROM totr t JOIN bd$n d ON t.rep = d.rep AND t.item = d.item)"""
        .stripMargin
    val thresholds =
      graft.operators.Sampling.poissonThresholds48.mkString("[", ", ", "]")
    s"""WITH ${EvalQueries.comparisonsSql},
       |${EvalQueries.pairSql},
       |tot AS (SELECT i AS item, SUM(wij)::HUGEINT AS wt
       |        FROM pair GROUP BY 1),
       |p0 AS (SELECT item, 1000000::HUGEINT AS bt FROM tot),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)},
       |${EvalQueries.rawSql},
       |gi AS (SELECT o_custkey AS id, winner AS w, loser AS l FROM c
       |       WHERE winner <> loser),
       |rr AS (SELECT id, w, l, unnest(range(0, 20)) AS rep FROM gi),
       |hh AS (SELECT w, l, rep,
       |    CAST(list_sum(list_transform(range(1, 13), j ->
       |      (strpos('0123456789abcdef',
       |         substr(md5('btb14_' || CAST(rep AS VARCHAR) || '_'
       |           || CAST(id AS VARCHAR)), j, 1)) - 1)
       |        * (1::BIGINT << (4 * (12 - j))))) AS BIGINT) AS h48
       |  FROM rr),
       |wdr AS (SELECT rep, w, l,
       |    SUM(len(list_filter($thresholds, t -> h48 >= t))) AS cnt
       |  FROM hh GROUP BY 1, 2, 3),
       |dirsr AS (SELECT i, j, unnest(range(0, 20)) AS rep FROM dirs),
       |wsmr AS (SELECT dirsr.rep, i, j, COALESCE(cnt, 0) + 1 AS wij
       |         FROM dirsr LEFT JOIN wdr
       |           ON dirsr.rep = wdr.rep AND i = w AND j = l),
       |pairr AS (SELECT x.rep, x.i, x.j, x.wij, x.wij + y.wij AS nij
       |          FROM wsmr x JOIN wsmr y
       |            ON x.rep = y.rep AND x.i = y.j AND x.j = y.i),
       |totr AS (SELECT rep, i AS item, SUM(wij)::HUGEINT AS wt
       |         FROM pairr GROUP BY 1, 2),
       |b0 AS (SELECT rep, item, 1000000::HUGEINT AS bt FROM totr),
       |${riter(1)},
       |${riter(2)},
       |${riter(3)},
       |os AS (SELECT item, bt,
       |    row_number() OVER (PARTITION BY item ORDER BY bt) AS rn,
       |    COUNT(*) OVER (PARTITION BY item) AS mn
       |  FROM b3),
       |trm AS (SELECT item, CAST(MAX(mn) AS BIGINT) AS n_reps,
       |    MAX(CASE WHEN rn = mn // 20 + 1 THEN bt END) AS lo,
       |    MAX(CASE WHEN rn = mn - mn // 20 THEN bt END) AS hi
       |  FROM os GROUP BY item)
       |SELECT p3.item, COALESCE(raww.n_wins, 0)::BIGINT AS n_wins,
       |  rawg.n_games::BIGINT AS n_games, p3.bt::BIGINT AS bt_scaled,
       |  trm.n_reps, trm.lo::BIGINT AS bt_lo_scaled,
       |  trm.hi::BIGINT AS bt_hi_scaled
       |FROM p3 JOIN rawg USING (item) LEFT JOIN raww USING (item)
       |JOIN trm USING (item)
       |ORDER BY p3.item""".stripMargin
  }

  // ── q348: rating-system rank agreement (BT vs Copeland) ────────────────

  /** q348: [[Standardize.kendallTauA]] between the q323 Bradley–Terry
    * strengths and the q325 Copeland scores over the same log — the
    * "run two rating systems and compare ranks" robustness check the
    * preference layer's own docs prescribe; τ_a near 10⁶ means the
    * leaderboard is stable across model families, τ near 0 means the
    * ranking is an artifact of the estimator. */
  def q348RatingAgreement(s: SparkSession, dir: String): DataFrame = {
    val comps = EvalQueries.comparisons(s, dir)
      .localCheckpoint(eager = false) // feeds both rating fits
    val bt = Preference.bradleyTerry(comps, "winner", "loser", iters = 3)
      .select(col("item"), col("bt_scaled"))
    val cope = Preference.copelandScores(comps, "winner", "loser")
      .select(col("item"), col("copeland2"))
    Standardize.kendallTauA(bt.join(cope, Seq("item")), "item",
      "bt_scaled", "copeland2")
  }

  val q348Sql: String = {
    def iter(n: Int): String =
      s"""d$n AS (SELECT p.i AS item,
         |  SUM((p.nij::HUGEINT * 1000000 * 1000000)
         |      // (pi.bt + pj.bt)) AS d
         |  FROM pair p
         |  JOIN p${n - 1} pi ON p.i = pi.item
         |  JOIN p${n - 1} pj ON p.j = pj.item GROUP BY 1),
         |p$n AS (SELECT t.item,
         |  GREATEST(1, (t.wt * 1000000 * 1000000) // d$n.d) AS bt
         |  FROM tot t JOIN d$n USING (item))""".stripMargin
    s"""WITH ${EvalQueries.comparisonsSql},
       |${EvalQueries.pairSql},
       |tot AS (SELECT i AS item, SUM(wij)::HUGEINT AS wt
       |        FROM pair GROUP BY 1),
       |p0 AS (SELECT item, 1000000::HUGEINT AS bt FROM tot),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)},
       |m AS (SELECT least(w, l) AS item_a, greatest(w, l) AS item_b,
       |        SUM(CASE WHEN w < l THEN cnt ELSE 0 END) AS wins_a,
       |        SUM(CASE WHEN w > l THEN cnt ELSE 0 END) AS wins_b
       |      FROM wd GROUP BY 1, 2),
       |dv AS (SELECT item_a AS item, wins_a AS wf, wins_b AS wa FROM m
       |       UNION ALL
       |       SELECT item_b, wins_b, wins_a FROM m),
       |cope AS (SELECT item,
       |    2 * SUM(CASE WHEN wf > wa THEN 1 ELSE 0 END)
       |      + SUM(CASE WHEN wf = wa THEN 1 ELSE 0 END) AS c2
       |  FROM dv GROUP BY item),
       |t AS (SELECT p3.item AS id, p3.bt::BIGINT AS x, cope.c2::BIGINT
       |        AS y
       |      FROM p3 JOIN cope USING (item)),
       |pp AS (SELECT a.x AS ax, b.x AS bx, a.y AS ay, b.y AS "by"
       |       FROM t a JOIN t b ON a.id < b.id),
       |agg AS (SELECT COUNT(*) AS n_pairs,
       |    COALESCE(SUM(CASE WHEN (ax < bx AND ay < "by")
       |      OR (ax > bx AND ay > "by") THEN 1 ELSE 0 END), 0)
       |      AS n_concordant,
       |    COALESCE(SUM(CASE WHEN (ax < bx AND ay > "by")
       |      OR (ax > bx AND ay < "by") THEN 1 ELSE 0 END), 0)
       |      AS n_discordant,
       |    COALESCE(SUM(CASE WHEN ax = bx AND ay <> "by" THEN 1 ELSE 0
       |      END), 0) AS n_tied_x,
       |    COALESCE(SUM(CASE WHEN ay = "by" AND ax <> bx THEN 1 ELSE 0
       |      END), 0) AS n_tied_y,
       |    COALESCE(SUM(CASE WHEN ax = bx AND ay = "by" THEN 1 ELSE 0
       |      END), 0) AS n_tied_both
       |  FROM pp),
       |nn AS (SELECT COUNT(*) AS n_items FROM t)
       |SELECT n_items::BIGINT AS n_items, n_pairs::BIGINT AS n_pairs,
       |  n_concordant::BIGINT AS n_concordant,
       |  n_discordant::BIGINT AS n_discordant,
       |  n_tied_x::BIGINT AS n_tied_x, n_tied_y::BIGINT AS n_tied_y,
       |  n_tied_both::BIGINT AS n_tied_both,
       |  CASE WHEN n_pairs > 0 THEN
       |    CASE WHEN n_concordant < n_discordant THEN
       |      -CAST((2 * (n_discordant - n_concordant)::HUGEINT * 1000000
       |          + n_pairs) // (2 * n_pairs::HUGEINT) AS BIGINT)
       |    ELSE
       |      CAST((2 * (n_concordant - n_discordant)::HUGEINT * 1000000
       |          + n_pairs) // (2 * n_pairs::HUGEINT) AS BIGINT)
       |    END
       |  END AS tau_a_micro
       |FROM nn CROSS JOIN agg""".stripMargin
  }

  // ── q353: length-controlled win rate (per-gap-bucket Wilson bands) ─────

  /** q353: [[Preference.lengthControlledWinRate]] over q342's exact
    * fixture (line-item counts as response lengths) with gapWidth = 2 —
    * the AlpacaEval-2.0-style stratification that separates "judges
    * reward length" from "this log has huge length gaps": the
    * longer-side win share per |len gap| bucket, each with its own
    * z = 2 Wilson band via the exact isqrt. */
  def q353LengthControlled(s: SparkSession, dir: String): DataFrame = {
    val key = (floor(col("o_totalprice") * lit(100)).cast(LongType) *
      lit(10000000000L) + col("o_orderkey")).as("graft_k")
    val games = Sources.orders(s, dir)
      .select(col("o_custkey"), col("o_orderpriority").as("graft_p"), key)
      .groupBy(col("o_custkey"))
      .agg(max_by(col("graft_p"), col("graft_k")).as("winner"),
        min_by(col("graft_p"), col("graft_k")).as("loser"),
        (max(col("graft_k")) % lit(10000000000L)).as("graft_wok"),
        (min(col("graft_k")) % lit(10000000000L)).as("graft_lok"))
      .filter(col("winner") =!= col("loser"))
    val lc = Sources.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("graft_n"))
    val withLens = games
      .join(lc.select(col("l_orderkey").as("graft_wok"),
        col("graft_n").as("graft_wn")), Seq("graft_wok"), "left")
      .join(lc.select(col("l_orderkey").as("graft_lok"),
        col("graft_n").as("graft_ln")), Seq("graft_lok"), "left")
      .select(coalesce(col("graft_wn"), lit(0L)).as("winner_len"),
        coalesce(col("graft_ln"), lit(0L)).as("loser_len"))
    Preference.lengthControlledWinRate(withLens, "winner_len",
        "loser_len", gapWidth = 2L)
      .orderBy(col("gap_bucket"))
  }

  val q353Sql: String =
    """WITH c AS (SELECT o_custkey,
      |    arg_max(o_orderpriority,
      |      CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000000
      |        + o_orderkey) AS winner,
      |    arg_min(o_orderpriority,
      |      CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000000
      |        + o_orderkey) AS loser,
      |    MAX(CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000000
      |        + o_orderkey) % 10000000000 AS wok,
      |    MIN(CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000000
      |        + o_orderkey) % 10000000000 AS lok
      |  FROM orders GROUP BY 1),
      |g AS (SELECT wok, lok FROM c WHERE winner <> loser),
      |lc AS (SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY 1),
      |lens AS (SELECT COALESCE(w.n, 0) AS wl, COALESCE(l.n, 0) AS ll
      |         FROM g LEFT JOIN lc w ON w.l_orderkey = g.wok
      |                LEFT JOIN lc l ON l.l_orderkey = g.lok),
      |a AS (SELECT (ABS(wl - ll) - 1) // 2 AS gb, COUNT(*) AS n,
      |        SUM(CASE WHEN wl > ll THEN 1 ELSE 0 END) AS w
      |      FROM lens WHERE wl <> ll GROUP BY 1),
      |b AS (SELECT gb, n, w, n - w AS ns,
      |        n::HUGEINT * (w::HUGEINT * (n - w) + n) AS x
      |      FROM a),
      |s0 AS (SELECT *, CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT)
      |         AS y0 FROM b),
      |s1 AS (SELECT *, y0 - CASE WHEN y0::HUGEINT * y0 > x
      |         THEN 1 ELSE 0 END AS y1 FROM s0),
      |s2 AS (SELECT *, y1 + CASE WHEN (y1 + 1)::HUGEINT * (y1 + 1) <= x
      |         THEN 1 ELSE 0 END AS isq FROM s1)
      |SELECT gb::BIGINT AS gap_bucket, (gb * 2 + 1)::BIGINT AS gap_lo,
      |  ((gb + 1) * 2)::BIGINT AS gap_hi, n::BIGINT AS n_games,
      |  w::BIGINT AS n_longer_won, ns::BIGINT AS n_shorter_won,
      |  CAST((2 * w::HUGEINT * 1000000 + n) // (2 * n::HUGEINT)
      |    AS BIGINT) AS longer_win_micro,
      |  CAST((2 * ((w + 2)::HUGEINT * n - 2 * isq) * 1000000
      |      + n::HUGEINT * (n + 4))
      |    // (2 * n::HUGEINT * (n + 4)) AS BIGINT) AS wilson_lb_micro,
      |  CAST((2 * ((w + 2)::HUGEINT * n + 2 * isq) * 1000000
      |      + n::HUGEINT * (n + 4))
      |    // (2 * n::HUGEINT * (n + 4)) AS BIGINT) AS wilson_ub_micro
      |FROM s2 ORDER BY gap_bucket""".stripMargin

  // ── q352: Dawid–Skene judge confusion matrices ─────────────────────────

  /** q352: [[Preference.dawidSkeneConfusion]] — the q341 judge fixture
    * (order YEARS as judges, one deterministic priority label per
    * (customer, year)) folded to each customer's first 3 judge-years,
    * so every unit has exactly r = 3 ratings (the operator's Fleiss
    * completeness contract); 2 EM cycles + closing M-step. κ (q340)
    * said WHETHER the judges disagree; this table says WHO confuses
    * WHICH classes. */
  /** The shared q352/q357/q359/q360 judge fixture: order YEARS as
    * judges, one deterministic priority label per (customer, year),
    * TRUNCATED to each customer's first 3 judge-years — truncation
    * only; the completeness exclusion (exactly-3 for the fixed gates,
    * ≥ 2 for the ragged ones) is the OPERATOR's and surfaces in
    * n_units_excluded. Kept units and their π under the fixed-r path
    * are identical to the pre-r17 pre-filtered fixture. */
  private def dsFixture(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("o_custkey")).orderBy(col("judge"))
    dsFixtureFull(s, dir)
      .withColumn("graft_rn", row_number().over(wOrd))
      .filter(col("graft_rn") <= 3)
  }

  /** The UNTRUNCATED judge fixture — every (customer, judge-year) row,
    * however many years a customer ordered in. q369/q370 feed this raw
    * completeness spectrum to the ragged operators' `truncate = true`
    * path; the fixed/ragged default gates keep consuming the
    * pre-truncated [[dsFixture]]. */
  private def dsFixtureFull(s: SparkSession, dir: String): DataFrame = {
    val key = (floor(col("o_totalprice") * lit(100)).cast(LongType) *
      lit(10000000000L) + col("o_orderkey")).as("graft_k")
    Sources.orders(s, dir)
      .select(col("o_custkey"),
        year(col("o_orderdate")).cast("string").as("judge"),
        col("o_orderpriority").as("graft_p"), key)
      .groupBy(col("o_custkey"), col("judge"))
      .agg(max_by(col("graft_p"), col("graft_k")).as("graft_lbl"))
  }

  def q352DawidSkene(s: SparkSession, dir: String): DataFrame =
    Preference.dawidSkeneConfusion(dsFixture(s, dir), "o_custkey",
        "judge", "graft_lbl", r = 3, iters = 2)
      .orderBy(col("judge"), col("true_class"), col("label"))

  // ── shared Dawid–Skene oracle scaffolding (q352 + q357) ────────────────

  /** The q352/q357/q359/q360 fixture + T0 as WITH-chain members:
    * per-(customer, year) deterministic label, first 3 judge-years,
    * the kept-unit table `rt` (with per-unit ru) and loud exclusion
    * count `excl` per the given completeness predicates, classes/
    * judges/combos, the pivot (tail slots NULL for ragged units), and
    * the majority-vote start n_uc/r_u. */
  private def dsBaseSql(keepPred: String, exclPred: String): String =
    s"""o AS (SELECT o_custkey AS u,
      |    CAST(year(o_orderdate) AS VARCHAR) AS j,
      |    arg_max(o_orderpriority,
      |      CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000000
      |        + o_orderkey) AS l
      |  FROM orders GROUP BY 1, 2),
      |rk AS (SELECT u, j, l,
      |    row_number() OVER (PARTITION BY u ORDER BY j, l) AS rn,
      |    COUNT(*) OVER (PARTITION BY u) AS cnt FROM o),
      |rt AS (SELECT u, j, l, rn, LEAST(cnt, 3) AS ru
      |       FROM rk WHERE $keepPred AND rn <= 3),
      |excl AS (SELECT COUNT(DISTINCT u) AS nx FROM rk WHERE $exclPred),
      |cls AS (SELECT DISTINCT l AS c FROM rt),
      |nc AS (SELECT COUNT(*) AS k FROM cls),
      |jd AS (SELECT DISTINCT j FROM rt),
      |cb AS (SELECT jd.j, a.c AS tc, b.c AS lbl
      |       FROM jd CROSS JOIN cls a CROSS JOIN cls b),
      |pv AS (SELECT u, MAX(CASE WHEN rn = 1 THEN j END) AS j1,
      |         MAX(CASE WHEN rn = 1 THEN l END) AS l1,
      |         MAX(CASE WHEN rn = 2 THEN j END) AS j2,
      |         MAX(CASE WHEN rn = 2 THEN l END) AS l2,
      |         MAX(CASE WHEN rn = 3 THEN j END) AS j3,
      |         MAX(CASE WHEN rn = 3 THEN l END) AS l3
      |       FROM rt GROUP BY u),
      |t0 AS (SELECT u, l AS c,
      |         (2 * COUNT(*)::HUGEINT * 1000000 + MAX(ru))
      |           // (2 * MAX(ru)) AS t
      |       FROM rt GROUP BY u, l)""".stripMargin

  /** Fixed-r chain (q352/q357): the operator keeps exactly-3 units —
    * the fixture truncates to 3, so kept = cnt >= 3, excluded = the
    * units left with fewer than 3 ratings. */
  private val dsFixedBase: String = dsBaseSql("cnt >= 3", "cnt < 3")

  /** Ragged chain (q359/q360): units keep their own r_u ∈ 2..3; only
    * single-rating units are excluded. */
  private val dsRaggedBase: String = dsBaseSql("cnt >= 2", "cnt < 2")

  // one M-step: π and priors from t{i-1} (add-one smoothing in micros,
  // half-away division, 1-micro floor — the operator's exact formulas)
  private def dsMSql(i: Int): String =
    s"""m${i}n AS (SELECT r.j, t.c AS tc, r.l AS lbl, SUM(t.t) AS s
       |  FROM rt r JOIN t${i - 1} t ON t.u = r.u GROUP BY 1, 2, 3),
       |m${i}d AS (SELECT j, tc, SUM(s) AS d FROM m${i}n GROUP BY 1, 2),
       |pi$i AS (SELECT cb.j, cb.tc, cb.lbl,
       |  GREATEST(1, (2 * (COALESCE(n.s, 0) + 1000000)::HUGEINT * 1000000
       |      + COALESCE(d.d, 0) + nc.k * 1000000)
       |    // (2 * (COALESCE(d.d, 0) + nc.k * 1000000)::HUGEINT)) AS p
       |  FROM cb CROSS JOIN nc
       |  LEFT JOIN m${i}n n ON n.j = cb.j AND n.tc = cb.tc
       |    AND n.lbl = cb.lbl
       |  LEFT JOIN m${i}d d ON d.j = cb.j AND d.tc = cb.tc),
       |pc$i AS (SELECT c, SUM(t) AS s FROM t${i - 1} GROUP BY 1),
       |pt$i AS (SELECT SUM(t) AS tot FROM t${i - 1}),
       |pr$i AS (SELECT c, GREATEST(1,
       |    (2 * (s + 1000000)::HUGEINT * 1000000 + tot + nc.k * 1000000)
       |    // (2 * (tot + nc.k * 1000000)::HUGEINT)) AS p
       |  FROM pc$i CROSS JOIN pt$i CROSS JOIN nc)""".stripMargin

  // one E-step: score every class as prior · Π π over the unit's ≤ 3
  // rating slots (ragged tail slots LEFT-miss and contribute ×1 — for
  // complete units the LEFT joins match every slot, value-identical to
  // inner), renormalize per unit
  private def dsESql(i: Int): String =
    s"""e$i AS (SELECT pv.u, cls.c,
       |    pr.p::HUGEINT * COALESCE(p1.p, 1) * COALESCE(p2.p, 1)
       |      * COALESCE(p3.p, 1) AS num
       |  FROM pv CROSS JOIN cls
       |  JOIN pr$i pr ON pr.c = cls.c
       |  LEFT JOIN pi$i p1 ON p1.j = pv.j1 AND p1.tc = cls.c
       |    AND p1.lbl = pv.l1
       |  LEFT JOIN pi$i p2 ON p2.j = pv.j2 AND p2.tc = cls.c
       |    AND p2.lbl = pv.l2
       |  LEFT JOIN pi$i p3 ON p3.j = pv.j3 AND p3.tc = cls.c
       |    AND p3.lbl = pv.l3),
       |t$i AS (SELECT u, c, (2 * num * 1000000 + den) // (2 * den) AS t
       |  FROM (SELECT u, c, num, SUM(num) OVER (PARTITION BY u) AS den
       |        FROM e$i))""".stripMargin

  // the shared confusion-output SELECT over a 3-cycle chain
  private def dsConfusionSql(base: String): String =
    s"""WITH $base,
       |${dsMSql(1)},
       |${dsESql(1)},
       |${dsMSql(2)},
       |${dsESql(2)},
       |${dsMSql(3)},
       |nr AS (SELECT j, l AS lbl, COUNT(*) AS n FROM rt GROUP BY 1, 2)
       |SELECT p.j AS judge, p.tc AS true_class, p.lbl AS label,
       |  p.p::BIGINT AS pi_micro, COALESCE(nr.n, 0)::BIGINT AS n_ratings,
       |  excl.nx::BIGINT AS n_units_excluded
       |FROM pi3 p LEFT JOIN nr ON nr.j = p.j AND nr.lbl = p.lbl
       |CROSS JOIN excl
       |ORDER BY judge, true_class, label""".stripMargin

  val q352Sql: String = dsConfusionSql(dsFixedBase)

  // ── q357: Dawid–Skene posterior labels (the relabeled corpus) ──────────

  /** q357: [[Preference.dawidSkenePosteriors]] on the q352 fixture —
    * the EM's OTHER deliverable: per-unit class posteriors after 2
    * cycles with the MAP flag; units where the MAP class disagrees with
    * the raw majority vote are the rows Dawid–Skene re-decided by
    * down-weighting unreliable judge-years. */
  def q357DsPosteriors(s: SparkSession, dir: String): DataFrame =
    Preference.dawidSkenePosteriors(dsFixture(s, dir), "o_custkey",
        "judge", "graft_lbl", r = 3, iters = 2)
      .orderBy(col("unit"), col("true_class"))

  val q357Sql: String =
    s"""WITH $dsFixedBase,
       |${dsMSql(1)},
       |${dsESql(1)},
       |${dsMSql(2)},
       |${dsESql(2)}
       |SELECT CAST(u AS VARCHAR) AS unit, c AS true_class,
       |  t::BIGINT AS t_micro, (rnk = 1) AS is_map,
       |  excl.nx::BIGINT AS n_units_excluded
       |FROM (SELECT u, c, t, row_number() OVER (
       |        PARTITION BY u ORDER BY t DESC, c) AS rnk FROM t2)
       |CROSS JOIN excl
       |ORDER BY unit, true_class""".stripMargin

  // ── q359/q360: RAGGED Dawid–Skene (per-unit rating counts) ─────────────

  /** q359: [[Preference.dawidSkeneConfusionRagged]] on the UNTRUNCATED
    * completeness spectrum of the q352 fixture — customers with 2 OR 3
    * judge-years all contribute (T₀ divides by each unit's own r_u; the
    * E-step's missing third slot is a neutral ×1 factor), only
    * single-year customers are excluded (loudly). The judge set — and
    * therefore the confusion table itself — now covers the incomplete
    * units the fixed-r gate drops. */
  def q359DsRaggedConfusion(s: SparkSession, dir: String): DataFrame = {
    Preference.dawidSkeneConfusionRagged(dsFixture(s, dir), "o_custkey",
        "judge", "graft_lbl", rMax = 3, iters = 2)
      .orderBy(col("judge"), col("true_class"), col("label"))
  }

  val q359Sql: String = dsConfusionSql(dsRaggedBase)

  /** q360: [[Preference.dawidSkenePosteriorsRagged]] — the relabeled
    * corpus over ALL units with ≥ 2 judge-years, each row carrying the
    * unit's own evidence count r_u (n_ratings) next to the posterior. */
  def q360DsRaggedPosteriors(s: SparkSession, dir: String): DataFrame = {
    Preference.dawidSkenePosteriorsRagged(dsFixture(s, dir), "o_custkey",
        "judge", "graft_lbl", rMax = 3, iters = 2)
      .orderBy(col("unit"), col("true_class"))
  }

  // ── q369/q370: ragged Dawid–Skene with TRUNCATION (the keep-everything
  //    path) ────────────────────────────────────────────────────────────

  /** q369: [[Preference.dawidSkeneConfusionRagged]] with
    * `truncate = true` over the UNTRUNCATED fixture — customers with
    * MORE than rMax judge-years are no longer excluded but kept on
    * their first rMax ratings in deterministic (judge, label) order
    * (r17 ADVICE: the default >rMax exclusion can drop most of a real
    * judge log). The oracle is DELIBERATELY q359's chain verbatim: its
    * base CTE truncates the raw spectrum with the identical
    * row_number ≤ 3 rule, so hash-green proves the operator's internal
    * truncation reproduces the external pre-truncation exactly —
    * confusion tables, n_ratings and the (now smaller) exclusion
    * ledger all bit-identical. */
  def q369DsRaggedTruncate(s: SparkSession, dir: String): DataFrame =
    Preference.dawidSkeneConfusionRagged(dsFixtureFull(s, dir), "o_custkey",
        "judge", "graft_lbl", rMax = 3, iters = 2, truncate = true)
      .orderBy(col("judge"), col("true_class"), col("label"))

  val q369Sql: String = dsConfusionSql(dsRaggedBase)

  /** q370: [[Preference.dawidSkenePosteriorsRagged]] with
    * `truncate = true` — q369's posterior twin: every multi-year
    * customer keeps a posterior (truncated units report
    * n_ratings = rMax), oracle = q360's chain verbatim. */
  def q370DsRaggedPostTruncate(s: SparkSession, dir: String): DataFrame =
    Preference.dawidSkenePosteriorsRagged(dsFixtureFull(s, dir), "o_custkey",
        "judge", "graft_lbl", rMax = 3, iters = 2, truncate = true)
      .orderBy(col("unit"), col("true_class"))

  val q360Sql: String =
    s"""WITH $dsRaggedBase,
       |${dsMSql(1)},
       |${dsESql(1)},
       |${dsMSql(2)},
       |${dsESql(2)},
       |ru AS (SELECT u, MAX(ru) AS r FROM rt GROUP BY u)
       |SELECT CAST(t2.u AS VARCHAR) AS unit, c AS true_class,
       |  t::BIGINT AS t_micro, (rnk = 1) AS is_map,
       |  ru.r::BIGINT AS n_ratings,
       |  excl.nx::BIGINT AS n_units_excluded
       |FROM (SELECT u, c, t, row_number() OVER (
       |        PARTITION BY u ORDER BY t DESC, c) AS rnk FROM t2) t2
       |JOIN ru ON ru.u = t2.u
       |CROSS JOIN excl
       |ORDER BY unit, true_class""".stripMargin

  // ── q345: Borda count over the listwise fixture ────────────────────────

  /** q345: [[Preference.bordaCount]] over q337's per-customer priority
    * rankings — the positional baseline whose disagreement with the PL
    * strengths flags position bias before a leaderboard ships. */
  def q345Borda(s: SparkSession, dir: String): DataFrame = {
    val key = (floor(col("o_totalprice") * lit(100)).cast(LongType) *
      lit(10000000000L) + col("o_orderkey")).as("graft_k")
    val best = Sources.orders(s, dir)
      .select(col("o_custkey"), col("o_orderpriority").as("graft_pri"),
        key)
      .groupBy(col("o_custkey"), col("graft_pri"))
      .agg(max(col("graft_k")).as("graft_bk"))
    val ranked = best.withColumn("graft_pos",
      row_number().over(Window.partitionBy(col("o_custkey"))
        .orderBy(col("graft_bk").desc, col("graft_pri").asc)))
    Preference.bordaCount(ranked, "o_custkey", "graft_pri", "graft_pos")
      .orderBy(col("item"))
  }

  val q345Sql: String =
    """WITH o AS (SELECT o_custkey, o_orderpriority AS pri,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000000
      |      + o_orderkey AS k
      |  FROM orders),
      |best AS (SELECT o_custkey, pri, MAX(k) AS bk FROM o GROUP BY 1, 2),
      |rk AS (SELECT o_custkey, pri, row_number() OVER (
      |    PARTITION BY o_custkey ORDER BY bk DESC, pri) AS pos
      |  FROM best),
      |wm AS (SELECT o_custkey, pri, pos,
      |         COUNT(*) OVER (PARTITION BY o_custkey) AS m
      |       FROM rk),
      |f AS (SELECT pri AS item, m - pos AS pts,
      |        ((m - pos)::HUGEINT * 1000000) // (m - 1) AS norm
      |      FROM wm WHERE m >= 2)
      |SELECT item, COUNT(*)::BIGINT AS n_lists,
      |  SUM(pts)::BIGINT AS borda_score,
      |  CAST((2 * SUM(norm) + COUNT(*)) // (2 * COUNT(*)::HUGEINT)
      |    AS BIGINT) AS borda_mean_micro
      |FROM f GROUP BY 1 ORDER BY item""".stripMargin
}
