package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StringType}

/**
 * Pairwise-preference modeling — the ranking side of an RLHF /
 * preference-data pipeline: turn "A was preferred over B" comparisons
 * into per-item strength scores. The reference's analytics layer ranks
 * by raw deltas (gold top/bottom movers, 3-spark…py:86-105); preference
 * data needs the latent-strength model instead because raw win RATES are
 * incomparable across items with different opponent mixes.
 */
object Preference {

  private val big = DecimalType(38, 0)
  private val S = 1000000L // strength fixed-point scale (micro)

  /**
   * Bradley–Terry strength estimation (Bradley & Terry 1952) via the
   * MM / minorization-maximization update (Hunter, Annals of Stats
   * 2004): p_i ← W_i / Σ_j n_ij/(p_i+p_j), iterated a fixed number of
   * rounds from a uniform start. The standard model for turning pairwise
   * preference comparisons (RLHF annotator choices, A/B eval wins) into
   * a consistent per-item strength scale — unlike raw win rate, an item
   * beaten only by champions outranks one feasting on weak opponents.
   *
   * Regularization: every OBSERVED pair {i,j} gets one virtual win in
   * each direction (w_ij += 1, n_ij += 2) — the Beta-prior pseudo-count
   * that keeps never-winning items at finite strength and the MM
   * denominator positive (without it an all-losses item collapses to 0
   * and a later p_i+p_j hits 0/0).
   *
   * Determinism contract: strengths live in micro fixed point
   * (start = 10⁶), every division is integral (`div`) over DECIMAL(38,0)
   * products, per-term rounding is part of the definition (both engines
   * sum the same floored terms), and a floor of 1 micro keeps every
   * strength positive — bit-identical on any engine, no libm. Strengths
   * are scale-free (the model is invariant to a global factor), so no
   * per-round normalization is applied; with the uniform start the
   * magnitudes stay O(S · win-ratio).
   *
   * Scale shape: ONE (winner, loser) hash-agg over the comparison log
   * (map-side combinable), then every iteration runs over the
   * |observed pairs|-row table — ITEM-scale metadata, not corpus scale
   * (pairs ≤ |items|²; for LLM eval |items| is models/policies/sources).
   * The pair table is localCheckpointed once and reused each round.
   *
   * Output: one row per item — `n_wins`/`n_games` (raw, unsmoothed) and
   * `bt_scaled` (final strength in micros, BIGINT).
   */
  def bradleyTerry(comparisons: DataFrame, winnerCol: String,
                   loserCol: String, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters=$iters out of range")
    val games = comparisons
      .select(col(winnerCol).cast(StringType).as("graft_w"),
        col(loserCol).cast(StringType).as("graft_l"))
      .filter(col("graft_w").isNotNull && col("graft_l").isNotNull &&
        col("graft_w") =!= col("graft_l"))
    // raw directed win counts: the ONLY corpus-scale pass
    val wd = games.groupBy(col("graft_w"), col("graft_l"))
      .agg(count(lit(1)).as("graft_c"))
      .localCheckpoint(eager = false)
    // observed unordered pairs -> both directions, +1 virtual win each
    val und = wd.select(least(col("graft_w"), col("graft_l")).as("a"),
        greatest(col("graft_w"), col("graft_l")).as("b"))
      .distinct()
    val dirs = und.select(col("a").as("i"), col("b").as("j"))
      .union(und.select(col("b").as("i"), col("a").as("j")))
    val wsm = dirs
      .join(wd, dirs("i") === wd("graft_w") && dirs("j") === wd("graft_l"),
        "left")
      .select(col("i"), col("j"),
        (coalesce(col("graft_c"), lit(0L)) + lit(1L)).as("graft_wij"))
    val pairTbl = wsm.as("x")
      .join(wsm.as("y"),
        col("x.i") === col("y.j") && col("x.j") === col("y.i"))
      .select(col("x.i").as("i"), col("x.j").as("j"),
        col("x.graft_wij").as("graft_wij"),
        (col("x.graft_wij") + col("y.graft_wij")).as("graft_nij"))
      .localCheckpoint(eager = false)
    val totals = pairTbl.groupBy(col("i").as("item"))
      .agg(sum(col("graft_wij").cast(big)).as("graft_wt"))
      .localCheckpoint(eager = false)
    var p = totals.select(col("item"), lit(S).as("graft_bt"))
    for (_ <- 1 to iters) {
      val pi = p.select(col("item").as("i"), col("graft_bt").as("graft_pi"))
      val pj = p.select(col("item").as("j"), col("graft_bt").as("graft_pj"))
      val d = pairTbl.join(pi, Seq("i")).join(pj, Seq("j"))
        .select(col("i").as("item"),
          call_function("div",
            (col("graft_nij").cast(big) * lit(S).cast(big) *
              lit(S).cast(big)).cast(big),
            (col("graft_pi") + col("graft_pj")).cast(big)).as("graft_t"))
        .groupBy(col("item"))
        .agg(sum(col("graft_t").cast(big)).as("graft_d"))
      p = totals.join(d, Seq("item"))
        .select(col("item"),
          greatest(lit(1L), call_function("div",
            (col("graft_wt") * lit(S).cast(big) * lit(S).cast(big))
              .cast(big),
            col("graft_d"))).as("graft_bt"))
    }
    val rawW = wd.groupBy(col("graft_w").as("item"))
      .agg(sum(col("graft_c")).as("n_wins"))
    val rawG = wd.select(col("graft_w").as("item"), col("graft_c"))
      .union(wd.select(col("graft_l").as("item"), col("graft_c")))
      .groupBy(col("item")).agg(sum(col("graft_c")).as("n_games"))
    p.join(rawG, Seq("item"))
      .join(rawW, Seq("item"), "left")
      .select(col("item"), coalesce(col("n_wins"), lit(0L)).as("n_wins"),
        col("n_games"), col("graft_bt").cast(LongType).as("bt_scaled"))
  }
}
