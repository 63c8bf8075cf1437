package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DecimalType, DoubleType, LongType, StringType}

/**
 * Pairwise-preference modeling — the ranking side of an RLHF /
 * preference-data pipeline: turn "A was preferred over B" comparisons
 * into per-item strength scores. The reference's analytics layer ranks
 * by raw deltas (gold top/bottom movers, 3-spark…py:86-105); preference
 * data needs the latent-strength model instead because raw win RATES are
 * incomparable across items with different opponent mixes.
 *
 * Why Bradley–Terry / Rank Centrality and not Elo: Elo is an ONLINE
 * update — each game mutates both players' ratings, so the result
 * depends on game ORDER and the computation is inherently sequential
 * (a single driver-side fold at 100 TB). Over a static eval log the
 * order is an artifact, and BT is exactly the order-free batch
 * estimator of the same paired-comparison model (Elo's expected-score
 * curve IS the BT logistic) — so this layer ships BT + the spectral
 * Rank Centrality instead of a distributed Elo that would be wrong by
 * construction.
 */
object Preference {

  private val big = DecimalType(38, 0)
  private val S = 1000000L // strength fixed-point scale (micro)

  /** Cleaned (winner, loser) projection: strings, non-null, no self-play. */
  private def cleanGames(comparisons: DataFrame, winnerCol: String,
                         loserCol: String): DataFrame =
    comparisons
      .select(col(winnerCol).cast(StringType).as("graft_w"),
        col(loserCol).cast(StringType).as("graft_l"))
      .filter(col("graft_w").isNotNull && col("graft_l").isNotNull &&
        col("graft_w") =!= col("graft_l"))

  /** Directed win counts (graft_w, graft_l, graft_c) — the ONLY
    * corpus-scale pass any operator here makes; everything downstream is
    * |items|²-bounded metadata. */
  private def directedWins(games: DataFrame): DataFrame =
    games.groupBy(col("graft_w"), col("graft_l"))
      .agg(count(lit(1)).as("graft_c"))

  /** Smoothed symmetric pair table (i, j, graft_wij, graft_nij): every
    * OBSERVED unordered pair in both directions with one virtual win
    * added each way (w_ij += 1, n_ij += 2) — the Beta-prior pseudo-count
    * shared by [[bradleyTerry]] and [[rankCentrality]] that keeps
    * never-winning items at finite strength and every denominator
    * positive. */
  private def smoothedPairTable(wd: DataFrame): DataFrame = {
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
    wsm.as("x")
      .join(wsm.as("y"),
        col("x.i") === col("y.j") && col("x.j") === col("y.i"))
      .select(col("x.i").as("i"), col("x.j").as("j"),
        col("x.graft_wij").as("graft_wij"),
        (col("x.graft_wij") + col("y.graft_wij")).as("graft_nij"))
  }

  /** Raw per-item (item, n_wins, n_games) attach used by the rating
    * operators' outputs (unsmoothed — the reader sees the real record). */
  private def rawRecord(wd: DataFrame): DataFrame = {
    val rawW = wd.groupBy(col("graft_w").as("item"))
      .agg(sum(col("graft_c")).as("n_wins"))
    val rawG = wd.select(col("graft_w").as("item"), col("graft_c"))
      .union(wd.select(col("graft_l").as("item"), col("graft_c")))
      .groupBy(col("item")).agg(sum(col("graft_c")).as("n_games"))
    rawG.join(rawW, Seq("item"), "left")
      .select(col("item"), coalesce(col("n_wins"), lit(0L)).as("n_wins"),
        col("n_games"))
  }

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
    val games = cleanGames(comparisons, winnerCol, loserCol)
    // raw directed win counts: the ONLY corpus-scale pass
    val wd = directedWins(games).localCheckpoint(eager = false)
    val pairTbl = smoothedPairTable(wd).localCheckpoint(eager = false)
    val totals = pairTbl.groupBy(col("i").as("item"))
      .agg(sum(col("graft_wij").cast(big)).as("graft_wt"))
      .localCheckpoint(eager = false)
    var p = totals.select(col("item"), lit(S).as("graft_bt"))
    for (_ <- 1 to iters) {
      // |items|-row strength attaches: broadcast by contract (items are
      // models/policies, metadata-scale) — the plan must say so instead
      // of leaning on AQE thresholds (r13 verdict item 5)
      val pi = broadcast(
        p.select(col("item").as("i"), col("graft_bt").as("graft_pi")))
      val pj = broadcast(
        p.select(col("item").as("j"), col("graft_bt").as("graft_pj")))
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
        // r20: same cut as the bootstrap loop — p is broadcast twice
        // next round; without the cut each broadcast re-ran the round's
        // MM update (metadata-scale rows, so the cut is ~free)
        .localCheckpoint(eager = false)
    }
    p.join(rawRecord(wd), Seq("item"))
      .select(col("item"), col("n_wins"), col("n_games"),
        col("graft_bt").cast(LongType).as("bt_scaled"))
  }

  /**
   * Pairwise win-rate matrix: one row per OBSERVED unordered item pair
   * (item_a < item_b lexically) with both directed win counts, the game
   * total, and item_a's exact win rate in micros — the raw eval-log
   * scoreboard ("model A beats model B 62% of the time") that the
   * latent-strength models ([[bradleyTerry]], [[rankCentrality]])
   * summarize, and the table a human reads to sanity-check them.
   *
   * Hashed surface: exact int64 counts and a half-away micro ratio —
   * no floating point. Scale shape: ONE (winner, loser) map-side-
   * combinable hash-agg over the comparison log, then a fold to
   * unordered pairs — output ≤ |items|² rows, items being
   * models/policies/sources (metadata-scale by the layer's contract).
   */
  def winRateMatrix(comparisons: DataFrame, winnerCol: String,
                    loserCol: String): DataFrame = {
    val wd = directedWins(cleanGames(comparisons, winnerCol, loserCol))
    wd.select(
        least(col("graft_w"), col("graft_l")).as("item_a"),
        greatest(col("graft_w"), col("graft_l")).as("item_b"),
        when(col("graft_w") < col("graft_l"), col("graft_c"))
          .otherwise(0L).as("graft_ca"),
        when(col("graft_w") > col("graft_l"), col("graft_c"))
          .otherwise(0L).as("graft_cb"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(sum(col("graft_ca")).as("wins_a"),
        sum(col("graft_cb")).as("wins_b"))
      .select(col("item_a"), col("item_b"), col("wins_a"), col("wins_b"),
        (col("wins_a") + col("wins_b")).as("n_games"),
        ExactRound.halfAwayDiv(
          col("wins_a").cast(big) * lit(1000000L).cast(big),
          (col("wins_a") + col("wins_b")).cast(big))
          .as("winrate_a_micro"))
  }

  /** Exact integer floor-sqrt: floor(sqrt(double(x))) is within ±1 of
    * ⌊√x⌋ (cast and sqrt are IEEE-correctly-rounded in every engine, so
    * the seed's absolute error is ≈ √x · 2⁻⁵², which stays < 1 for
    * x < ~2·10³¹ — for [[wilsonWinRates]]' x ≈ n³/4 that is n ≲ 4·10¹⁰
    * games per pair, far past any eval log), so one downward and one
    * upward integer correction make it EXACT — the only way to put a
    * square root on a hashed surface (PORTABILITY.md rule 2/4: the
    * double seed is identical cross-engine, the corrections are integer
    * comparisons). Callers must keep x below ~2·10³¹ for the ±1-wide
    * seed guarantee to hold. */
  private def isqrt(x: Column): Column = {
    val y0 = floor(sqrt(x.cast(DoubleType))).cast(LongType)
    val y1 = y0 - when(y0.cast(big) * y0.cast(big) > x.cast(big), 1L)
      .otherwise(0L)
    y1 + when((y1 + 1).cast(big) * (y1 + 1).cast(big) <= x.cast(big), 1L)
      .otherwise(0L)
  }

  /**
   * [[winRateMatrix]] plus the Wilson score interval (Wilson 1927) at
   * z = 2 (~95.45%) for item_a's true win probability — the
   * leaderboard-grade version of the raw matrix: a 2/2 record stops
   * reading as "100%, same as 200/200" (lower bounds 1/3 vs ~0.98
   * at z = 2). With z² = 4 the interval is
   * ((w+2)·n ∓ 2·√(n·(w(n−w)+n))) / (n(n+4)) — rational except the
   * root, which goes through [[isqrt]] (exact ⌊√X⌋, cross-engine
   * deterministic); both bounds sit within 2/(n(n+4)) of the
   * real-valued Wilson bounds, identically on every engine. All other
   * arithmetic is exact int64/decimal; bounds are half-away micros.
   *
   * Scale shape: identical to [[winRateMatrix]] (one corpus hash-agg,
   * ≤ |items|² output rows); the interval is a per-row projection.
   */
  def wilsonWinRates(comparisons: DataFrame, winnerCol: String,
                     loserCol: String): DataFrame = {
    val m = winRateMatrix(comparisons, winnerCol, loserCol)
    val w = col("wins_a"); val n = col("n_games")
    // X = n·(w(n−w) + n); bounds = ((w+2)n ∓ 2√X) / (n(n+4))
    val x = n.cast(big) * (w.cast(big) * (n - w).cast(big) + n.cast(big))
    val s = isqrt(x)
    val den = (n.cast(big) * (n + 4).cast(big)).cast(big)
    m.select(col("item_a"), col("item_b"), col("wins_a"), col("wins_b"),
      col("n_games"), col("winrate_a_micro"),
      ExactRound.halfAwayDiv(
        ((w + 2).cast(big) * n.cast(big) - lit(2L).cast(big) * s.cast(big))
          .cast(big) * lit(1000000L).cast(big), den)
        .as("wilson_lb_a_micro"),
      ExactRound.halfAwayDiv(
        ((w + 2).cast(big) * n.cast(big) + lit(2L).cast(big) * s.cast(big))
          .cast(big) * lit(1000000L).cast(big), den)
        .as("wilson_ub_a_micro"))
  }

  /**
   * Copeland scores (Copeland 1951): each item's count of opponents it
   * beats by strict MAJORITY of head-to-head games, ties counted half —
   * the voting-theory ranking that, unlike raw win rate, cannot be
   * gamed by feasting on one weak opponent many times (each opponent
   * contributes at most one majority point regardless of game count).
   * A Condorcet winner (beats every opponent head-to-head) is exactly
   * an item with maj_wins = n_opponents.
   *
   * `copeland2` doubles the classic score so ties stay integral:
   * 2·maj_wins + maj_ties. Exact integers throughout; shape = the
   * [[winRateMatrix]] pass plus an |items|-row re-agg.
   */
  def copelandScores(comparisons: DataFrame, winnerCol: String,
                     loserCol: String): DataFrame = {
    val m = winRateMatrix(comparisons, winnerCol, loserCol)
    val dirViews = m.select(col("item_a").as("item"),
        col("wins_a").as("graft_wf"), col("wins_b").as("graft_wa"))
      .union(m.select(col("item_b").as("item"),
        col("wins_b").as("graft_wf"), col("wins_a").as("graft_wa")))
    dirViews.groupBy(col("item"))
      .agg(count(lit(1)).as("n_opponents"),
        sum(when(col("graft_wf") > col("graft_wa"), 1L).otherwise(0L))
          .as("maj_wins"),
        sum(when(col("graft_wf") === col("graft_wa"), 1L).otherwise(0L))
          .as("maj_ties"),
        sum(when(col("graft_wf") < col("graft_wa"), 1L).otherwise(0L))
          .as("maj_losses"))
      .withColumn("copeland2",
        lit(2L) * col("maj_wins") + col("maj_ties"))
  }

  /**
   * Rank Centrality (Negahban, Oh & Shah, NeurIPS 2012 / Op. Res.
   * 2017): the stationary distribution of a random walk that moves from
   * item i to item j with probability proportional to the fraction of
   * games j WON against i — walkers pile up on items that beat strong
   * opponents. The spectral counterpart of [[bradleyTerry]] (provably
   * consistent for the same BTL model); running both and comparing
   * ranks is the standard robustness check on preference data.
   *
   * Same smoothing as BT (one virtual win each way per observed pair).
   * Transition mass out of i toward j in one step:
   * term(i→j) = (π_i · w_ji_smoothed) // (n_ij · d), with d = max
   * observed opponent count (the walk's degree normalizer — rows stay
   * substochastic, the remainder is the self-loop). Each term is ONE
   * integral division over DECIMAL(38,0) products (per-term flooring is
   * part of the definition — any engine reproduces it bit-exactly), and
   * π'_j = π_j − Σ_k term(j→k) + Σ_i term(i→j): the same floored terms
   * move out of one item and into another, so total mass is conserved
   * EXACTLY — no renormalization, no drift, π stays O(S) from the
   * uniform start π⁰ = S.
   *
   * Scale shape: identical to [[bradleyTerry]] — one corpus hash-agg,
   * then every iteration runs over the |observed pairs|-row table
   * (localCheckpointed once); d is a 1-row broadcast.
   */
  def rankCentrality(comparisons: DataFrame, winnerCol: String,
                     loserCol: String, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters=$iters out of range")
    val games = cleanGames(comparisons, winnerCol, loserCol)
    val wd = directedWins(games).localCheckpoint(eager = false)
    val pairTbl = smoothedPairTable(wd).localCheckpoint(eager = false)
    val deg = pairTbl.groupBy(col("i").as("item"))
      .agg(count(lit(1)).as("graft_deg"))
      .localCheckpoint(eager = false)
    val dmax = deg.agg(max(col("graft_deg")).as("graft_d"))
    var p = deg.select(col("item"), lit(S).as("graft_rc"))
    for (_ <- 1 to iters) {
      val flows = pairTbl
        .join(broadcast(p.select(col("item").as("i"),
          col("graft_rc").as("graft_pi"))), Seq("i"))
        .crossJoin(broadcast(dmax))
        .select(col("i"), col("j"),
          call_function("div",
            (col("graft_pi").cast(big) *
              (col("graft_nij") - col("graft_wij")).cast(big)).cast(big),
            (col("graft_nij").cast(big) * col("graft_d").cast(big))
              .cast(big)).as("graft_t"))
        .localCheckpoint(eager = false) // two consumers: out + in
      val out = flows.groupBy(col("i").as("item"))
        .agg(sum(col("graft_t").cast(big)).as("graft_out"))
      val inn = flows.groupBy(col("j").as("item"))
        .agg(sum(col("graft_t").cast(big)).as("graft_in"))
      p = p.join(out, Seq("item"), "left").join(inn, Seq("item"), "left")
        .select(col("item"),
          (col("graft_rc").cast(big) -
            coalesce(col("graft_out"), lit(0L).cast(big)) +
            coalesce(col("graft_in"), lit(0L).cast(big))).as("graft_rc"))
    }
    p.join(rawRecord(wd), Seq("item"))
      .select(col("item"), col("n_wins"), col("n_games"),
        col("graft_rc").cast(LongType).as("rc_scaled"))
  }

  /**
   * Per-item win-rate with a hashed Poisson-bootstrap band (Chamandy
   * 2012's one-pass bootstrap, the [[Sampling.poissonBootstrapMean]]
   * machinery applied to GAMES): each replicate resamples whole games —
   * one deterministic hash weight per (rep, game id), shared by both
   * participants, so a replicate sees a coherent alternative eval log —
   * and reports the 5%-trimmed replicate band around each item's win
   * rate. The error bars a leaderboard owes its readers: item ranks
   * whose bands overlap are not decided by this log.
   *
   * Determinism: Poisson(1) weights from the pinned integer CDF
   * thresholds over h48(salt, rep, id) — no RNG state; replicate rates
   * are half-away micros; band endpoints are order statistics of those
   * exact integers. Any engine reproduces the identical band.
   *
   * Scale shape: the corpus is touched twice (the ×reps weighted pass —
   * narrow, map-side-combinable per (item, rep) — and the raw-record
   * pass), both corpus-linear; per-item state is the reps-bounded
   * replicate list.
   */
  def bootstrapWinRate(comparisons: DataFrame, idCol: String,
                       winnerCol: String, loserCol: String, salt: String,
                       reps: Int = 20): DataFrame = {
    require(reps >= 2 && reps <= 64, s"reps=$reps out of range (2..64)")
    val games = comparisons
      .select(col(idCol).as("graft_id"),
        col(winnerCol).cast(StringType).as("graft_w"),
        col(loserCol).cast(StringType).as("graft_l"))
      .filter(col("graft_id").isNotNull && col("graft_w").isNotNull &&
        col("graft_l").isNotNull && col("graft_w") =!= col("graft_l"))
      .localCheckpoint(eager = false) // weighted pass + raw record
    val thresholds = array(Sampling.poissonThresholds48.map(lit): _*)
    val rows = games
      .withColumn("graft_r", explode(expr(s"sequence(0, ${reps - 1})")))
    val h48 = conv(substring(md5(concat_ws("_", lit(salt), col("graft_r"),
      col("graft_id"))), 1, 12), 16, 10).cast(LongType)
    val weighted = rows.withColumn("graft_wt",
      size(filter(thresholds, t => h48 >= t)).cast(LongType))
    val dirViews = weighted.select(col("graft_w").as("item"),
        col("graft_r"), col("graft_wt"), lit(1L).as("graft_win"))
      .union(weighted.select(col("graft_l").as("item"),
        col("graft_r"), col("graft_wt"), lit(0L).as("graft_win")))
    val repRates = dirViews.groupBy(col("item"), col("graft_r"))
      .agg(sum((col("graft_wt") * col("graft_win")).cast(big))
          .as("graft_sw"),
        sum(col("graft_wt")).as("graft_sg"))
      .select(col("item"), when(col("graft_sg") > 0,
        ExactRound.halfAwayDiv(
          col("graft_sw").cast(big) * lit(1000000L).cast(big),
          col("graft_sg"))).as("graft_m"))
    val point = rawRecord(directedWins(
        games.select(col("graft_w"), col("graft_l"))))
      .select(col("item"), col("n_wins"), col("n_games"),
        ExactRound.halfAwayDiv(
          col("n_wins").cast(big) * lit(1000000L).cast(big),
          col("n_games")).as("winrate_micro"))
    val trim = repRates.groupBy(col("item"))
      .agg(sort_array(collect_list(col("graft_m"))).as("graft_ms"))
      .withColumn("graft_mn", size(col("graft_ms")))
      .withColumn("graft_tr", expr("graft_mn div 20").cast("int"))
      .select(col("item"), col("graft_mn").cast(LongType).as("n_reps"),
        element_at(col("graft_ms"), col("graft_tr") + 1)
          .as("boot_lo_micro"),
        element_at(col("graft_ms"), col("graft_mn") - col("graft_tr"))
          .as("boot_hi_micro"))
    point.join(trim, Seq("item"))
      .select(col("item"), col("n_wins"), col("n_games"),
        col("winrate_micro"), col("n_reps"), col("boot_lo_micro"),
        col("boot_hi_micro"))
  }

  /**
   * Plackett–Luce strength estimation over RANKED LISTS (Plackett 1975;
   * Luce 1959) via Hunter's MM update (Annals of Statistics 2004, §5) —
   * the listwise generalization of [[bradleyTerry]]: annotators that
   * rank k responses per prompt (the RLHF listwise case) carry strictly
   * more signal than their pairwise projection, and PL consumes the
   * list directly. Model: a ranking is built by repeatedly sampling the
   * next item ∝ its strength from the remaining pool; the MM update is
   *   p_i ← W_i / Σ_{(list, stage): i in the stage's pool} 1/D_stage,
   * with W_i = i's non-last-place appearances and D_stage the pool's
   * strength sum.
   *
   * Input: one row per (list id, item, 1-based position); items must be
   * DISTINCT within a list, must not contain '|' (the internal pattern
   * separator), and lists of length < 2 are ignored (a 1-item list
   * carries no choice). No smoothing is applied: an item
   * that never beats anything decays to the 1-micro floor (unlike BT's
   * virtual-win prior, a virtual RANKING would have to invent an order;
   * regularize upstream if the comparison graph is weakly connected).
   *
   * Determinism contract (the [[bradleyTerry]] discipline): strengths
   * in micro fixed point, every stage reciprocal is ONE integral
   * division ⌊S²/D⌋, every division over DECIMAL(38,0), floor of 1
   * micro — bit-identical on any engine.
   *
   * Scale shape: lists collapse to DISTINCT ranking PATTERNS with
   * counts in ONE corpus pass (patterns ≤ Σ_m |items|^m — metadata for
   * the layer's model/policy-scale items); every iteration runs two
   * pattern-partitioned windows (suffix strength sums, prefix
   * reciprocal sums — bounded by list length) plus item-keyed aggs over
   * the pattern rows. The corpus is never touched again.
   */
  def plackettLuce(rankings: DataFrame, listCol: String, itemCol: String,
                   posCol: String, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters=$iters out of range")
    val rows = rankings
      .select(col(listCol).as("graft_rid"),
        col(itemCol).cast(StringType).as("graft_item"),
        col(posCol).cast(LongType).as("graft_pos"))
      .filter(col("graft_rid").isNotNull && col("graft_item").isNotNull &&
        col("graft_pos").isNotNull)
    // ONE corpus pass: each list -> its pattern string; then pattern
    // counts + one exemplar row set per pattern (metadata-scale)
    val pats = rows.groupBy(col("graft_rid"))
      .agg(concat_ws("|", transform(
          array_sort(collect_list(struct(col("graft_pos"),
            col("graft_item")))),
          s => s.getField("graft_item"))).as("graft_pat"),
        count(lit(1)).as("graft_m"))
      .filter(col("graft_m") >= 2)
      .groupBy(col("graft_pat"), col("graft_m"))
      .agg(count(lit(1)).as("graft_cnt"))
    val stage = pats
      .select(col("graft_pat"), col("graft_m"), col("graft_cnt"),
        posexplode(split(col("graft_pat"), "\\|"))
          .as(Seq("graft_p0", "graft_item")))
      .select(col("graft_pat"), col("graft_m"), col("graft_cnt"),
        (col("graft_p0") + 1).cast(LongType).as("graft_pos"),
        col("graft_item"))
      .localCheckpoint(eager = false) // reused every iteration
    val w = stage.filter(col("graft_pos") < col("graft_m"))
      .groupBy(col("graft_item").as("item"))
      .agg(sum(col("graft_cnt")).as("graft_w"))
    val appearances = stage.groupBy(col("graft_item").as("item"))
      .agg(sum(col("graft_cnt")).as("n_lists"))
    val wSuf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("graft_pat")).orderBy(col("graft_pos").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val wPre = org.apache.spark.sql.expressions.Window
      .partitionBy(col("graft_pat")).orderBy(col("graft_pos").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    var p = appearances.select(col("item"), lit(S).cast(big).as("graft_pl"))
    for (_ <- 1 to iters) {
      val joined = stage
        .join(broadcast(p.select(col("item").as("graft_item"),
          col("graft_pl"))), Seq("graft_item"))
      val d = joined
        .withColumn("graft_dsuf", sum(col("graft_pl")).over(wSuf))
        .withColumn("graft_term",
          when(col("graft_pos") < col("graft_m"), call_function("div",
            (lit(S).cast(big) * lit(S).cast(big)).cast(big),
            col("graft_dsuf").cast(big))).otherwise(lit(0L).cast(big)))
        .withColumn("graft_cum", sum(col("graft_term")).over(wPre))
        .groupBy(col("graft_item").as("item"))
        .agg(sum((col("graft_cnt").cast(big) * col("graft_cum")).cast(big))
          .as("graft_d"))
      // d covers EVERY item in an m>=2 pattern (each stage row feeds its
      // item's cum) — iterate over d, not w: an always-last item (W = 0)
      // must KEEP its floored strength row, because it still sits in
      // other items' pool denominators next round
      p = d.join(w, Seq("item"), "left")
        .select(col("item"),
          greatest(lit(1L).cast(big), call_function("div",
            (coalesce(col("graft_w"), lit(0L)).cast(big) *
              lit(S).cast(big) * lit(S).cast(big)).cast(big),
            col("graft_d"))).as("graft_pl"))
    }
    appearances
      .join(w, Seq("item"), "left")
      .join(p, Seq("item"))
      .select(col("item"), col("n_lists"),
        coalesce(col("graft_w"), lit(0L)).as("n_wins"),
        col("graft_pl").cast(LongType).as("pl_scaled"))
  }

  /**
   * In-sample fit audit of [[bradleyTerry]]: replay every game against
   * the fitted strengths and report how well the model explains its own
   * training log — the mean Brier term (1 − P̂(winner))² with
   * P̂(winner) = p_w/(p_w + p_l) (the BT/Elo win-probability curve),
   * and the upset mass (games the fitted model calls for the LOSER).
   * A leaderboard whose BT fit shows ~25% Brier and half the mass in
   * upsets is noise wearing a ranking; this is the goodness-of-fit
   * number to publish next to the strengths.
   *
   * Exactness: P̂ per game is an exact rational of the micro strengths;
   * each game's Brier term is ONE floored integral division
   * ⌊10⁶·p_l²/(p_w+p_l)²⌋ weighted by the game count (per-term flooring
   * is the definition; both engines sum identical integers), the mean
   * is one half-away division. Upsets double-count so strength TIES
   * stay integral: upset2 = 2·(mass with p_w < p_l) + (mass tied).
   *
   * Scale shape: the [[bradleyTerry]] passes plus one |observed
   * pairs|-row join of the directed win counts onto the (broadcast-
   * sized) strengths — no extra corpus pass.
   */
  def btFitAudit(comparisons: DataFrame, winnerCol: String,
                 loserCol: String, iters: Int = 3): DataFrame = {
    val bt = bradleyTerry(comparisons, winnerCol, loserCol, iters)
      .select(col("item"), col("bt_scaled"))
      .localCheckpoint(eager = false) // two strength attaches
    val wd = directedWins(cleanGames(comparisons, winnerCol, loserCol))
    // both strength attaches broadcast explicitly: bt is |items| rows by
    // the layer's contract, and the plan should show BroadcastHashJoin
    // without depending on AQE size estimation (r13 verdict item 5)
    val scored = wd
      .join(broadcast(bt.select(col("item").as("graft_w2"),
        col("bt_scaled").as("graft_pw"))),
        col("graft_w") === col("graft_w2"))
      .join(broadcast(bt.select(col("item").as("graft_l2"),
        col("bt_scaled").as("graft_pl"))),
        col("graft_l") === col("graft_l2"))
    val pw = col("graft_pw").cast(big)
    val pl = col("graft_pl").cast(big)
    val term = call_function("div",
      (pl * pl * lit(1000000L).cast(big)).cast(big),
      ((pw + pl) * (pw + pl)).cast(big))
    scored.agg(
        sum(col("graft_c")).as("n_games"),
        sum(when(col("graft_pw") < col("graft_pl"),
          lit(2L) * col("graft_c")).otherwise(0L)).as("graft_u2a"),
        sum(when(col("graft_pw") === col("graft_pl"), col("graft_c"))
          .otherwise(0L)).as("graft_u2b"),
        sum((term * col("graft_c").cast(big)).cast(big)).as("graft_bsum"))
      .select(col("n_games"),
        (col("graft_u2a") + col("graft_u2b")).as("upset2"),
        ExactRound.halfAwayDiv(
          ((col("graft_u2a") + col("graft_u2b")).cast(big) *
            lit(1000000L).cast(big)).cast(big),
          (lit(2L).cast(big) * col("n_games").cast(big)).cast(big))
          .as("upset_micro"),
        ExactRound.halfAwayDiv(col("graft_bsum").cast(big),
          col("n_games").cast(big)).as("brier_micro"))
  }

  /**
   * Judge position-bias audit (the MT-Bench check, Zheng et al. 2023
   * §3.1: pairwise LLM judges measurably favor the FIRST-presented
   * answer): per item, its win rate when presented first vs when
   * presented second, and the signed gap. `winnerFirstCol` is a boolean
   * column on the comparison log — "the winner of this game was the
   * first-presented side" (the log's presentation metadata). A clean
   * judge shows gaps near 0; systematic positive gaps across items mean
   * the comparisons need position-balanced re-judging before any
   * [[bradleyTerry]]/[[copelandScores]] leaderboard is trusted.
   *
   * Per item: games/wins split by the item's own position (its position
   * in a game it WON is `winnerFirstCol`; in a game it LOST, the
   * negation), exact half-away micro rates, and
   * bias_micro = rate_first − rate_second (NULL if either side has no
   * games — a one-sided item has no measurable bias). A NULL
   * winnerFirstCol drops the game (unknown presentation can't enter a
   * position split).
   *
   * Scale shape: ONE corpus pass folded to two directed views, one
   * item-keyed map-side-combinable agg.
   */
  def judgePositionBias(comparisons: DataFrame, winnerCol: String,
                        loserCol: String,
                        winnerFirstCol: Column): DataFrame = {
    val games = comparisons
      .select(col(winnerCol).cast(StringType).as("graft_w"),
        col(loserCol).cast(StringType).as("graft_l"),
        winnerFirstCol.cast(BooleanType).as("graft_wf"))
      .filter(col("graft_w").isNotNull && col("graft_l").isNotNull &&
        col("graft_w") =!= col("graft_l") && col("graft_wf").isNotNull)
    // item view: (item, was_first, won)
    val views = games.select(col("graft_w").as("item"),
        col("graft_wf").as("graft_first"), lit(1L).as("graft_win"))
      .union(games.select(col("graft_l").as("item"),
        (!col("graft_wf")).as("graft_first"), lit(0L).as("graft_win")))
    val agg = views.groupBy(col("item"))
      .agg(
        sum(when(col("graft_first"), 1L).otherwise(0L)).as("games_first"),
        sum(when(col("graft_first"), col("graft_win")).otherwise(0L))
          .as("wins_first"),
        sum(when(!col("graft_first"), 1L).otherwise(0L))
          .as("games_second"),
        sum(when(!col("graft_first"), col("graft_win")).otherwise(0L))
          .as("wins_second"))
    def rate(w: Column, g: Column): Column =
      when(g > 0, ExactRound.halfAwayDiv(
        w.cast(big) * lit(1000000L).cast(big), g.cast(big)))
    agg.select(col("item"), col("games_first"), col("wins_first"),
      col("games_second"), col("wins_second"),
      rate(col("wins_first"), col("games_first")).as("rate_first_micro"),
      rate(col("wins_second"), col("games_second"))
        .as("rate_second_micro"),
      (rate(col("wins_first"), col("games_first")) -
        rate(col("wins_second"), col("games_second"))).as("bias_micro"))
  }

  /**
   * Preference-transitivity audit: among all item triples where every
   * pair has a STRICT head-to-head majority, how many are cyclic
   * (A beats B beats C beats A — the rock-paper-scissors triads that
   * make any single ranking of the items a lie) versus transitive. A
   * high cyclic share means the comparison data does not support a
   * total order — report it BEFORE publishing a [[bradleyTerry]] /
   * [[copelandScores]] leaderboard, not after someone notices the
   * "best" model losing to the 5th.
   *
   * One summary row: item/edge/triangle counts, the cyclic and
   * transitive split, and the cyclic share in micros (NULL when no
   * triangle exists — never 0/0). Exact integers; the triangle join is
   * |majority edges|³-bounded on the ≤|items|² edge table
   * (metadata-scale by the layer's contract — items are models /
   * policies / sources, not documents).
   */
  def cyclicTriads(comparisons: DataFrame, winnerCol: String,
                   loserCol: String): DataFrame = {
    val m = winRateMatrix(comparisons, winnerCol, loserCol)
      .localCheckpoint(eager = false) // consumers: items agg + edges
    val items = m.select(col("item_a").as("item"))
      .union(m.select(col("item_b").as("item"))).distinct()
      .agg(count(lit(1)).as("n_items"))
    // strict-majority edges over unordered pairs (a < b), with the
    // orientation flag f = 1 iff the lexically-lower item wins
    val und = m.filter(col("wins_a") =!= col("wins_b"))
      .select(col("item_a").as("a"), col("item_b").as("b"),
        when(col("wins_a") > col("wins_b"), 1L).otherwise(0L).as("f"))
      .localCheckpoint(eager = false) // three-way self-join below
    // connected triples a < b < c; cyclic iff the orientations chain:
    // (a→b, b→c, c→a) = (1,1,0) or its mirror (0,0,1). The edge table is
    // ≤|items|² metadata by contract — broadcast the probe sides so the
    // triangle join is two BroadcastHashJoins regardless of AQE stats.
    val tri = und.as("x")
      .join(broadcast(und.as("y")), col("x.b") === col("y.a"))
      .join(broadcast(und.as("z")),
        col("z.a") === col("x.a") && col("z.b") === col("y.b"))
      .select(col("x.f").as("fab"), col("y.f").as("fbc"),
        col("z.f").as("fac"))
    val cyc = (col("fab") === 1L && col("fbc") === 1L && col("fac") === 0L) ||
      (col("fab") === 0L && col("fbc") === 0L && col("fac") === 1L)
    val triAgg = tri.agg(
      count(lit(1)).as("n_triangles"),
      // coalesce: an empty triangle set sums to NULL, and the counts
      // must stay a partition (0 triangles -> 0 cyclic, 0 transitive)
      coalesce(sum(when(cyc, 1L).otherwise(0L)), lit(0L)).as("n_cyclic"))
    val edges = und.agg(count(lit(1)).as("n_majority_pairs"))
    items.crossJoin(broadcast(edges)).crossJoin(broadcast(triAgg))
      .select(col("n_items"), col("n_majority_pairs"),
        col("n_triangles"), col("n_cyclic"),
        (col("n_triangles") - col("n_cyclic")).as("n_transitive"),
        when(col("n_triangles") > 0, ExactRound.halfAwayDiv(
          col("n_cyclic").cast(big) * lit(1000000L).cast(big),
          col("n_triangles").cast(big))).as("cyclic_share_micro"))
  }

  /**
   * Bootstrap confidence bands on [[bradleyTerry]] strengths — the
   * Chatbot-Arena leaderboard practice (Chiang et al. 2024 report BT
   * ratings WITH bootstrap CIs; a strength without a band invites
   * overreading): each of `reps` replicates resamples whole GAMES with
   * the hashed-Poisson weights of [[bootstrapWinRate]] (one weight per
   * (rep, game id) — both participants see the same coherent alternative
   * log), refits the full MM fixed point on the reweighted counts, and
   * the per-item band is the 5%-trimmed order statistics of the
   * replicate strengths. Items whose bands overlap are not separated by
   * this eval log — the caveat the point estimate cannot carry.
   *
   * Smoothing note: the +1-virtual-win prior applies to the FULL log's
   * observed pair set in every replicate (the prior is part of the
   * model, not the data — a replicate that zero-weights a pair's games
   * keeps the pair at its prior). Determinism: the weights are pinned
   * integer CDF thresholds over md5 (no RNG state), every MM division
   * is the same ⌊·⌋ over DECIMAL(38,0) as [[bradleyTerry]], and the
   * band endpoints are order statistics of exact integers — any engine
   * reproduces the identical bands.
   *
   * Scale shape: the corpus is touched twice (the point-estimate pass
   * and the ×reps weighted hash-agg — narrow, map-side-combinable per
   * (rep, winner, loser)); every MM iteration then runs over the
   * reps·|observed pairs| metadata table with broadcast strength
   * attaches. reps ≤ 64 by contract.
   */
  def bradleyTerryBootstrap(comparisons: DataFrame, idCol: String,
                            winnerCol: String, loserCol: String,
                            salt: String, reps: Int = 20,
                            iters: Int = 3): DataFrame = {
    require(reps >= 2 && reps <= 64, s"reps=$reps out of range (2..64)")
    require(iters >= 1 && iters <= 10, s"iters=$iters out of range")
    val games = comparisons
      .select(col(idCol).as("graft_id"),
        col(winnerCol).cast(StringType).as("graft_w"),
        col(loserCol).cast(StringType).as("graft_l"))
      .filter(col("graft_id").isNotNull && col("graft_w").isNotNull &&
        col("graft_l").isNotNull && col("graft_w") =!= col("graft_l"))
      .localCheckpoint(eager = false) // point pass + weighted pass
    val point = bradleyTerry(games, "graft_w", "graft_l", iters)
    // replicate-weighted directed counts: ONE corpus pass, ×reps narrow
    val thresholds = array(Sampling.poissonThresholds48.map(lit): _*)
    val rows = games
      .withColumn("graft_r", explode(expr(s"sequence(0, ${reps - 1})")))
    val h48 = conv(substring(md5(concat_ws("_", lit(salt), col("graft_r"),
      col("graft_id"))), 1, 12), 16, 10).cast(LongType)
    val wdR = rows
      .withColumn("graft_wt",
        size(filter(thresholds, t => h48 >= t)).cast(LongType))
      .groupBy(col("graft_r"), col("graft_w"), col("graft_l"))
      .agg(sum(col("graft_wt")).as("graft_c"))
    // full-log pair spine × reps (metadata fan-out), smoothed per rep
    val und = games.select(least(col("graft_w"), col("graft_l")).as("a"),
        greatest(col("graft_w"), col("graft_l")).as("b"))
      .distinct()
    val dirsR = und.select(col("a").as("i"), col("b").as("j"))
      .union(und.select(col("b").as("i"), col("a").as("j")))
      .withColumn("graft_r", explode(expr(s"sequence(0, ${reps - 1})")))
    val wsmR = dirsR
      .join(wdR, dirsR("graft_r") === wdR("graft_r") &&
        dirsR("i") === wdR("graft_w") && dirsR("j") === wdR("graft_l"),
        "left")
      .select(dirsR("graft_r").as("graft_r"), col("i"), col("j"),
        (coalesce(col("graft_c"), lit(0L)) + lit(1L)).as("graft_wij"))
    val pairR = wsmR.as("x")
      .join(wsmR.as("y"),
        col("x.graft_r") === col("y.graft_r") &&
          col("x.i") === col("y.j") && col("x.j") === col("y.i"))
      .select(col("x.graft_r").as("graft_r"), col("x.i").as("i"),
        col("x.j").as("j"), col("x.graft_wij").as("graft_wij"),
        (col("x.graft_wij") + col("y.graft_wij")).as("graft_nij"))
      .localCheckpoint(eager = false) // reused every MM round
    val totR = pairR.groupBy(col("graft_r"), col("i").as("item"))
      .agg(sum(col("graft_wij").cast(big)).as("graft_wt"))
      .localCheckpoint(eager = false)
    var p = totR.select(col("graft_r"), col("item"), lit(S).as("graft_bt"))
    for (_ <- 1 to iters) {
      val pi = broadcast(p.select(col("graft_r"), col("item").as("i"),
        col("graft_bt").as("graft_pi")))
      val pj = broadcast(p.select(col("graft_r"), col("item").as("j"),
        col("graft_bt").as("graft_pj")))
      val d = pairR.join(pi, Seq("graft_r", "i"))
        .join(pj, Seq("graft_r", "j"))
        .select(col("graft_r"), col("i").as("item"),
          call_function("div",
            (col("graft_nij").cast(big) * lit(S).cast(big) *
              lit(S).cast(big)).cast(big),
            (col("graft_pi") + col("graft_pj")).cast(big)).as("graft_t"))
        .groupBy(col("graft_r"), col("item"))
        .agg(sum(col("graft_t").cast(big)).as("graft_d"))
      p = totR.join(d, Seq("graft_r", "item"))
        .select(col("graft_r"), col("item"),
          greatest(lit(1L), call_function("div",
            (col("graft_wt") * lit(S).cast(big) * lit(S).cast(big))
              .cast(big),
            col("graft_d"))).as("graft_bt"))
        // r20: p is broadcast TWICE next round (pi and pj) and each
        // broadcast re-ran this round's whole MM update from the
        // checkpointed pairR/totR — lineage-cut the (reps·|items|)-row
        // strength table once per round so both broadcasts read blocks.
        .localCheckpoint(eager = false)
    }
    // 5%-trimmed band of the replicate strengths (exact order stats)
    val trim = p.select(col("item"), col("graft_bt").cast(LongType)
        .as("graft_bt"))
      .groupBy(col("item"))
      .agg(sort_array(collect_list(col("graft_bt"))).as("graft_bs"))
      .withColumn("graft_mn", size(col("graft_bs")))
      .withColumn("graft_tr", expr("graft_mn div 20").cast("int"))
      .select(col("item"), col("graft_mn").cast(LongType).as("n_reps"),
        element_at(col("graft_bs"), col("graft_tr") + 1)
          .as("bt_lo_scaled"),
        element_at(col("graft_bs"), col("graft_mn") - col("graft_tr"))
          .as("bt_hi_scaled"))
    point.join(trim, Seq("item"))
      .select(col("item"), col("n_wins"), col("n_games"),
        col("bt_scaled"), col("n_reps"), col("bt_lo_scaled"),
        col("bt_hi_scaled"))
  }

  /**
   * Per-judge self-consistency / verdict-flip audit — [[judgePositionBias]]'s
   * sibling for REPEATED judgments: when the same judge sees the same
   * unordered item pair more than once, how often do the verdicts agree
   * with themselves? A judge whose repeated pairs flip half the time is
   * a coin, and its games should be down-weighted (or re-collected)
   * before any [[bradleyTerry]] fit. The per-judge generalization of the
   * MT-Bench self-consistency re-run check (Zheng et al. 2023 §3).
   *
   * Per judge: pair/game counts, the REPEATED subset (pairs the judge
   * saw ≥ 2 times), flip pairs (both directions observed), and
   * consistency = Σ majority-direction games / Σ games over repeated
   * pairs, in half-away micros (NULL when the judge has no repeated
   * pair — consistency is unmeasurable, not perfect).
   *
   * Scale shape: ONE (judge, winner, loser) map-side-combinable
   * hash-agg over the comparison log; everything downstream is keyed by
   * (judge, pair) — ≤ |judges|·|items|² metadata rows.
   */
  def judgeConsistency(comparisons: DataFrame, judgeCol: String,
                       winnerCol: String, loserCol: String): DataFrame = {
    val games = comparisons
      .select(col(judgeCol).cast(StringType).as("graft_j"),
        col(winnerCol).cast(StringType).as("graft_w"),
        col(loserCol).cast(StringType).as("graft_l"))
      .filter(col("graft_j").isNotNull && col("graft_w").isNotNull &&
        col("graft_l").isNotNull && col("graft_w") =!= col("graft_l"))
    val pairs = games
      .groupBy(col("graft_j"),
        least(col("graft_w"), col("graft_l")).as("graft_a"),
        greatest(col("graft_w"), col("graft_l")).as("graft_b"))
      .agg(
        sum(when(col("graft_w") < col("graft_l"), 1L).otherwise(0L))
          .as("graft_wlo"),
        sum(when(col("graft_w") > col("graft_l"), 1L).otherwise(0L))
          .as("graft_whi"))
      .select(col("graft_j"),
        (col("graft_wlo") + col("graft_whi")).as("graft_n"),
        greatest(col("graft_wlo"), col("graft_whi")).as("graft_maj"),
        (col("graft_wlo") > 0 && col("graft_whi") > 0).as("graft_flip"))
    pairs.groupBy(col("graft_j").as("judge"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("graft_n")).as("n_games"),
        sum(when(col("graft_n") >= 2, 1L).otherwise(0L))
          .as("n_pairs_repeated"),
        sum(when(col("graft_n") >= 2, col("graft_n")).otherwise(0L))
          .as("n_games_repeated"),
        sum(when(col("graft_flip"), 1L).otherwise(0L)).as("n_flip_pairs"),
        sum(when(col("graft_n") >= 2, col("graft_maj")).otherwise(0L))
          .as("graft_majsum"))
      .select(col("judge"), col("n_pairs"), col("n_games"),
        col("n_pairs_repeated"), col("n_games_repeated"),
        col("n_flip_pairs"),
        when(col("n_games_repeated") > 0, ExactRound.halfAwayDiv(
          col("graft_majsum").cast(big) * lit(1000000L).cast(big),
          col("n_games_repeated").cast(big))).as("consistency_micro"))
  }

  /**
   * Verbosity-bias audit (Zheng et al. 2023 §3.2: pairwise LLM judges
   * measurably favor the LONGER answer): across the game log, how often
   * does the longer response win? `winnerLenCol`/`loserLenCol` are the
   * responses' length metadata on the comparison log (tokens, chars —
   * any consistent unit). Reports the longer-side win share among
   * length-decided games with the z = 2 Wilson interval ([[isqrt]] —
   * exact, hashable): a lower bound comfortably above 500000 micros
   * means the judge (or the population of judges) rewards length
   * itself, and win rates need length-controlled re-reading.
   *
   * One summary row, exact integers + half-away micros; games with NULL
   * lengths are dropped VISIBLY via n_games vs the caller's count.
   * Scale shape: one map-side-combinable global agg — one corpus pass.
   */
  def verbosityBias(comparisons: DataFrame, winnerLenCol: String,
                    loserLenCol: String): DataFrame = {
    val games = comparisons
      .select(col(winnerLenCol).cast(LongType).as("graft_wl"),
        col(loserLenCol).cast(LongType).as("graft_ll"))
      .filter(col("graft_wl").isNotNull && col("graft_ll").isNotNull)
    val agg = games.agg(
      count(lit(1)).as("n_games"),
      sum(when(col("graft_wl") > col("graft_ll"), 1L).otherwise(0L))
        .as("n_longer_won"),
      sum(when(col("graft_wl") < col("graft_ll"), 1L).otherwise(0L))
        .as("n_shorter_won"),
      sum(when(col("graft_wl") === col("graft_ll"), 1L).otherwise(0L))
        .as("n_equal_len"))
    val w = col("n_longer_won"); val n = col("graft_nd")
    val x = n.cast(big) * (w.cast(big) * (n - w).cast(big) + n.cast(big))
    val s = isqrt(x)
    val den = (n.cast(big) * (n + 4).cast(big)).cast(big)
    agg
      .withColumn("graft_nd", col("n_longer_won") + col("n_shorter_won"))
      .select(col("n_games"), col("n_longer_won"), col("n_shorter_won"),
        col("n_equal_len"),
        when(n > 0, ExactRound.halfAwayDiv(
          w.cast(big) * lit(1000000L).cast(big), n.cast(big)))
          .as("longer_win_micro"),
        when(n > 0, ExactRound.halfAwayDiv(
          ((w + 2).cast(big) * n.cast(big) -
            lit(2L).cast(big) * s.cast(big)).cast(big) *
            lit(1000000L).cast(big), den)).as("wilson_lb_micro"),
        when(n > 0, ExactRound.halfAwayDiv(
          ((w + 2).cast(big) * n.cast(big) +
            lit(2L).cast(big) * s.cast(big)).cast(big) *
            lit(1000000L).cast(big), den)).as("wilson_ub_micro"))
  }

  /**
   * Length-controlled win-rate audit (the AlpacaEval-2.0 lens, Dubois
   * et al. 2024, applied as stratification): [[verbosityBias]] asks
   * whether the longer side wins GLOBALLY — one rate that confounds
   * "judges reward length" with "this log's length gaps are huge". This
   * operator stratifies the decided games by the LENGTH GAP
   * |winner_len − loser_len| into fixed-width buckets and reports the
   * longer-side win share per bucket with its own z = 2 Wilson band
   * (the exact [[isqrt]] machinery of q329/q342): a length-biased judge
   * shows bands sitting above 50% that RISE with the gap; a clean judge
   * shows bands straddling 50% at every gap. Equal-length games carry
   * no longer-side signal and are excluded (bucket b covers gaps
   * [b·width+1, (b+1)·width]).
   *
   * Exactness: counts, one exact isqrt per BUCKET row, half-away
   * micros — no floating point. Buckets must stay under ~4·10¹⁰ games
   * for the isqrt ±1 window (the [[wilsonWinRates]] bound). Scale
   * shape: ONE map-side-combinable hash-agg over the comparison log;
   * the Wilson arithmetic runs on the |buckets|-row aggregate.
   */
  def lengthControlledWinRate(comparisons: DataFrame, winnerLenCol: String,
                              loserLenCol: String,
                              gapWidth: Long = 5L): DataFrame = {
    require(gapWidth >= 1, s"gapWidth=$gapWidth must be >= 1")
    val games = comparisons
      .select(col(winnerLenCol).cast(LongType).as("graft_wl"),
        col(loserLenCol).cast(LongType).as("graft_ll"))
      .filter(col("graft_wl").isNotNull && col("graft_ll").isNotNull &&
        col("graft_wl") =!= col("graft_ll"))
      .withColumn("gap_bucket", call_function("div",
        (abs(col("graft_wl") - col("graft_ll")) - 1).cast(big),
        lit(gapWidth).cast(big)).cast(LongType))
    val agg = games.groupBy(col("gap_bucket"))
      .agg(count(lit(1)).as("n_games"),
        sum(when(col("graft_wl") > col("graft_ll"), 1L).otherwise(0L))
          .as("n_longer_won"),
        sum(when(col("graft_wl") < col("graft_ll"), 1L).otherwise(0L))
          .as("n_shorter_won"))
    val wv = col("n_longer_won"); val n = col("n_games")
    val x = n.cast(big) * (wv.cast(big) * (n - wv).cast(big) + n.cast(big))
    val s = isqrt(x)
    val den = (n.cast(big) * (n + 4).cast(big)).cast(big)
    agg.select(col("gap_bucket"),
      (col("gap_bucket") * gapWidth + 1).as("gap_lo"),
      ((col("gap_bucket") + 1) * gapWidth).as("gap_hi"),
      col("n_games"), col("n_longer_won"), col("n_shorter_won"),
      ExactRound.halfAwayDiv(
        wv.cast(big) * lit(1000000L).cast(big), n.cast(big))
        .as("longer_win_micro"),
      ExactRound.halfAwayDiv(
        ((wv + 2).cast(big) * n.cast(big) -
          lit(2L).cast(big) * s.cast(big)).cast(big) *
          lit(1000000L).cast(big), den).as("wilson_lb_micro"),
      ExactRound.halfAwayDiv(
        ((wv + 2).cast(big) * n.cast(big) +
          lit(2L).cast(big) * s.cast(big)).cast(big) *
          lit(1000000L).cast(big), den).as("wilson_ub_micro"))
  }

  /**
   * Dawid–Skene judge-reliability EM (Dawid & Skene 1979, the canonical
   * crowd/judge confusion-matrix model): units each carry a latent true
   * class; every judge j gets a per-class confusion row π_j(c, l) =
   * P(j says l | truth c), and the EM alternates posterior class
   * weights T_u(c) with confusion/prior re-estimates. The LLM-eval use:
   * κ (q340) says WHETHER judges disagree; this says WHO is unreliable
   * and HOW (which classes they confuse) — the table that decides which
   * judge's labels get down-weighted before a leaderboard ships.
   *
   * Determinism contract (the [[bradleyTerry]] MM discipline): micro
   * fixed point end-to-end, every division half-away over DECIMAL(38,0)
   * products, a FIXED iteration count, add-one (1-micro-pseudo-count)
   * Laplace smoothing on π and priors with a floor of 1 micro — no
   * libm, bit-identical on any engine. T₀ is the majority-vote
   * fraction n_uc/r. One EM cycle = M-step (π, priors from T) then
   * E-step (T ∝ prior · Π_k π); the returned table is the M-step of
   * the final T, so `iters = 0` is exactly the majority-vote-weighted
   * confusion matrix.
   *
   * Completeness contract: every unit has EXACTLY r ratings (the Fleiss
   * fixed-r precondition, q340's `complete` flag) — units with any
   * other count are dropped before the fit; r ≤ 4 keeps the E-step
   * product (prior · π^r ≤ 10^(6(r+1)), i.e. ≤ 10^30) inside
   * DECIMAL(38,0) WITH the ×10⁶ half-away division headroom (the
   * divide computes 2·num·10⁶ + den ≈ 10^37) — r = 5 would push that
   * to ~10^43 and Spark's non-ANSI decimal overflow silently NULLs
   * the dominant class, so it is rejected, not documented away. The
   * label vocabulary is collected once
   * (metadata-scale by the layer's contract — classes are rating
   * categories, not corpus rows; the TextAnalysis vocab precedent).
   *
   * Scale shape: per cycle, ONE corpus-scale ratings×T equi-join for
   * the M-step sums and one explode-by-classes projection + r broadcast
   * π attaches + a unit-partitioned window for the E-step — unit
   * cardinality is corpus-high, so the window partitions are C rows
   * each. π/priors are judges·C² metadata, broadcast EXPLICITLY.
   *
   * Output: (judge, true_class, label, pi_micro, n_ratings,
   * n_units_excluded) — π rows for EVERY (judge, class, label)
   * combination (smoothing fills the unobserved cells; Σ_l pi_micro ≈
   * 10⁶ up to rounding), n_ratings the raw observed (judge, label)
   * count, unsmoothed. n_units_excluded (constant across rows) is the
   * LOUD count of units the completeness filter dropped — the q339
   * exclusion-is-never-silent convention: a log where 30% of units
   * carry r−1 ratings now announces that its confusion matrices cover
   * 70% of the data. For keeping those units instead, see
   * [[dawidSkeneConfusionRagged]].
   */
  def dawidSkeneConfusion(ratings: DataFrame, unitCol: String,
                          judgeCol: String, labelCol: String, r: Int,
                          iters: Int = 2): DataFrame =
    dsConfusion(ratings, unitCol, judgeCol, labelCol, r, r, iters)

  /**
   * Ragged-rating-count Dawid–Skene confusion matrices: real judge logs
   * are RAGGED — units carry anywhere from 2 to rMax ratings — and the
   * fixed-r [[dawidSkeneConfusion]] silently-no-longer-silently drops
   * every incomplete unit (30% of a real log, easily). This variant
   * keeps every unit with 2..rMax ratings: T₀ divides by the unit's own
   * r_u, and the E-step's missing tail slots contribute a neutral ×1
   * factor (per-unit renormalization absorbs the scale difference).
   *
   * CONTRACT — what still gets dropped, and the opt-out: by default
   * units with MORE than `rMax` ratings are EXCLUDED (loudly, in
   * n_units_excluded), not truncated — on a log where most units carry
   * rMax+1 or more ratings that is most of the data. Pass
   * `truncate = true` to instead keep every such unit on its first
   * `rMax` ratings in deterministic (judge, label) order (exactly the
   * q352 fixture's row_number ≤ r rule), so only single-rating units
   * are ever excluded (one rating carries no agreement signal and
   * would only echo its judge's smoothed prior). rMax ≤ 4 is the same
   * DECIMAL(38,0) product bound as the fixed path's r ≤ 4.
   */
  def dawidSkeneConfusionRagged(ratings: DataFrame, unitCol: String,
                                judgeCol: String, labelCol: String,
                                rMax: Int = 4, iters: Int = 2,
                                truncate: Boolean = false): DataFrame =
    dsConfusion(ratings, unitCol, judgeCol, labelCol, 2, rMax, iters,
      truncate)

  private def dsConfusion(ratings: DataFrame, unitCol: String,
                          judgeCol: String, labelCol: String,
                          minR: Int, rMax: Int, iters: Int,
                          truncate: Boolean = false): DataFrame = {
    require(iters >= 0 && iters <= 5, s"iters=$iters out of range (0..5)")
    val (rt, classes, excluded) =
      dsPrepare(ratings, unitCol, judgeCol, labelCol, minR, rMax, truncate)
    val nC = classes.size
    val classArr = array(classes.map(lit): _*)
    val combos = dsCombos(rt, classArr)
    val t = dsFit(rt, classArr, combos, nC, rMax, iters)
    val (piOut, _) = dsMStep(rt, combos, nC, t)
    val nr = rt.groupBy(col("graft_j"), col("graft_l").as("graft_lbl"))
      .agg(count(lit(1)).as("graft_nr"))
    piOut.join(nr, Seq("graft_j", "graft_lbl"), "left")
      .crossJoin(broadcast(excluded))
      .select(col("graft_j").as("judge"), col("graft_tc").as("true_class"),
        col("graft_lbl").as("label"),
        col("graft_p").cast(LongType).as("pi_micro"),
        coalesce(col("graft_nr"), lit(0L)).as("n_ratings"),
        col("n_units_excluded"))
  }

  /**
   * The OTHER half of [[dawidSkeneConfusion]]'s EM: the per-unit class
   * posteriors T_u(c) after `iters` cycles — i.e. the RELABELED corpus.
   * The confusion table says who to distrust; this table IS the
   * consensus label set a pipeline trains on: `is_map` marks each
   * unit's maximum-a-posteriori class (largest t, smallest class at
   * ties — deterministic), and units where the MAP class disagrees
   * with the raw majority vote are exactly the rows Dawid–Skene
   * re-decided by down-weighting unreliable judges.
   *
   * Same determinism/completeness contract as the confusion side
   * (micro fixed point, fixed iterations, exactly-r units, loud
   * n_units_excluded); `iters` ≥ 1 so the output is the DENSE posterior
   * over every class (iters = 0 would be the sparse majority vote,
   * which needs no EM). Output: (unit, true_class, t_micro, is_map,
   * n_units_excluded), one row per kept unit per class; Σ_c t_micro ≈
   * 10⁶ per unit up to rounding.
   *
   * Scale shape: the EM cycles as in [[dawidSkeneConfusion]]; the MAP
   * flag is one unit-partitioned C-row window on the final posteriors.
   */
  def dawidSkenePosteriors(ratings: DataFrame, unitCol: String,
                           judgeCol: String, labelCol: String, r: Int,
                           iters: Int = 2): DataFrame =
    dsPosteriors(ratings, unitCol, judgeCol, labelCol, r, r, iters,
      withRu = false)

  /**
   * Ragged-rating-count twin of [[dawidSkenePosteriors]] (see
   * [[dawidSkeneConfusionRagged]] for the keep/exclude contract):
   * every unit with 2..rMax ratings gets its dense posterior + MAP
   * flag, plus its own n_ratings (r_u — the per-unit evidence count a
   * downstream consumer should weight by) and the loud exclusion count.
   * `truncate = true` keeps >rMax-rating units on their first rMax
   * ratings instead of excluding them — the same opt-out as
   * [[dawidSkeneConfusionRagged]]'s contract paragraph.
   */
  def dawidSkenePosteriorsRagged(ratings: DataFrame, unitCol: String,
                                 judgeCol: String, labelCol: String,
                                 rMax: Int = 4, iters: Int = 2,
                                 truncate: Boolean = false): DataFrame =
    dsPosteriors(ratings, unitCol, judgeCol, labelCol, 2, rMax, iters,
      withRu = true, truncate = truncate)

  private def dsPosteriors(ratings: DataFrame, unitCol: String,
                           judgeCol: String, labelCol: String,
                           minR: Int, rMax: Int, iters: Int,
                           withRu: Boolean,
                           truncate: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 5, s"iters=$iters out of range (1..5)")
    val w = org.apache.spark.sql.expressions.Window
    val (rt, classes, excluded) =
      dsPrepare(ratings, unitCol, judgeCol, labelCol, minR, rMax, truncate)
    val nC = classes.size
    val classArr = array(classes.map(lit): _*)
    val combos = dsCombos(rt, classArr)
    val t = dsFit(rt, classArr, combos, nC, rMax, iters)
    val flagged = t.withColumn("graft_rnk", row_number().over(
        w.partitionBy(col("graft_u"))
          .orderBy(col("graft_t").desc, col("graft_c").asc)))
      .crossJoin(broadcast(excluded))
    val out = flagged
      .select(col("graft_u").as("unit"), col("graft_c").as("true_class"),
        col("graft_t").cast(LongType).as("t_micro"),
        (col("graft_rnk") === 1).as("is_map"),
        col("n_units_excluded"))
    if (!withRu) out
    else {
      val ru = rt.groupBy(col("graft_u").as("unit"))
        .agg(max(col("graft_cnt")).as("n_ratings"))
      out.join(ru, Seq("unit"))
        .select(col("unit"), col("true_class"), col("t_micro"),
          col("is_map"), col("n_ratings"), col("n_units_excluded"))
    }
  }

  /** Shared Dawid–Skene scaffold: cleaned STRING ratings restricted to
    * units with minR..maxR ratings (fixed-r callers pass minR = maxR),
    * with the per-unit slot index AND per-unit rating count (graft_cnt,
    * constant within a unit — the ragged path's r_u), plus the collected
    * label vocabulary (metadata-scale by the layer's contract), plus the
    * LOUD exclusion ledger: a 1-row frame counting the units the
    * completeness filter dropped — exclusion is never silent (the q339
    * convention; the r16 verdict's item 2). */
  private def dsPrepare(ratings: DataFrame, unitCol: String,
                        judgeCol: String, labelCol: String,
                        minR: Int, maxR: Int,
                        truncate: Boolean = false)
      : (DataFrame, Seq[String], DataFrame) = {
    require(minR >= 2 && maxR <= 4 && minR <= maxR,
      s"rating-count range ($minR..$maxR) out of bounds (2..4): " +
        "r = 5 overflows the DECIMAL(38,0) E-step product " +
        "(prior*pi^5*10^6 ~ 10^42) and Spark's non-ANSI decimal " +
        "overflow would NULL it silently")
    val w = org.apache.spark.sql.expressions.Window
    val base = ratings.select(col(unitCol).cast(StringType).as("graft_u"),
        col(judgeCol).cast(StringType).as("graft_j"),
        col(labelCol).cast(StringType).as("graft_l"))
      .filter(col("graft_u").isNotNull && col("graft_j").isNotNull &&
        col("graft_l").isNotNull)
    // checkpointed so the corpus-scale per-unit window count runs ONCE
    // for BOTH branches (kept rt + the exclusion ledger) — rt's own
    // checkpoint below covers the EM cycles but not `excluded`
    val counted = base.withColumn("graft_cnt", count(lit(1)).over(
        w.partitionBy(col("graft_u"))))
      .localCheckpoint(eager = false)
    // completeness: minR..maxR ratings per unit or the unit is out
    // (with truncate, over-maxR units are KEPT on their first maxR
    // ratings in (judge, label) order) — drops are COUNTED, not silent
    val keep =
      if (truncate) col("graft_cnt") >= minR
      else col("graft_cnt") >= minR && col("graft_cnt") <= maxR
    val rt = counted
      .filter(keep)
      .withColumn("graft_rn", row_number().over(
        w.partitionBy(col("graft_u"))
          .orderBy(col("graft_j"), col("graft_l"))))
      .filter(if (truncate) col("graft_rn") <= maxR else lit(true))
      .select(col("graft_u"), col("graft_j"), col("graft_l"),
        col("graft_rn"),
        (if (truncate) least(col("graft_cnt"), lit(maxR.toLong))
         else col("graft_cnt")).as("graft_cnt"))
      .localCheckpoint(eager = false) // read every cycle + pivot + output
    val excluded = counted
      .filter(if (truncate) col("graft_cnt") < minR
        else col("graft_cnt") < minR || col("graft_cnt") > maxR)
      .agg(count_distinct(col("graft_u")).as("n_units_excluded"))
    val classes: Seq[String] = rt.select(col("graft_l")).distinct()
      .orderBy(col("graft_l")).collect().map(_.getString(0)).toSeq
    (rt, classes, excluded)
  }

  /** All (judge, class, label) confusion cells — explodes, not joins,
    * so the plan stays cartesian-free. */
  private def dsCombos(rt: DataFrame, classArr: Column): DataFrame =
    rt.select(col("graft_j")).distinct()
      .withColumn("graft_tc", explode(classArr))
      .withColumn("graft_lbl", explode(classArr))

  /** One M-step: (π, priors) from the current posteriors — add-one
    * smoothing in micros, half-away division, 1-micro floor. */
  private def dsMStep(rt: DataFrame, combos: DataFrame, nC: Int,
                      tCur: DataFrame): (DataFrame, DataFrame) = {
    val joined = rt.join(tCur, Seq("graft_u"))
    val num = joined.groupBy(col("graft_j"), col("graft_c"),
        col("graft_l").as("graft_lbl"))
      .agg(sum(col("graft_t").cast(big)).as("graft_s"))
    val den = num.groupBy(col("graft_j"), col("graft_c"))
      .agg(sum(col("graft_s")).as("graft_d"))
    val pi = combos
      .join(num.withColumnRenamed("graft_c", "graft_tc"),
        Seq("graft_j", "graft_tc", "graft_lbl"), "left")
      .join(den.withColumnRenamed("graft_c", "graft_tc"),
        Seq("graft_j", "graft_tc"), "left")
      .select(col("graft_j"), col("graft_tc"), col("graft_lbl"),
        greatest(lit(1L), ExactRound.halfAwayDiv(
          ((coalesce(col("graft_s"), lit(0L).cast(big)) +
            lit(S).cast(big)) * lit(S).cast(big)).cast(big),
          (coalesce(col("graft_d"), lit(0L).cast(big)) +
            lit(S * nC).cast(big)).cast(big))).as("graft_p"))
    val byClass = tCur.groupBy(col("graft_c"))
      .agg(sum(col("graft_t").cast(big)).as("graft_s"))
    val tot = byClass.agg(sum(col("graft_s")).as("graft_tot"))
    val prior = byClass.crossJoin(broadcast(tot))
      .select(col("graft_c"),
        greatest(lit(1L), ExactRound.halfAwayDiv(
          ((col("graft_s") + lit(S).cast(big)) * lit(S).cast(big))
            .cast(big),
          (col("graft_tot") + lit(S * nC).cast(big)).cast(big)))
          .as("graft_pr"))
    (pi, prior)
  }

  /** T after `iters` (M, E) cycles from the majority-vote start. `rMax`
    * bounds the per-unit slot count; units with fewer ratings (the
    * ragged path) pivot to NULL tail slots, whose π attach LEFT-misses
    * and contributes a neutral ×1 factor — per-unit renormalization
    * makes the per-unit scale difference irrelevant. For fixed-r input
    * every slot matches, so the LEFT joins are value-identical to the
    * pre-r17 inner joins. */
  private def dsFit(rt: DataFrame, classArr: Column, combos: DataFrame,
                    nC: Int, rMax: Int, iters: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    // T0: majority-vote fraction n_uc / r_u in micros (sparse — absent
    // classes = 0); r_u = graft_cnt, constant within the unit
    var t = rt.groupBy(col("graft_u"), col("graft_l").as("graft_c"))
      .agg(count(lit(1)).as("graft_n"),
        max(col("graft_cnt")).as("graft_ru"))
      .select(col("graft_u"), col("graft_c"),
        ExactRound.halfAwayDiv(col("graft_n").cast(big) * lit(S).cast(big),
          col("graft_ru").cast(big)).as("graft_t"))
    for (_ <- 1 to iters) {
      val (pi0, prior) = dsMStep(rt, combos, nC, t)
      // r20: π is broadcast rMax times below (one join per rating slot)
      // and each broadcast's child plan re-ran the WHOLE M-step subtree
      // (the corpus-scale rt⋈T join + two aggregations) — the per-slot
      // column renames defeat ReusedExchange's canonical match. π is
      // metadata-scale (|judges|·C² rows); cutting its lineage once per
      // cycle makes the rMax broadcasts read materialized blocks instead
      // of re-running the M-step rMax times. (The prior is consumed
      // once — no cut needed.)
      val pi = pi0.localCheckpoint(eager = false)
      // E-step: pivot the unit's ≤ rMax (judge, label) slots, score
      // every candidate class with prior · Π_k π_k, renormalize per unit
      val pivotCols = (1 to rMax).flatMap { k =>
        Seq(max(when(col("graft_rn") === k, col("graft_j")))
            .as(s"graft_j$k"),
          max(when(col("graft_rn") === k, col("graft_l")))
            .as(s"graft_l$k"))
      }
      var scored = rt.groupBy(col("graft_u"))
        .agg(pivotCols.head, pivotCols.tail: _*)
        .withColumn("graft_c", explode(classArr))
        .join(broadcast(prior), Seq("graft_c"))
        .withColumn("graft_num", col("graft_pr").cast(big))
      for (k <- 1 to rMax) {
        scored = scored.join(broadcast(pi.select(
            col("graft_j").as(s"graft_j$k"), col("graft_tc").as("graft_c"),
            col("graft_lbl").as(s"graft_l$k"),
            col("graft_p").as(s"graft_p$k"))),
          Seq(s"graft_j$k", "graft_c", s"graft_l$k"), "left")
          .withColumn("graft_num",
            (col("graft_num") *
              coalesce(col(s"graft_p$k"), lit(1L)).cast(big)).cast(big))
      }
      t = scored
        .withColumn("graft_den", sum(col("graft_num")).over(
          w.partitionBy(col("graft_u"))))
        .select(col("graft_u"), col("graft_c"),
          ExactRound.halfAwayDiv(
            (col("graft_num") * lit(S).cast(big)).cast(big),
            col("graft_den")).as("graft_t"))
        .localCheckpoint(eager = false)
    }
    t
  }

  /** Min-label connected components over a metadata-scale STRING item
    * graph: labels start as the item itself and each round takes the
    * min over the closed neighborhood, converging in diameter rounds
    * (checked exactly — a round that changes nothing ends the loop; the
    * per-round convergence probe is an action on |items|-row frames,
    * cheap because `edges` must be localCheckpointed by the caller).
    * For int64 node ids at corpus scale use [[Graph.connectedComponents]]
    * (HashMin / two-phase); this one exists because eval items are
    * strings and ≤ metadata-scale by the layer's contract. */
  private def minLabelComponents(edges: DataFrame, maxRounds: Int)
      : DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(eager = false)
    var labels = sym.select(col("a").as("item")).distinct()
      .withColumn("graft_comp", col("item"))
      .localCheckpoint(eager = false)
    var round = 0
    var changed = 1L
    while (round < maxRounds && changed > 0) {
      val nbrMin = sym
        .join(broadcast(labels.select(col("item").as("b"),
          col("graft_comp").as("graft_nc"))), Seq("b"))
        .groupBy(col("a").as("item"))
        .agg(min(col("graft_nc")).as("graft_nmin"))
      val next = labels.join(nbrMin, Seq("item"), "left")
        .select(col("item"),
          least(col("graft_comp"),
            coalesce(col("graft_nmin"), col("graft_comp")))
            .as("graft_comp"))
        .localCheckpoint(eager = false)
      changed = next.as("n")
        .join(labels.as("o"), col("n.item") === col("o.item"))
        .filter(col("n.graft_comp") =!= col("o.graft_comp"))
        .count()
      labels = next
      round += 1
    }
    // Fail-loud convergence: exiting at maxRounds with changed > 0 means
    // some labels are still propagating — returning them would OVER-count
    // components and silently flip the identifiability verdict downstream
    // (a diameter-50 chain under the default maxRounds=50 reads as 2+
    // components). min-label needs diameter + 1 rounds (the last one
    // confirms the fixed point), so the message names the knob.
    if (changed > 0) throw new IllegalStateException(
      s"minLabelComponents did not converge in $maxRounds rounds " +
        s"($changed labels still changing): the comparison graph's " +
        "diameter is too large for maxRounds — raise maxRounds (needs " +
        ">= graph diameter + 1) or the component counts would be wrong")
    labels
  }

  /**
   * Comparison-graph identifiability audit — the check that must pass
   * BEFORE any [[bradleyTerry]] / [[rankCentrality]] leaderboard is
   * read: BT strengths are only jointly identifiable within a CONNECTED
   * component of the comparison graph (Ford 1957's condition — across
   * components the relative scale is pure prior), and an item that
   * never lost (or never won) sits on the MLE boundary (the smoothing
   * keeps it finite but the data alone says "∞"). One summary row:
   * item/pair counts, pair coverage vs C(n,2), component count and the
   * largest component's size, and the undefeated/winless boundary
   * counts. n_components > 1 ⇒ the leaderboard is n separate
   * leaderboards wearing one table.
   *
   * Exact integers; components via min-label propagation over the
   * OBSERVED unordered pair graph (items are models/policies —
   * metadata-scale by the layer's contract; the corpus is touched once
   * in the directed-wins agg).
   */
  def comparisonGraphAudit(comparisons: DataFrame, winnerCol: String,
                           loserCol: String,
                           maxRounds: Int = 50): DataFrame = {
    val wd = directedWins(cleanGames(comparisons, winnerCol, loserCol))
      .localCheckpoint(eager = false) // edges + boundary counts
    val und = wd.select(least(col("graft_w"), col("graft_l")).as("a"),
        greatest(col("graft_w"), col("graft_l")).as("b"))
      .distinct()
      .localCheckpoint(eager = false)
    val comps = minLabelComponents(und, maxRounds)
      .localCheckpoint(eager = false) // component agg reads it twice
    val compAgg = comps.groupBy(col("graft_comp"))
      .agg(count(lit(1)).as("graft_cs"))
      .agg(count(lit(1)).as("n_components"),
        max(col("graft_cs")).as("largest_component"))
    val items = comps.agg(count(lit(1)).as("n_items"))
    val pairCnt = und.agg(count(lit(1)).as("n_observed_pairs"))
    // boundary items: winless = never a winner; undefeated = never a
    // loser (each is one anti-join of the item list vs a win/loss side)
    val winners = wd.select(col("graft_w").as("item")).distinct()
    val losers = wd.select(col("graft_l").as("item")).distinct()
    val boundary = comps.select(col("item"))
      .join(winners.withColumn("graft_won", lit(1L)), Seq("item"), "left")
      .join(losers.withColumn("graft_lost", lit(1L)), Seq("item"), "left")
      .agg(sum(when(col("graft_won").isNull, 1L).otherwise(0L))
          .as("n_winless"),
        sum(when(col("graft_lost").isNull, 1L).otherwise(0L))
          .as("n_undefeated"))
    val n = col("n_items")
    items.crossJoin(broadcast(pairCnt))
      .crossJoin(broadcast(compAgg))
      .crossJoin(broadcast(boundary))
      .select(col("n_items"), col("n_observed_pairs"),
        when(n > 1, ExactRound.halfAwayDiv(
          (col("n_observed_pairs").cast(big) * lit(2000000L).cast(big))
            .cast(big),
          (n.cast(big) * (n - 1).cast(big)).cast(big)))
          .as("pair_coverage_micro"),
        col("n_components"), col("largest_component"),
        col("n_undefeated"), col("n_winless"))
  }

  /**
   * Schulze beatpath ranking (Schulze 2011; the most widely deployed
   * Condorcet completion — Debian/Wikimedia elections): item i beats j
   * if the STRONGEST PATH from i to j (path strength = its weakest
   * edge; edges = head-to-head winning-vote counts where i out-won j)
   * is stronger than the strongest path back. Unlike [[copelandScores]]
   * it resolves cyclic triads by how DECISIVELY each leg was won, and
   * it is cloneproof — the property leaderboards with many near-equal
   * model variants actually need.
   *
   * Widest paths by repeated max–min squaring: `iters` rounds cover
   * path lengths ≤ 2^iters edges, so iters ≥ ⌈log₂(n−1)⌉ is exact
   * convergence (fixed iteration count, bit-identical on any engine —
   * extra rounds are no-ops past the fixed point, so the count only
   * needs to be ≥ the bound, not equal on both sides). Default 3 covers
   * 8-hop paths / 9 items; raise for bigger ladders.
   *
   * Output per item: path win/tie/loss counts vs the other n−1 items
   * (unreachable ⇒ strength 0) and schulze2 = 2·wins + ties (the
   * [[copelandScores]] integral-tie convention). Exact int64 counts.
   *
   * Scale shape: one corpus hash-agg; the path closure runs on
   * ≤ |items|² metadata rows with broadcast self-joins.
   */
  def schulzeRanking(comparisons: DataFrame, winnerCol: String,
                     loserCol: String, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters=$iters out of range (1..8)")
    val wd = directedWins(cleanGames(comparisons, winnerCol, loserCol))
      .localCheckpoint(eager = false)
    // winning-votes edge: i→j carries c_ij iff i out-won j head-to-head
    val cBoth = wd.as("x")
      .join(wd.as("y"),
        col("x.graft_w") === col("y.graft_l") &&
          col("x.graft_l") === col("y.graft_w"), "left")
      .select(col("x.graft_w").as("i"), col("x.graft_l").as("j"),
        col("x.graft_c").as("graft_cij"),
        coalesce(col("y.graft_c"), lit(0L)).as("graft_cji"))
    var p = cBoth.filter(col("graft_cij") > col("graft_cji"))
      .select(col("i"), col("j"), col("graft_cij").as("graft_s"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      val twoStep = p.as("x")
        .join(broadcast(p.as("y")),
          col("x.j") === col("y.i") && col("x.i") =!= col("y.j"))
        .select(col("x.i").as("i"), col("y.j").as("j"),
          least(col("x.graft_s"), col("y.graft_s")).as("graft_s"))
      p = p.union(twoStep)
        .groupBy(col("i"), col("j"))
        .agg(max(col("graft_s")).as("graft_s"))
        .localCheckpoint(eager = false)
    }
    val items = cBoth.select(col("i").as("item"))
      .union(cBoth.select(col("j").as("item"))).distinct()
      .localCheckpoint(eager = false)
    val nItems = items.agg(count(lit(1)).as("graft_n"))
    // P(i,j) vs P(j,i): full outer join of the closure with its
    // transpose — pairs unreachable BOTH ways are ties by absence and
    // recovered arithmetically from n−1
    val versus = p.select(col("i"), col("j"), col("graft_s"))
      .join(p.select(col("j").as("i"), col("i").as("j"),
        col("graft_s").as("graft_st")), Seq("i", "j"), "full")
      .select(col("i"),
        coalesce(col("graft_s"), lit(0L)).as("graft_s"),
        coalesce(col("graft_st"), lit(0L)).as("graft_st"))
    val scored = versus.groupBy(col("i").as("item"))
      .agg(sum(when(col("graft_s") > col("graft_st"), 1L).otherwise(0L))
          .as("path_wins"),
        sum(when(col("graft_s") < col("graft_st"), 1L).otherwise(0L))
          .as("path_losses"),
        sum(when(col("graft_s") === col("graft_st"), 1L).otherwise(0L))
          .as("graft_reach_ties"))
    items.join(scored, Seq("item"), "left")
      .crossJoin(broadcast(nItems))
      .select(col("item"), (col("graft_n") - 1).as("n_rivals"),
        coalesce(col("path_wins"), lit(0L)).as("path_wins"),
        coalesce(col("path_losses"), lit(0L)).as("path_losses"),
        (col("graft_n") - 1 - coalesce(col("path_wins"), lit(0L)) -
          coalesce(col("path_losses"), lit(0L))).as("path_ties"),
        (lit(2L) * coalesce(col("path_wins"), lit(0L)) +
          (col("graft_n") - 1 - coalesce(col("path_wins"), lit(0L)) -
            coalesce(col("path_losses"), lit(0L)))).as("schulze2"))
  }

  /**
   * Borda count over ranked lists (Borda 1781) — the positional voting
   * baseline for the [[plackettLuce]] fixture: an item at position p in
   * an m-item list scores m − p points (first = m−1, last = 0). The
   * model-free sanity companion to PL strengths: when Borda order and
   * PL order disagree, the lists are position-biased or the MM hasn't
   * converged — either way, look before publishing.
   *
   * Input contract = [[plackettLuce]]'s (one row per (list, item,
   * 1-based position); items distinct within a list; lists of length
   * < 2 are ignored — no choice, no points). Output per item: list
   * count, exact integer borda_score, and the mean NORMALIZED score in
   * micros (per-list term = ⌊(m−p)·10⁶/(m−1)⌋ — per-term flooring is
   * part of the definition, the [[bradleyTerry]] discipline).
   *
   * Scale shape: one list-partitioned count window (list id is the
   * high-cardinality corpus key) + one item-keyed map-side-combinable
   * agg — corpus touched once.
   */
  def bordaCount(rankings: DataFrame, listCol: String, itemCol: String,
                 posCol: String): DataFrame = {
    val rows = rankings
      .select(col(listCol).as("graft_rid"),
        col(itemCol).cast(StringType).as("graft_item"),
        col(posCol).cast(LongType).as("graft_pos"))
      .filter(col("graft_rid").isNotNull && col("graft_item").isNotNull &&
        col("graft_pos").isNotNull)
    val wList = org.apache.spark.sql.expressions.Window
      .partitionBy(col("graft_rid"))
    val withM = rows.withColumn("graft_m", count(lit(1)).over(wList))
      .filter(col("graft_m") >= 2)
    withM
      .withColumn("graft_pts", col("graft_m") - col("graft_pos"))
      .withColumn("graft_norm", call_function("div",
        (col("graft_pts").cast(big) * lit(1000000L).cast(big)).cast(big),
        (col("graft_m") - 1).cast(big)))
      .groupBy(col("graft_item").as("item"))
      .agg(count(lit(1)).as("n_lists"),
        sum(col("graft_pts")).as("borda_score"),
        sum(col("graft_norm").cast(big)).as("graft_nsum"))
      .select(col("item"), col("n_lists"), col("borda_score"),
        ExactRound.halfAwayDiv(col("graft_nsum").cast(big),
          col("n_lists").cast(big)).as("borda_mean_micro"))
  }
}
