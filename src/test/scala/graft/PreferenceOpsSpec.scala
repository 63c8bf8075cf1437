package graft

import org.apache.spark.sql.functions._
import graft.operators.{Preference, Standardize}

/** Hand-computed expectations for the round-13 preference/eval layer
  * (Bradley–Terry, win-rate matrix, Copeland, Rank Centrality, Kendall
  * τ_a, cyclic triads). */
class PreferenceOpsSpec extends SparkSpec {
  import spark.implicits._

  private def games(rows: (String, String)*) =
    rows.toSeq.toDF("winner", "loser")

  // ── bradleyTerry ────────────────────────────────────────────────────────

  test("bradleyTerry: two-item log reaches the exact MM fixed point") {
    // A beats B 3×: smoothed w_AB = 4, w_BA = 1, n = 5.
    // iter 1: d = (5·10¹²) div (2·10⁶) = 2,500,000 for both items;
    //   p_A = (4·10¹²) div 2.5e6 = 1,600,000; p_B = 400,000.
    // iter 2: p_A + p_B = 2·10⁶ again → same d → FIXED POINT.
    val g = games(("A", "B"), ("A", "B"), ("A", "B"))
    val got = Preference.bradleyTerry(g, "winner", "loser", iters = 3)
      .orderBy("item")
      .select("item", "n_wins", "n_games", "bt_scaled")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", 3L, 3L, 1600000L), ("B", 0L, 3L, 400000L)))
  }

  test("bradleyTerry: never-winning item keeps a positive floor strength") {
    // C loses every one of many games — the +1 virtual win and the
    // 1-micro floor must keep it strictly positive
    val g = games(Seq.fill(50)(("A", "C")) ++ Seq.fill(50)(("B", "C")): _*)
    val bt = Preference.bradleyTerry(g, "winner", "loser")
      .select("item", "bt_scaled").as[(String, Long)].collect().toMap
    assert(bt("C") >= 1L)
    assert(bt("A") > bt("C") && bt("B") > bt("C"))
  }

  test("bradleyTerry: strength order follows dominance, not raw win rate") {
    // B has a perfect 1/1 record against weak C; A is 3/4 against B.
    // Raw win rate says B (1.0) > A (0.75); BT must rank A above B
    // because A's wins come against the stronger opponent.
    val g = games(Seq.fill(3)(("A", "B")) ++ Seq(("B", "A")) ++
      Seq(("B", "C")) ++ Seq.fill(8)(("C", "D")): _*)
    val bt = Preference.bradleyTerry(g, "winner", "loser")
      .select("item", "bt_scaled").as[(String, Long)].collect().toMap
    assert(bt("A") > bt("B"), s"expected A > B in $bt")
  }

  test("bradleyTerry: self-play and NULL rows are dropped") {
    val g = Seq(("A", "A"), ("A", "B"), (null, "B"), ("B", null))
      .toDF("winner", "loser")
    val got = Preference.bradleyTerry(g, "winner", "loser")
      .select("item", "n_games").as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 1L, "B" -> 1L))
  }

  // ── winRateMatrix ───────────────────────────────────────────────────────

  test("winRateMatrix: exact directed counts and half-away micro rate") {
    val g = games(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"),
      ("C", "A"))
    val got = Preference.winRateMatrix(g, "winner", "loser")
      .orderBy("item_a", "item_b")
      .select("item_a", "item_b", "wins_a", "wins_b", "n_games",
        "winrate_a_micro")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", "B", 3L, 1L, 4L, 750000L),
      ("A", "C", 0L, 1L, 1L, 0L)))
  }

  test("wilsonWinRates: hand-computed z=2 interval with exact isqrt") {
    // A 3–1 B: X = 4·(3·1 + 4) = 28, ⌊√28⌋ = 5;
    // lb = (5·4 − 10)/(4·8) = 10/32 = 0.3125, ub = 30/32 = 0.9375
    val g = games(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"))
    val got = Preference.wilsonWinRates(g, "winner", "loser")
      .select("wins_a", "n_games", "winrate_a_micro", "wilson_lb_a_micro",
        "wilson_ub_a_micro")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((3L, 4L, 750000L, 312500L, 937500L)))
  }

  test("wilsonWinRates: a perfect 2/2 record is bounded away from certainty") {
    // X = 2·(0 + 2) = 4, √4 = 2 exactly: lb = (4·2 − 4)/(2·6) = 1/3
    val g = games(("A", "B"), ("A", "B"))
    val got = Preference.wilsonWinRates(g, "winner", "loser")
      .select("winrate_a_micro", "wilson_lb_a_micro", "wilson_ub_a_micro")
      .as[(Long, Long, Long)].head()
    assert(got == ((1000000L, 333333L, 1000000L)))
  }

  test("bootstrapWinRate: degenerate log pins the band, weights shared per game") {
    // one game A beats B: every replicate that samples the game at all
    // gives A rate 10⁶ and B rate 0 — the band collapses onto the point
    // on BOTH sides (the weight is per game id, shared by both items),
    // and n_reps counts only weight-positive replicates, identically
    // for A and B
    val g = Seq((7L, "A", "B")).toDF("id", "winner", "loser")
    val got = Preference.bootstrapWinRate(g, "id", "winner", "loser",
        salt = "t", reps = 20)
      .orderBy("item")
      .select("item", "n_wins", "n_games", "winrate_micro", "n_reps",
        "boot_lo_micro", "boot_hi_micro")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq("A", "B"))
    val a = got.head; val b = got.last
    assert(a._4 == 1000000L && b._4 == 0L)
    assert(a._6 == 1000000L && a._7 == 1000000L)
    assert(b._6 == 0L && b._7 == 0L)
    assert(a._5 == b._5 && a._5 >= 2L, s"shared reps: ${a._5} vs ${b._5}")
  }

  test("bootstrapWinRate: deterministic, ordered band around a mixed record") {
    val g = (1L to 40L).map(i =>
      (i, if (i % 4 == 0L) "B" else "A", if (i % 4 == 0L) "A" else "B"))
      .toDF("id", "winner", "loser")
    def run() = Preference.bootstrapWinRate(g, "id", "winner", "loser",
        salt = "t2", reps = 20)
      .orderBy("item")
      .select("item", "winrate_micro", "n_reps", "boot_lo_micro",
        "boot_hi_micro")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val r1 = run(); val r2 = run()
    assert(r1 == r2, "hashed bootstrap must be run-deterministic")
    r1.foreach { case (item, rate, nReps, lo, hi) =>
      assert(lo <= hi, s"$item band inverted")
      assert(nReps == 20L, s"$item lost replicates: $nReps")
      assert(lo <= rate && rate <= hi,
        s"$item point $rate outside band [$lo, $hi] on a 30-game record")
    }
    assert(r1.head._2 == 750000L) // A wins 30/40 exactly
  }

  // ── passAtK ─────────────────────────────────────────────────────────────

  test("passAtK: exact rational, certainty when failures < k, NULL when n < k") {
    import graft.operators.Relevance
    // t1: n=6 c=1 → 1 − C(5,5)/C(6,5) = 5/6 → 833333
    // t2: n=6 c=2 → only 4 failures, every 5-subset hits a success → 1
    // t3: n=4 < k → NULL (the estimator is undefined, per Chen et al.)
    val rows =
      Seq.fill(5)(("t1", false)) ++ Seq(("t1", true)) ++
      Seq.fill(4)(("t2", false)) ++ Seq(("t2", true), ("t2", true)) ++
      Seq.fill(4)(("t3", false))
    val got = Relevance.passAtK(rows.toDF("task", "ok"), "task",
        col("ok"), k = 5)
      .orderBy("task")
      .select("task", "n_attempts", "n_success", "pass_at_5_micro")
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(("t1", 6L, 1L, Some(833333L)),
      ("t2", 6L, 2L, Some(1000000L)), ("t3", 4L, 0L, None)))
  }

  test("passAtK: NULL success flags count as failures") {
    import graft.operators.Relevance
    val rows = Seq(("t", Some(true)), ("t", None), ("t", None),
      ("t", None), ("t", None), ("t", None))
    val got = Relevance.passAtK(rows.toDF("task", "ok"), "task",
        col("ok"), k = 5)
      .select("n_success", "pass_at_5_micro")
      .as[(Long, Option[Long])].head()
    // n=6 c=1: same 5/6 as an explicit-false log
    assert(got == ((1L, Some(833333L))))
  }

  // ── copelandScores ──────────────────────────────────────────────────────

  test("copelandScores: majority points, ties counted half (×2 scale)") {
    // A beats B 2–0, A beats C 2–1, B ties C 1–1:
    // A: 2 maj wins → copeland2 = 4; B: 1 loss 1 tie → 1; C: 1 loss 1 tie → 1
    val g = games(("A", "B"), ("A", "B"), ("A", "C"), ("A", "C"),
      ("C", "A"), ("B", "C"), ("C", "B"))
    val got = Preference.copelandScores(g, "winner", "loser")
      .orderBy("item")
      .select("item", "n_opponents", "maj_wins", "maj_ties", "maj_losses",
        "copeland2")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 2L, 2L, 0L, 0L, 4L),
      ("B", 2L, 0L, 1L, 1L, 1L),
      ("C", 2L, 0L, 1L, 1L, 1L)))
  }

  // ── rankCentrality ──────────────────────────────────────────────────────

  test("rankCentrality: two-item walk reaches the exact stationary split") {
    // A beats B 3×: d = 1; term(A→B) = (10⁶·1) div 5 = 200k,
    // term(B→A) = (10⁶·4) div 5 = 800k → π¹ = (1.6e6, 0.4e6);
    // iter 2: 320k both ways → unchanged: exact stationary point.
    val g = games(("A", "B"), ("A", "B"), ("A", "B"))
    val got = Preference.rankCentrality(g, "winner", "loser", iters = 3)
      .orderBy("item")
      .select("item", "n_wins", "n_games", "rc_scaled")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", 3L, 3L, 1600000L), ("B", 0L, 3L, 400000L)))
  }

  test("rankCentrality: total mass is conserved exactly across iterations") {
    // the floored flow terms move out of one item and into another, so
    // Σπ must equal n_items·10⁶ exactly — any drift means the out/in
    // sums diverged (non-deterministic across engines)
    val g = games(("A", "B"), ("B", "C"), ("C", "A"), ("A", "C"),
      ("A", "B"), ("B", "C"))
    Seq(1, 3, 7).foreach { it =>
      val total = Preference.rankCentrality(g, "winner", "loser", iters = it)
        .agg(sum("rc_scaled")).as[Long].head()
      assert(total == 3000000L, s"mass drifted at iters=$it: $total")
    }
  }

  // ── plackettLuce ────────────────────────────────────────────────────────

  test("plackettLuce: two-item lists reach the hand-computed fixed point") {
    // [A, B] x3: iter1 p_A = (3*10^12) div 1.5e6 = 2,000,000, B floors
    // to 1; iter2 term = 10^12 div 2,000,001 = 499,999 -> p_A =
    // 3e12 div 1,499,997 = 2,000,004; iter3 -> 2,000,008 (exact floors)
    val r = (1 to 3).flatMap(i =>
        Seq((i.toLong, "A", 1L), (i.toLong, "B", 2L)))
      .toDF("rid", "item", "pos")
    val got = Preference.plackettLuce(r, "rid", "item", "pos", iters = 3)
      .orderBy("item")
      .select("item", "n_lists", "n_wins", "pl_scaled")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", 3L, 3L, 2000008L), ("B", 3L, 0L, 1L)))
  }

  test("plackettLuce: strengths follow a clean listwise dominance order") {
    val r = (1 to 10).flatMap(i => Seq((i.toLong, "A", 1L),
      (i.toLong, "B", 2L), (i.toLong, "C", 3L))).toDF("rid", "item", "pos")
    val pl = Preference.plackettLuce(r, "rid", "item", "pos")
      .select("item", "pl_scaled").as[(String, Long)].collect().toMap
    assert(pl("A") > pl("B") && pl("B") > pl("C"), s"order broken: $pl")
    assert(pl("C") >= 1L)
  }

  test("plackettLuce: 1-item lists carry no choice and are ignored") {
    val r = Seq((1L, "A", 1L), (2L, "A", 1L), (2L, "B", 2L))
      .toDF("rid", "item", "pos")
    val got = Preference.plackettLuce(r, "rid", "item", "pos")
      .select("item", "n_lists").as[(String, Long)].collect().toMap
    // rid 1 (a lone A) contributes nothing; only rid 2's list counts
    assert(got == Map("A" -> 1L, "B" -> 1L))
  }

  // ── btFitAudit ──────────────────────────────────────────────────────────

  test("btFitAudit: hand-computed Brier of the fitted strengths, no upsets") {
    // A beats B 3x -> strengths (1.6e6, 0.4e6) [the fixed point above];
    // P(A) = 0.8, per-game term = (0.4e6)^2*1e6/(2e6)^2 = 40000 -> mean
    val g = games(("A", "B"), ("A", "B"), ("A", "B"))
    val got = Preference.btFitAudit(g, "winner", "loser", iters = 3)
      .select("n_games", "upset2", "upset_micro", "brier_micro")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((3L, 0L, 0L, 40000L)))
  }

  test("btFitAudit: an incoherent log shows upset mass") {
    // A and B split 1-1: symmetric strengths, every game is a tie call
    // (p_w = p_l) -> upset2 = 2 (both games at half weight), rate 50%
    val g = games(("A", "B"), ("B", "A"))
    val got = Preference.btFitAudit(g, "winner", "loser")
      .select("n_games", "upset2", "upset_micro", "brier_micro")
      .as[(Long, Long, Long, Long)].head()
    assert(got._1 == 2L && got._2 == 2L && got._3 == 500000L)
    assert(got._4 == 250000L) // P = 1/2 -> (1/2)^2 Brier term
  }

  // ── judgePositionBias ───────────────────────────────────────────────────

  test("judgePositionBias: per-item split by own position, hand-computed") {
    // g1 (A>B, winner first), g2 (A>B, winner second), g3 (B>A, winner
    // first): A first in {g1}: 1/1; A second in {g2 win, g3 loss}: 1/2
    val g = Seq(("A", "B", true), ("A", "B", false), ("B", "A", true))
      .toDF("winner", "loser", "wf")
    val got = Preference.judgePositionBias(g, "winner", "loser", col("wf"))
      .orderBy("item")
      .select("item", "games_first", "wins_first", "games_second",
        "wins_second", "rate_first_micro", "rate_second_micro",
        "bias_micro")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long])].collect().toSeq
    assert(got == Seq(
      ("A", 1L, 1L, 2L, 1L, Some(1000000L), Some(500000L), Some(500000L)),
      ("B", 2L, 1L, 1L, 0L, Some(500000L), Some(0L), Some(500000L))))
  }

  test("judgePositionBias: one-sided items report NULL bias, unknown order drops") {
    val g = Seq(("A", "B", Some(true)), ("A", "B", Some(true)),
        ("A", "C", None: Option[Boolean]))
      .toDF("winner", "loser", "wf")
    val got = Preference.judgePositionBias(g, "winner", "loser", col("wf"))
      .orderBy("item")
      .select("item", "games_first", "games_second", "bias_micro")
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    // the unknown-order game vanishes entirely (no C row, A has 2 games)
    assert(got == Seq(("A", 2L, 0L, None), ("B", 0L, 2L, None)))
  }

  // ── brierDecomposition ──────────────────────────────────────────────────

  test("brierDecomposition: perfect sharp judge has REL 0, RES = UNC") {
    import graft.operators.Classify
    val df = Seq((100L, true), (100L, true), (0L, false), (0L, false))
      .toDF("p", "y").withColumn("g", lit("s"))
    val got = Classify.brierDecomposition(df, "g", "p", col("y"))
      .select("n_rows", "n_positive", "n_bins", "reliability_micro",
        "resolution_micro", "uncertainty_micro", "brier_micro",
        "ece_micro")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got == ((4L, 2L, 2L, 0L, 250000L, 250000L, 0L, 0L)))
  }

  test("brierDecomposition: maximally overconfident judge scores Brier 1") {
    import graft.operators.Classify
    val df = Seq((100L, false)).toDF("p", "y").withColumn("g", lit("s"))
    val got = Classify.brierDecomposition(df, "g", "p", col("y"))
      .select("reliability_micro", "resolution_micro",
        "uncertainty_micro", "brier_micro", "ece_micro")
      .as[(Long, Long, Long, Long, Long)].head()
    // single bin: REL = 1, RES = 0, UNC = 0, Brier = 1, ECE = 1 (micros)
    assert(got == ((1000000L, 0L, 0L, 1000000L, 1000000L)))
  }

  // ── conversationTurnAudit ───────────────────────────────────────────────

  test("conversationTurnAudit: runs, breaks, first/last roles hand-computed") {
    import graft.operators.Sessionize
    val ev = Seq(
      (1L, "user", 1L, 1L), (1L, "assistant", 2L, 2L), (1L, "user", 3L, 3L),
      (1L, "user", 4L, 4L), (1L, "assistant", 5L, 5L),
      (2L, "user", 1L, 6L))
      .toDF("conv", "role", "ts", "eid")
    val got = Sessionize.conversationTurnAudit(ev, "conv", "role", "ts",
        "eid")
      .orderBy("conv")
      .select("conv", "n_messages", "n_turns", "n_alternation_breaks",
        "max_run", "n_roles", "first_role", "last_role")
      .as[(Long, Long, Long, Long, Long, Long, String, String)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 5L, 4L, 1L, 2L, 2L, "user", "assistant"),
      (2L, 1L, 1L, 0L, 1L, 1L, "user", "user")))
  }

  // ── kendallTauA ─────────────────────────────────────────────────────────

  test("kendallTauA: hand-computed pair classes with an x-tie") {
    // x = (1,2,2,3), y = (1,3,2,4): 5 concordant, 0 discordant,
    // 1 x-tie; τ_a = half-away(5e6/6) = 833,333
    val df = Seq((1L, 1L, 1L), (2L, 2L, 3L), (3L, 2L, 2L), (4L, 3L, 4L))
      .toDF("id", "x", "y")
    val got = Standardize.kendallTauA(df, "id", "x", "y")
      .select("n_items", "n_pairs", "n_concordant", "n_discordant",
        "n_tied_x", "n_tied_y", "n_tied_both", "tau_a_micro")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got == ((4L, 6L, 5L, 0L, 1L, 0L, 0L, 833333L)))
  }

  test("kendallTauA: reversed ranking gives exactly -1, identical +1") {
    val df = Seq((1L, 1L, 30L), (2L, 2L, 20L), (3L, 3L, 10L))
      .toDF("id", "x", "y")
    val rev = Standardize.kendallTauA(df, "id", "x", "y")
      .select("tau_a_micro").as[Long].head()
    assert(rev == -1000000L)
    val same = Standardize.kendallTauA(df, "id", "x", "x")
      .select("tau_a_micro").as[Long].head()
    assert(same == 1000000L)
  }

  // ── cyclicTriads ────────────────────────────────────────────────────────

  test("cyclicTriads: rock-paper-scissors is cyclic, dominance is transitive") {
    val rps = games(("A", "B"), ("A", "B"), ("B", "C"), ("B", "C"),
      ("C", "A"), ("C", "A"))
    val gotRps = Preference.cyclicTriads(rps, "winner", "loser")
      .select("n_items", "n_majority_pairs", "n_triangles", "n_cyclic",
        "n_transitive", "cyclic_share_micro")
      .as[(Long, Long, Long, Long, Long, Option[Long])].head()
    assert(gotRps == ((3L, 3L, 1L, 1L, 0L, Some(1000000L))))
    val dom = games(("A", "B"), ("A", "C"), ("B", "C"))
    val gotDom = Preference.cyclicTriads(dom, "winner", "loser")
      .select("n_triangles", "n_cyclic", "n_transitive",
        "cyclic_share_micro")
      .as[(Long, Long, Long, Option[Long])].head()
    assert(gotDom == ((1L, 0L, 1L, Some(0L))))
  }

  test("cyclicTriads: tied pairs carry no majority edge; no triangle -> NULL share") {
    // A–B tied 1–1 breaks every triangle through that pair
    val g = games(("A", "B"), ("B", "A"), ("B", "C"), ("A", "C"))
    val got = Preference.cyclicTriads(g, "winner", "loser")
      .select("n_majority_pairs", "n_triangles", "n_cyclic",
        "cyclic_share_micro")
      .as[(Long, Long, Long, Option[Long])].head()
    assert(got == ((2L, 0L, 0L, None)))
  }
}
