package graft

import org.apache.spark.sql.functions._
import graft.operators.{Preference, Similarity, Standardize}

/** Hand-computed expectations for the round-14 preference/eval widening
  * (Fleiss' kappa, judge self-consistency, verbosity bias, the
  * comparison-graph identifiability audit, Schulze beatpath, Borda) and
  * the hot-bucket-capped LSH candidate path. */
class Preference2OpsSpec extends SparkSpec {
  import spark.implicits._

  private def games(rows: (String, String)*) =
    rows.toSeq.toDF("winner", "loser")

  // ── fleissKappa ─────────────────────────────────────────────────────────

  test("fleissKappa: hand-computed kappa on 3 units × 2 raters") {
    // u1:(A,A) u2:(A,B) u3:(B,B) — Σn_uc² = 4+1+1+4 = 10, N = 6,
    // A = 10−6 = 4, B = 3·2·1 = 6 → P̄ = 4/6 → 666667 micros.
    // n_A = n_B = 3 → C = 18, D = 36 → P̄e = 1/2 → 500000.
    // κ = (A·D − C·B)/(B·(D−C)) = 36/108 = 1/3 → 333333.
    val r = Seq(("u1", "A"), ("u1", "A"), ("u2", "A"), ("u2", "B"),
      ("u3", "B"), ("u3", "B")).toDF("unit", "label")
    val got = Standardize.fleissKappa(r, "unit", "label")
      .select("n_units", "n_raters", "n_categories", "complete",
        "p_bar_micro", "p_e_micro", "kappa_micro")
      .as[(Long, Long, Long, Boolean, Long, Long, Long)].head()
    assert(got == ((3L, 2L, 2L, true, 666667L, 500000L, 333333L)))
  }

  test("fleissKappa: perfect agreement is exactly 10^6; one category is NULL") {
    val perfect = Seq(("u1", "A"), ("u1", "A"), ("u2", "B"), ("u2", "B"))
      .toDF("unit", "label")
    val k1 = Standardize.fleissKappa(perfect, "unit", "label")
      .select("kappa_micro").as[Long].head()
    assert(k1 == 1000000L)
    // every rating the same category: P̄e = 1 ⇒ κ undefined, NULL not 0/0
    val mono = Seq(("u1", "A"), ("u1", "A"), ("u2", "A"), ("u2", "A"))
      .toDF("unit", "label")
    val k2 = Standardize.fleissKappa(mono, "unit", "label")
      .select(col("kappa_micro")).collect().head
    assert(k2.isNullAt(0))
  }

  test("fleissKappa: below-chance agreement is exactly -10^6") {
    // every unit splits (A,B): P̄ = 0; balanced marginals give P̄e = 1/2;
    // κ = (0 − 1/2)/(1 − 1/2) = −1 — the signed half-away path
    val r = Seq(("u1", "A"), ("u1", "B"), ("u2", "A"), ("u2", "B"),
      ("u3", "A"), ("u3", "B")).toDF("unit", "label")
    val got = Standardize.fleissKappa(r, "unit", "label")
      .select("p_bar_micro", "p_e_micro", "kappa_micro")
      .as[(Long, Long, Long)].head()
    assert(got == ((0L, 500000L, -1000000L)))
  }

  test("fleissKappa: unequal rater counts flag complete=false") {
    val r = Seq(("u1", "A"), ("u1", "B"), ("u2", "A"))
      .toDF("unit", "label")
    val got = Standardize.fleissKappa(r, "unit", "label")
      .select("complete", "n_raters").as[(Boolean, Long)].head()
    assert(got == ((false, 1L)))
    // rmin = 1 ⇒ no within-unit pairs: P̄ and κ are NULL, never 0/0 —
    // the q340 DuckDB oracle CASE-guards the same two columns (rmin>1;
    // rmin>1 AND d≠c) so both surfaces NULL identically on this edge
    val row = Standardize.fleissKappa(r, "unit", "label")
      .select(col("p_bar_micro"), col("kappa_micro")).collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  // ── gwetAC1 ─────────────────────────────────────────────────────────────

  test("gwetAC1: the kappa paradox — skewed agreement, negative kappa, high AC1") {
    // u1..u3 rated (A,A), u4 rated (A,B): raters agree on 3 of 4 units,
    // but the A-heavy marginal makes Fleiss' κ NEGATIVE — the paradox.
    // n = 4, r = 2: Σn_uc² = 4+4+4+2 = 14, N = 8 → A = 6, B = 8,
    // P̄ = 6/8 → 750000. n_A = 7, n_B = 1 → C = 50, D = 64.
    // κ: P̄e = 50/64 → κ = (6·64 − 50·8)/(8·14) = −16/112 → −142857.
    // AC1: P̄e = (64−50)/(1·64) = 14/64 → 218750;
    //   AC1 = (6·1·64 − 8·14)/(8·(0·64+50)) = 272/400 → 680000.
    val r = Seq(("u1", "A"), ("u1", "A"), ("u2", "A"), ("u2", "A"),
      ("u3", "A"), ("u3", "A"), ("u4", "A"), ("u4", "B"))
      .toDF("unit", "label")
    val kap = Standardize.fleissKappa(r, "unit", "label")
      .select("p_bar_micro", "p_e_micro", "kappa_micro")
      .as[(Long, Long, Long)].head()
    assert(kap == ((750000L, 781250L, -142857L)))
    val ac1 = Standardize.gwetAC1(r, "unit", "label")
      .select("n_units", "n_raters", "n_categories", "complete",
        "p_bar_micro", "p_e_ac1_micro", "ac1_micro")
      .as[(Long, Long, Long, Boolean, Long, Long, Long)].head()
    assert(ac1 == ((4L, 2L, 2L, true, 750000L, 218750L, 680000L)))
  }

  test("gwetAC1: balanced marginals agree with kappa; one category is NULL") {
    // the q164/q340 balanced fixture: κ = AC1 = 1/3 exactly
    val r = Seq(("u1", "A"), ("u1", "A"), ("u2", "A"), ("u2", "B"),
      ("u3", "B"), ("u3", "B")).toDF("unit", "label")
    val got = Standardize.gwetAC1(r, "unit", "label")
      .select("p_bar_micro", "p_e_ac1_micro", "ac1_micro")
      .as[(Long, Long, Long)].head()
    assert(got == ((666667L, 500000L, 333333L)))
    // single global category: chance agreement undefined → NULL, not 0/0
    val mono = Seq(("u1", "A"), ("u1", "A"), ("u2", "A"), ("u2", "A"))
      .toDF("unit", "label")
    val row = Standardize.gwetAC1(mono, "unit", "label")
      .select(col("p_e_ac1_micro"), col("ac1_micro")).collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  // ── krippendorffAlphaInterval ───────────────────────────────────────────

  test("krippendorffAlphaInterval: hand-computed signed alpha, guards") {
    // u1:(1,2), u2:(1,3), r = 2: DO = 2·1 + 2·4 = 10 (ordered pairs);
    // marginals 1:2, 2:1, 3:1 → DE = 2·(2·1·1) + 2·(2·1·4) + 2·(1·1·1)
    // = 22; N = 4 → α = (1·22 − 3·10)/22 = −8/22 → −363636
    val a = Seq(("u1", 1L), ("u1", 2L), ("u2", 1L), ("u2", 3L))
      .toDF("unit", "value")
    val gotA = Standardize.krippendorffAlphaInterval(a, "unit", "value")
      .select("n_units", "n_raters", "n_categories", "complete",
        "do_scaled", "de_scaled", "alpha_micro")
      .as[(Long, Long, Long, Boolean, Long, Long, Long)].head()
    assert(gotA == ((2L, 2L, 3L, true, 10L, 22L, -363636L)))
    // perfect within-unit agreement across different values → exactly 1
    val b = Seq(("u1", 2L), ("u1", 2L), ("u2", 5L), ("u2", 5L))
      .toDF("unit", "value")
    val gotB = Standardize.krippendorffAlphaInterval(b, "unit", "value")
      .select("do_scaled", "de_scaled", "alpha_micro")
      .as[(Long, Long, Long)].head()
    assert(gotB == ((0L, 72L, 1000000L)))
    // every rating the same value: DE = 0 → NULL, never 0/0
    val c = Seq(("u1", 3L), ("u1", 3L), ("u2", 3L), ("u2", 3L))
      .toDF("unit", "value")
    val rowC = Standardize.krippendorffAlphaInterval(c, "unit", "value")
      .select(col("alpha_micro")).collect().head
    assert(rowC.isNullAt(0))
  }

  test("krippendorffAlphaInterval: one-notch misses score above whole-scale misses") {
    // the ordinal point nominal agreement cannot express: every unit
    // disagrees in BOTH fixtures, but adjacent-notch disagreement
    // (1 vs 2, 2 vs 3) stays positive while whole-scale disagreement
    // (1 vs 5) goes sharply negative
    val near = Seq(("u1", 1L), ("u1", 2L), ("u2", 2L), ("u2", 3L))
      .toDF("unit", "value")
    val aNear = Standardize.krippendorffAlphaInterval(near, "unit", "value")
      .select("alpha_micro").as[Long].head()
    assert(aNear == 250000L) // (16 − 3·4)/16
    val far = Seq(("u1", 1L), ("u1", 5L), ("u2", 5L), ("u2", 1L))
      .toDF("unit", "value")
    val aFar = Standardize.krippendorffAlphaInterval(far, "unit", "value")
      .select("alpha_micro").as[Long].head()
    assert(aFar == -500000L) // (128 − 3·64)/128
    assert(aNear > 0 && aFar < 0)
  }

  // ── salt-split-fed embedding dedup (q356 composition) ──────────────────

  test("embedding dedup clusters are identical through the salt-split path") {
    // the q350 losslessness carried to the CLUSTER level: components
    // over salt-split pairs == components over uncapped pairs, on a
    // fixture where the cap engages on every candidate bucket
    val emb = (0L until 30L)
      .map(i => (i, Array.fill(8)(if (i % 2 == 0) 1.0f else -1.0f)
        .zipWithIndex.map { case (v, d) => v * (1.0f + d * 0.01f) }.toSeq))
      .toDF("vec_id", "embedding")
    def clusters(pairs: org.apache.spark.sql.DataFrame) =
      graft.operators.Graph.connectedComponents(
          pairs.select(col("d1"), col("d2")), "d1", "d2")
        .select("node", "component").as[(Long, Long)].collect().toSet
    val viaSplit = clusters(Similarity.cosineNearDupPairsBucketedSaltSplit(
      emb, "vec_id", "embedding", 0.9, maxBucket = 4L, nTables = 2,
      planesPerTable = 3, dims = 8))
    val viaUncapped = clusters(Similarity.cosineNearDupPairsBucketed(
      emb, "vec_id", "embedding", 0.9, nTables = 2, planesPerTable = 3,
      dims = 8))
    assert(viaSplit.nonEmpty && viaSplit == viaUncapped)
  }

  // ── judgeConsistency ────────────────────────────────────────────────────

  test("judgeConsistency: flips and majority share, hand-computed") {
    // J1 judges (A,B) four times — 3× A wins, 1× B wins (a flip pair,
    // majority 3/4) — plus one unrepeated (A,C) game.
    // J2 has only single games: consistency must be NULL, not 10^6.
    val g = Seq(
      ("J1", "A", "B"), ("J1", "A", "B"), ("J1", "A", "B"),
      ("J1", "B", "A"), ("J1", "A", "C"),
      ("J2", "A", "B"), ("J2", "B", "C"))
      .toDF("judge", "winner", "loser")
    val got = Preference.judgeConsistency(g, "judge", "winner", "loser")
      .orderBy("judge")
      .select("judge", "n_pairs", "n_games", "n_pairs_repeated",
        "n_games_repeated", "n_flip_pairs", "consistency_micro")
      .as[(String, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      ("J1", 2L, 5L, 1L, 4L, 1L, Some(750000L)),
      ("J2", 2L, 2L, 0L, 0L, 0L, None)))
  }

  test("judgeConsistency: a perfectly self-consistent judge scores 10^6") {
    val g = Seq.fill(5)(("J", "A", "B")).toDF("judge", "winner", "loser")
    val got = Preference.judgeConsistency(g, "judge", "winner", "loser")
      .select("n_flip_pairs", "consistency_micro")
      .as[(Long, Long)].head()
    assert(got == ((0L, 1000000L)))
  }

  // ── verbosityBias ───────────────────────────────────────────────────────

  test("verbosityBias: counts, rate and z=2 Wilson interval, hand-computed") {
    // (5,3) longer won; (4,1) longer won; (2,2) equal; (1,6) shorter won
    // decided n = 3, w = 2 → rate 2/3 → 666667.
    // x = 3·(2·1 + 3) = 15, ⌊√15⌋ = 3; den = 3·7 = 21
    // lb = (4·3 − 2·3)·10⁶/21 = 285714.29 → 285714
    // ub = (4·3 + 2·3)·10⁶/21 = 857142.86 → 857143
    val g = Seq((5L, 3L), (4L, 1L), (2L, 2L), (1L, 6L))
      .toDF("winner_len", "loser_len")
    val got = Preference.verbosityBias(g, "winner_len", "loser_len")
      .select("n_games", "n_longer_won", "n_shorter_won", "n_equal_len",
        "longer_win_micro", "wilson_lb_micro", "wilson_ub_micro")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got == ((4L, 2L, 1L, 1L, 666667L, 285714L, 857143L)))
  }

  test("verbosityBias: NULL lengths drop visibly; all-equal yields NULL rate") {
    val g = Seq((Some(3L), Some(3L)), (None, Some(2L)), (Some(1L), None))
      .toDF("winner_len", "loser_len")
    val row = Preference.verbosityBias(g, "winner_len", "loser_len")
      .collect().head
    assert(row.getLong(row.fieldIndex("n_games")) == 1L)
    assert(row.isNullAt(row.fieldIndex("longer_win_micro")))
  }

  // ── comparisonGraphAudit ────────────────────────────────────────────────

  test("comparisonGraphAudit: two components, boundary items, coverage") {
    // A<->B in one component; C>D in another. 4 items, 2 observed pairs
    // of C(4,2)=6 → coverage 2/6 → 333333. C never lost, D never won.
    val g = games(("A", "B"), ("B", "A"), ("C", "D"))
    val got = Preference.comparisonGraphAudit(g, "winner", "loser")
      .select("n_items", "n_observed_pairs", "pair_coverage_micro",
        "n_components", "largest_component", "n_undefeated", "n_winless")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got == ((4L, 2L, 333333L, 2L, 2L, 1L, 1L)))
  }

  test("comparisonGraphAudit: a 5-chain closes into one component") {
    // path A>B>C>D>E needs multiple min-label rounds — convergence, not
    // a fixed round count, must decide
    val g = games(("A", "B"), ("B", "C"), ("C", "D"), ("D", "E"))
    val got = Preference.comparisonGraphAudit(g, "winner", "loser")
      .select("n_components", "largest_component", "n_undefeated",
        "n_winless")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((1L, 5L, 1L, 1L)))
  }

  test("comparisonGraphAudit: diameter > maxRounds fails loud, not wrong") {
    // 8-chain A>B>…>H has diameter 7; min-label needs up to 7 rounds.
    // With maxRounds=3 the loop exits with labels still changing —
    // returning them would report >1 components for a connected graph,
    // so the contract is an exception naming the knob.
    val g = games(("A", "B"), ("B", "C"), ("C", "D"), ("D", "E"),
      ("E", "F"), ("F", "G"), ("G", "H"))
    val ex = intercept[IllegalStateException] {
      Preference.comparisonGraphAudit(g, "winner", "loser", maxRounds = 3)
        .collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    assert(ex.getMessage.contains("maxRounds"))
    // the same graph with enough rounds (diameter 7 + the confirming
    // round) closes into one component
    val ok = Preference.comparisonGraphAudit(g, "winner", "loser",
        maxRounds = 8)
      .select("n_components", "largest_component")
      .as[(Long, Long)].head()
    assert(ok == ((1L, 8L)))
  }

  // ── schulzeRanking ──────────────────────────────────────────────────────

  test("schulzeRanking: beatpath resolves the cycle Copeland cannot") {
    // A>B ×3, B>C ×3, C>A ×2 — a perfect cyclic triad: Copeland scores
    // tie 1-1-1, but beatpaths break it by decisiveness:
    // P(A,B)=3 vs P(B,A)=min(3,2)=2 → A wins; P(B,C)=3 vs 2 → B wins;
    // P(A,C)=min(3,3)=3 vs P(C,A)=2 → A wins. Order A > B > C.
    val g = games(Seq.fill(3)(("A", "B")) ++ Seq.fill(3)(("B", "C")) ++
      Seq.fill(2)(("C", "A")): _*)
    val cope = Preference.copelandScores(g, "winner", "loser")
      .select("item", "copeland2").as[(String, Long)].collect().toMap
    assert(cope.values.toSet.size == 1, s"triad should tie Copeland: $cope")
    val got = Preference.schulzeRanking(g, "winner", "loser")
      .orderBy("item")
      .select("item", "n_rivals", "path_wins", "path_losses", "path_ties",
        "schulze2")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 2L, 2L, 0L, 0L, 4L),
      ("B", 2L, 1L, 1L, 0L, 2L),
      ("C", 2L, 0L, 2L, 0L, 0L)))
  }

  test("schulzeRanking: unconnected rivals count as beatpath ties") {
    // A beats B; C plays only D: P(A,C)=P(C,A)=0 → tie by absence
    val g = games(("A", "B"), ("C", "D"))
    val got = Preference.schulzeRanking(g, "winner", "loser")
      .filter(col("item") === "A")
      .select("n_rivals", "path_wins", "path_ties")
      .as[(Long, Long, Long)].head()
    assert(got == ((3L, 1L, 2L))) // beats B; ties C and D by absence
  }

  // ── rating-system agreement composition ─────────────────────────────────

  test("kendallTauA(bradleyTerry, copeland): clean dominance agrees at 10^6") {
    // A>B, B>C, A>C (2 games each): both systems order A > B > C —
    // every item pair concordant, tau_a = 10^6
    val g = games(Seq.fill(2)(("A", "B")) ++ Seq.fill(2)(("B", "C")) ++
      Seq.fill(2)(("A", "C")): _*)
    val bt = Preference.bradleyTerry(g, "winner", "loser")
      .select(col("item"), col("bt_scaled"))
    val cope = Preference.copelandScores(g, "winner", "loser")
      .select(col("item"), col("copeland2"))
    val got = Standardize.kendallTauA(bt.join(cope, Seq("item")), "item",
        "bt_scaled", "copeland2")
      .select("n_items", "n_pairs", "n_concordant", "tau_a_micro")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((3L, 3L, 3L, 1000000L)))
  }

  // ── bordaCount ──────────────────────────────────────────────────────────

  test("bordaCount: positional points and per-term-floored normalized mean") {
    // L1: A>B>C (m=3): pts 2/1/0, norms 10⁶ / 500000 / 0
    // L2: B>A (m=2): pts 1/0, norms 10⁶ / 0
    // L3: a singleton — ignored
    val r = Seq(
      ("L1", "A", 1L), ("L1", "B", 2L), ("L1", "C", 3L),
      ("L2", "B", 1L), ("L2", "A", 2L),
      ("L3", "A", 1L)).toDF("list", "item", "pos")
    val got = Preference.bordaCount(r, "list", "item", "pos")
      .orderBy("item")
      .select("item", "n_lists", "borda_score", "borda_mean_micro")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 2L, 2L, 500000L),
      ("B", 2L, 2L, 750000L),
      ("C", 1L, 0L, 0L)))
  }

  // ── bradleyTerryBootstrap ───────────────────────────────────────────────

  test("bradleyTerryBootstrap: point parity, band order, per-rep dominance") {
    // A beats B in every game: every replicate reweights the SAME
    // direction, so per replicate p_A >= p_B (elementwise), which makes
    // both band endpoints of A dominate B's. The point estimate must
    // equal the plain bradleyTerry fit (2-item fixed point: 1.6e6/4e5).
    val g = Seq((1L, "A", "B"), (2L, "A", "B"), (3L, "A", "B"))
      .toDF("gid", "winner", "loser")
    val got = Preference.bradleyTerryBootstrap(g, "gid", "winner",
        "loser", salt = "t14", reps = 20, iters = 3)
      .orderBy("item")
      .select("item", "n_wins", "n_games", "bt_scaled", "n_reps",
        "bt_lo_scaled", "bt_hi_scaled")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val a = got.head; val b = got(1)
    assert(a._1 == "A" && b._1 == "B")
    assert(a._4 == 1600000L && b._4 == 400000L) // point = plain BT
    assert(a._5 == 20L && b._5 == 20L)
    assert(a._6 <= a._7 && b._6 <= b._7)        // lo <= hi
    assert(a._6 >= b._6 && a._7 >= b._7)        // per-rep dominance
    // strengths stay in the fixed-point range (1 micro .. 2S)
    assert(b._6 >= 1L && a._7 <= 2000000L)
  }

  test("bradleyTerryBootstrap: a decisive log separates the bands") {
    // 40 A>B games vs 2 B>C: A vs B is decided overwhelmingly — A's
    // lower band end must sit above B's upper end (non-overlap is the
    // operator's whole point)
    val g = ((1L to 40L).map(i => (i, "A", "B")) ++
      Seq((41L, "B", "C"), (42L, "B", "C")))
      .toDF("gid", "winner", "loser")
    val bands = Preference.bradleyTerryBootstrap(g, "gid", "winner",
        "loser", salt = "t14b", reps = 20, iters = 3)
      .select("item", "bt_lo_scaled", "bt_hi_scaled")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(bands("A")._1 > bands("B")._2,
      s"A's band must clear B's entirely: $bands")
  }

  // ── capped LSH candidate path ───────────────────────────────────────────

  test("capped LSH: generous cap reproduces the uncapped pairs exactly") {
    val emb = (0L until 30L)
      .map(i => (i, Array.fill(8)(if (i % 2 == 0) 1.0f else -1.0f)
        .zipWithIndex.map { case (v, d) => v * (1.0f + d * 0.01f) }.toSeq))
      .toDF("vec_id", "embedding")
    val uncapped = Similarity.cosineNearDupPairsBucketed(
        emb, "vec_id", "embedding", 0.9, nTables = 2, planesPerTable = 3,
        dims = 8)
      .orderBy("d1", "d2").collect().toSeq
    val capped = Similarity.cosineNearDupPairsBucketedCapped(
        emb, "vec_id", "embedding", 0.9, maxBucket = 1000L, nTables = 2,
        planesPerTable = 3, dims = 8)
      .orderBy("d1", "d2").collect().toSeq
    assert(uncapped.nonEmpty && capped == uncapped)
  }

  test("capped LSH: identical vectors bust the cap; exclusion is reported") {
    // 20 verbatim copies land in the same bucket of every table — the
    // exact-copy hot-bucket case the cap exists for. With maxBucket = 5
    // every bucket they occupy is over-cap: zero candidate pairs, and
    // the exclusion report names each dropped (tbl, sig) bucket.
    val emb = (0L until 20L)
      .map(i => (i, Seq.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairsBucketedCapped(
      emb, "vec_id", "embedding", 0.9, maxBucket = 5L, nTables = 2,
      planesPerTable = 3, dims = 8)
    assert(pairs.count() == 0L)
    val excl = Similarity.lshExcludedBuckets(emb, "vec_id", "embedding",
        maxBucket = 5L, nTables = 2, planesPerTable = 3, dims = 8)
      .select("bucket_size").as[Long].collect().toSeq
    assert(excl == Seq(20L, 20L)) // one hot bucket per table
    // and the uncapped path would have emitted all C(20,2) pairs
    val uncapped = Similarity.cosineNearDupPairsBucketed(
      emb, "vec_id", "embedding", 0.9, nTables = 2, planesPerTable = 3,
      dims = 8)
    assert(uncapped.count() == 190L)
  }

  // ── dawidSkeneConfusion ─────────────────────────────────────────────────

  test("dawidSkeneConfusion: iters = 0 is the hand-computed majority-weighted M-step") {
    // r = 2: u1 rated (J1:A, J2:A), u2 rated (J1:A, J2:B).
    // T0: u1 {A: 10^6}, u2 {A: 5·10^5, B: 5·10^5}. Add-one smoothing,
    // L = 2. J1 rates A on both units:
    //   π_J1(A,A) = (1.5e6+1e6)/(1.5e6+2e6) = 2.5/3.5 → 714286
    //   π_J1(A,B) = (0+1e6)/3.5e6 → 285714
    //   π_J1(B,·): mass 5e5 (u2 only, label A):
    //     (B,A) = 1.5e6/2.5e6 → 600000, (B,B) = 1e6/2.5e6 → 400000
    // J2 rates u1:A, u2:B:
    //   (A,A) = 2e6/3.5e6 → 571429, (A,B) = 1.5e6/3.5e6 → 428571
    //   (B,A) = 1e6/2.5e6 → 400000, (B,B) = 1.5e6/2.5e6 → 600000
    val r = Seq(("u1", "J1", "A"), ("u1", "J2", "A"),
      ("u2", "J1", "A"), ("u2", "J2", "B"))
      .toDF("unit", "judge", "label")
    val got = Preference.dawidSkeneConfusion(r, "unit", "judge", "label",
        r = 2, iters = 0)
      .orderBy("judge", "true_class", "label")
      .select("judge", "true_class", "label", "pi_micro", "n_ratings")
      .as[(String, String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("J1", "A", "A", 714286L, 2L), ("J1", "A", "B", 285714L, 0L),
      ("J1", "B", "A", 600000L, 2L), ("J1", "B", "B", 400000L, 0L),
      ("J2", "A", "A", 571429L, 1L), ("J2", "A", "B", 428571L, 1L),
      ("J2", "B", "A", 400000L, 1L), ("J2", "B", "B", 600000L, 1L)))
  }

  test("dawidSkeneConfusion: EM sharpens a consistent majority against one dissenter") {
    // 3 judges, 4 units; J1/J2 always agree, J3 always dissents on
    // B-units. After an EM cycle the agreeing judges' diagonal must
    // dominate and every (judge, class) row still sums to ~10^6.
    val r = Seq(
      ("u1", "J1", "A"), ("u1", "J2", "A"), ("u1", "J3", "A"),
      ("u2", "J1", "B"), ("u2", "J2", "B"), ("u2", "J3", "A"),
      ("u3", "J1", "B"), ("u3", "J2", "B"), ("u3", "J3", "A"),
      ("u4", "J1", "A"), ("u4", "J2", "A"), ("u4", "J3", "A"))
      .toDF("unit", "judge", "label")
    val got = Preference.dawidSkeneConfusion(r, "unit", "judge", "label",
        r = 3, iters = 2)
      .select("judge", "true_class", "label", "pi_micro")
      .as[(String, String, String, Long)].collect().toSeq
    assert(got.size == 12) // 3 judges × 2 classes × 2 labels
    assert(got.forall(x => x._4 >= 1L && x._4 <= 1000000L))
    // rows sum to 10^6 up to per-cell rounding
    got.groupBy(x => (x._1, x._2)).foreach { case (k, rows) =>
      val s = rows.map(_._4).sum
      assert(math.abs(s - 1000000L) <= rows.size, s"row $k sums to $s")
    }
    val pi = got.map(x => (x._1, x._2, x._3) -> x._4).toMap
    // agreeing judges: diagonal beats off-diagonal on both classes
    for (j <- Seq("J1", "J2"); c <- Seq("A", "B")) {
      val other = if (c == "A") "B" else "A"
      assert(pi((j, c, c)) > pi((j, c, other)),
        s"$j should look reliable on class $c: $pi")
    }
    // the dissenter's B row must show the A-confusion
    assert(pi(("J3", "B", "A")) > pi(("J3", "B", "B")),
      s"J3's B-confusion must surface: $pi")
  }

  test("dawidSkenePosteriors: hand-computed one-cycle posteriors + MAP flag") {
    // Same fixture as the iters = 0 confusion spec; after ONE (M, E)
    // cycle with the hand-computed π/priors (p(A) = 625000,
    // p(B) = 375000):
    //   u1 (J1:A, J2:A): num(A) = 625000·714286·571429,
    //     num(B) = 375000·600000·400000 → T = 739208 / 260792
    //   u2 (J1:A, J2:B): num(A) = 625000·714286·428571,
    //     num(B) = 375000·600000·600000 → T = 586304 / 413696
    val r = Seq(("u1", "J1", "A"), ("u1", "J2", "A"),
      ("u2", "J1", "A"), ("u2", "J2", "B"))
      .toDF("unit", "judge", "label")
    val got = Preference.dawidSkenePosteriors(r, "unit", "judge", "label",
        r = 2, iters = 1)
      .orderBy("unit", "true_class")
      .select("unit", "true_class", "t_micro", "is_map")
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("u1", "A", 739208L, true), ("u1", "B", 260792L, false),
      ("u2", "A", 586304L, true), ("u2", "B", 413696L, false)))
  }

  test("dawidSkenePosteriors: EM overturns a majority the reliable judges contradict") {
    // u5 is rated (B, B, A) — raw majority B — but J1/J2 are the judges
    // who always agree elsewhere while J3 always says A; with judge
    // reliability learned from u1..u4, u5's MAP must STAY with the
    // reliable majority B (and the posterior must be dense, 2 rows per
    // unit summing to ~10^6)
    val r = Seq(
      ("u1", "J1", "A"), ("u1", "J2", "A"), ("u1", "J3", "A"),
      ("u2", "J1", "B"), ("u2", "J2", "B"), ("u2", "J3", "A"),
      ("u3", "J1", "B"), ("u3", "J2", "B"), ("u3", "J3", "A"),
      ("u4", "J1", "A"), ("u4", "J2", "A"), ("u4", "J3", "A"),
      ("u5", "J1", "B"), ("u5", "J2", "B"), ("u5", "J3", "A"))
      .toDF("unit", "judge", "label")
    val got = Preference.dawidSkenePosteriors(r, "unit", "judge", "label",
        r = 3, iters = 2)
      .select("unit", "true_class", "t_micro", "is_map")
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(got.size == 10) // 5 units × 2 classes, dense
    got.groupBy(_._1).foreach { case (u, rows) =>
      assert(rows.count(_._4) == 1, s"$u needs exactly one MAP row")
      val s = rows.map(_._3).sum
      assert(math.abs(s - 1000000L) <= rows.size, s"$u sums to $s")
    }
    val map5 = got.filter(x => x._1 == "u5" && x._4).head._2
    assert(map5 == "B", s"u5's MAP should follow the reliable judges: $got")
  }

  test("dawidSkeneConfusion: units without exactly r ratings are dropped LOUDLY") {
    val r = Seq(("u1", "J1", "A"), ("u1", "J2", "A"),
      ("u2", "J1", "A")) // u2 has 1 rating, r = 2 — dropped, counted
      .toDF("unit", "judge", "label")
    val got = Preference.dawidSkeneConfusion(r, "unit", "judge", "label",
        r = 2, iters = 1)
      .select("judge", "n_ratings", "n_units_excluded")
      .as[(String, Long, Long)].collect().toSeq
    // only u1's ratings survive: J1 and J2 each carry 1 rating, and the
    // single observed class A yields a 1×1 confusion cell per judge —
    // and EVERY row announces the one dropped unit (q339 convention)
    assert(got.toSet == Set(("J1", 1L, 1L), ("J2", 1L, 1L)))
    // posteriors carry the same ledger
    val post = Preference.dawidSkenePosteriors(r, "unit", "judge",
        "label", r = 2, iters = 1)
      .select("unit", "n_units_excluded").as[(String, Long)]
      .collect().toSeq
    assert(post.toSet == Set(("u1", 1L)))
    // complete input → ledger reads 0
    val full = Preference.dawidSkeneConfusion(
        r.filter($"unit" === "u1"), "unit", "judge", "label",
        r = 2, iters = 1)
      .select("n_units_excluded").as[Long].collect().toSet
    assert(full == Set(0L))
  }

  test("ragged Dawid-Skene: complete input reproduces the fixed-r fit exactly") {
    val r = Seq(
      ("u1", "J1", "A"), ("u1", "J2", "A"), ("u1", "J3", "A"),
      ("u2", "J1", "B"), ("u2", "J2", "B"), ("u2", "J3", "A"),
      ("u3", "J1", "B"), ("u3", "J2", "B"), ("u3", "J3", "A"),
      ("u4", "J1", "A"), ("u4", "J2", "A"), ("u4", "J3", "A"))
      .toDF("unit", "judge", "label")
    val fixed = Preference.dawidSkeneConfusion(r, "unit", "judge",
        "label", r = 3, iters = 2)
      .orderBy("judge", "true_class", "label")
      .select("judge", "true_class", "label", "pi_micro", "n_ratings")
      .collect().toSeq
    val ragged = Preference.dawidSkeneConfusionRagged(r, "unit", "judge",
        "label", rMax = 3, iters = 2)
      .orderBy("judge", "true_class", "label")
      .select("judge", "true_class", "label", "pi_micro", "n_ratings")
      .collect().toSeq
    assert(ragged == fixed)
    val fixedPost = Preference.dawidSkenePosteriors(r, "unit", "judge",
        "label", r = 3, iters = 2)
      .orderBy("unit", "true_class")
      .select("unit", "true_class", "t_micro", "is_map").collect().toSeq
    val raggedPost = Preference.dawidSkenePosteriorsRagged(r, "unit",
        "judge", "label", rMax = 3, iters = 2)
      .orderBy("unit", "true_class")
      .select("unit", "true_class", "t_micro", "is_map").collect().toSeq
    assert(raggedPost == fixedPost)
  }

  test("ragged Dawid-Skene: mixed-r units all contribute, r_u reported") {
    // u5 has only 2 of 3 ratings — the fixed-r fit drops it; the ragged
    // fit keeps it (T0 = n_uc/2, E-step third slot neutral) and reports
    // its own r_u. u6 has 1 rating — excluded (and counted) even ragged.
    val r = Seq(
      ("u1", "J1", "A"), ("u1", "J2", "A"), ("u1", "J3", "A"),
      ("u2", "J1", "B"), ("u2", "J2", "B"), ("u2", "J3", "A"),
      ("u3", "J1", "B"), ("u3", "J2", "B"), ("u3", "J3", "A"),
      ("u4", "J1", "A"), ("u4", "J2", "A"), ("u4", "J3", "A"),
      ("u5", "J1", "B"), ("u5", "J2", "B"),
      ("u6", "J3", "A"))
      .toDF("unit", "judge", "label")
    val post = Preference.dawidSkenePosteriorsRagged(r, "unit", "judge",
        "label", rMax = 3, iters = 2)
      .select("unit", "true_class", "t_micro", "is_map", "n_ratings",
        "n_units_excluded")
      .as[(String, String, Long, Boolean, Long, Long)].collect().toSeq
    // 5 kept units × 2 classes, dense; u6 excluded and announced
    assert(post.size == 10)
    assert(post.forall(_._6 == 1L))
    val byUnit = post.groupBy(_._1)
    assert(byUnit.keySet == Set("u1", "u2", "u3", "u4", "u5"))
    byUnit.foreach { case (u, rows) =>
      assert(rows.count(_._4) == 1, s"$u needs exactly one MAP row")
      val s = rows.map(_._3).sum
      assert(math.abs(s - 1000000L) <= rows.size, s"$u sums to $s")
      val ru = rows.map(_._5).toSet
      assert(ru == Set(if (u == "u5") 2L else 3L), s"$u r_u=$ru")
    }
    // u5 was rated B by the two reliable judges: its MAP must be B
    assert(post.find(x => x._1 == "u5" && x._4).get._2 == "B")
    // the confusion side counts u5's ratings into the (judge, label)
    // evidence: J1 carries 5 ratings now (4 complete units + u5)
    val conf = Preference.dawidSkeneConfusionRagged(r, "unit", "judge",
        "label", rMax = 3, iters = 2)
      .filter($"judge" === "J1" && $"true_class" === "A")
      .select("label", "n_ratings").as[(String, Long)].collect().toMap
    assert(conf("A") + conf("B") == 5L)
  }

  test("ragged Dawid-Skene truncate=true: over-rMax units kept on first rMax ratings") {
    // u7 carries 4 ratings at rMax = 3: default EXCLUDES it (counted);
    // truncate = true keeps its first 3 in (judge, label) order —
    // identical to pre-truncating the input by row_number <= 3.
    val r = Seq(
      ("u1", "J1", "A"), ("u1", "J2", "A"), ("u1", "J3", "A"),
      ("u2", "J1", "B"), ("u2", "J2", "B"), ("u2", "J3", "A"),
      ("u3", "J1", "B"), ("u3", "J2", "B"), ("u3", "J3", "A"),
      ("u7", "J1", "A"), ("u7", "J2", "A"), ("u7", "J3", "B"),
      ("u7", "J4", "B"),
      ("u6", "J3", "A"))
      .toDF("unit", "judge", "label")
    // default: u7 excluded alongside single-rating u6
    val defConf = Preference.dawidSkeneConfusionRagged(r, "unit", "judge",
        "label", rMax = 3, iters = 1)
      .select("n_units_excluded").as[Long].collect().toSet
    assert(defConf == Set(2L))
    // truncate: only u6 excluded; result identical to external pre-cut
    val pre = r.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"unit").orderBy($"judge", $"label")))
      .filter($"rn" <= 3).drop("rn")
    val gotTrunc = Preference.dawidSkeneConfusionRagged(r, "unit", "judge",
        "label", rMax = 3, iters = 1, truncate = true)
      .orderBy("judge", "true_class", "label")
      .select("judge", "true_class", "label", "pi_micro", "n_ratings",
        "n_units_excluded").collect().toSeq
    val gotPre = Preference.dawidSkeneConfusionRagged(pre, "unit", "judge",
        "label", rMax = 3, iters = 1)
      .orderBy("judge", "true_class", "label")
      .select("judge", "true_class", "label", "pi_micro", "n_ratings",
        "n_units_excluded").collect().toSeq
    assert(gotTrunc == gotPre)
    assert(gotTrunc.forall(_.getLong(5) == 1L))
    // posteriors twin: u7 reports n_ratings = rMax after truncation
    val post = Preference.dawidSkenePosteriorsRagged(r, "unit", "judge",
        "label", rMax = 3, iters = 1, truncate = true)
      .select("unit", "n_ratings", "n_units_excluded")
      .as[(String, Long, Long)].collect().toSeq
    assert(post.filter(_._1 == "u7").forall(x => x._2 == 3L && x._3 == 1L))
    assert(post.map(_._1).toSet == Set("u1", "u2", "u3", "u7"))
  }

  // ── lengthControlledWinRate ─────────────────────────────────────────────

  test("lengthControlledWinRate: hand-computed buckets, Wilson per bucket") {
    // gapWidth = 2: bucket 0 = gaps {1,2}, bucket 1 = gaps {3,4}.
    // bucket 0: gaps 1,2,2 — longer won 2 of 3; bucket 1: gap 3 — longer
    // won 1 of 1. Equal-length game dropped.
    // b0: w=2, n=3: x = 3·(2·1+3) = 15, isq = 3; den = 3·7 = 21
    //   win = 2/3 → 666667; lb = (4·3−2·3)/21 → 285714; ub → 857143
    // b1: w=1, n=1: x = 1·(0+1) = 1, isq = 1; den = 1·5 = 5
    //   win → 10^6; lb = (3·1−2)/5 → 200000; ub = 5/5 → 10^6
    val g = Seq((5L, 4L), (4L, 2L), (1L, 3L), (6L, 3L), (2L, 2L))
      .toDF("winner_len", "loser_len")
    val got = Preference.lengthControlledWinRate(g, "winner_len",
        "loser_len", gapWidth = 2L)
      .orderBy("gap_bucket")
      .select("gap_bucket", "gap_lo", "gap_hi", "n_games", "n_longer_won",
        "n_shorter_won", "longer_win_micro", "wilson_lb_micro",
        "wilson_ub_micro")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      (0L, 1L, 2L, 3L, 2L, 1L, 666667L, 285714L, 857143L),
      (1L, 3L, 4L, 1L, 1L, 0L, 1000000L, 200000L, 1000000L)))
  }

  // ── salt-split LSH candidate path (recall-preserving cap) ──────────────

  test("salt-split LSH: exact-copy hot bucket keeps ALL pairs the drop-cap loses") {
    // The same 20-verbatim-copies fixture the drop-cap test zeroes out
    // on: maxBucket = 5 splits the 20-member bucket into m = 4
    // sub-buckets; the full 4×4 block decomposition must recover every
    // one of the C(20,2) = 190 pairs — including the cross-sub-bucket
    // ones a diagonal-only salt split would miss (a diagonal-only split
    // would keep just 4·C(5,2) = 40 of them).
    val emb = (0L until 20L)
      .map(i => (i, Seq.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val split = Similarity.cosineNearDupPairsBucketedSaltSplit(
      emb, "vec_id", "embedding", 0.9, maxBucket = 5L, nTables = 2,
      planesPerTable = 3, dims = 8)
    assert(split.count() == 190L)
  }

  test("salt-split LSH: hash-equal to the uncapped pair set while the cap engages") {
    // mixed fixture: two antipodal near-dup families of 15 — with
    // maxBucket = 4 both families' buckets are over-cap (m = 4), so the
    // blocked path is exercised on EVERY candidate-producing bucket,
    // and the pair set must still equal the uncapped one exactly
    // (d1, d2, and the 6-dp cosine)
    val emb = (0L until 30L)
      .map(i => (i, Array.fill(8)(if (i % 2 == 0) 1.0f else -1.0f)
        .zipWithIndex.map { case (v, d) => v * (1.0f + d * 0.01f) }.toSeq))
      .toDF("vec_id", "embedding")
    val uncapped = Similarity.cosineNearDupPairsBucketed(
        emb, "vec_id", "embedding", 0.9, nTables = 2, planesPerTable = 3,
        dims = 8)
      .orderBy("d1", "d2").collect().toSeq
    val split = Similarity.cosineNearDupPairsBucketedSaltSplit(
        emb, "vec_id", "embedding", 0.9, maxBucket = 4L, nTables = 2,
        planesPerTable = 3, dims = 8)
      .orderBy("d1", "d2").collect().toSeq
    assert(uncapped.nonEmpty && split == uncapped)
    // while the drop-cap variant at the same cap loses them all (every
    // bucket is hot) — the recall gap q350 exists to close
    val dropped = Similarity.cosineNearDupPairsBucketedCapped(
      emb, "vec_id", "embedding", 0.9, maxBucket = 4L, nTables = 2,
      planesPerTable = 3, dims = 8)
    assert(dropped.count() == 0L)
  }

  test("salt-split LSH: inactive cap rides the plain path unchanged") {
    val emb = (0L until 30L)
      .map(i => (i, Array.fill(8)(if (i % 2 == 0) 1.0f else -1.0f)
        .zipWithIndex.map { case (v, d) => v * (1.0f + d * 0.01f) }.toSeq))
      .toDF("vec_id", "embedding")
    val uncapped = Similarity.cosineNearDupPairsBucketed(
        emb, "vec_id", "embedding", 0.9, nTables = 2, planesPerTable = 3,
        dims = 8)
      .orderBy("d1", "d2").collect().toSeq
    val split = Similarity.cosineNearDupPairsBucketedSaltSplit(
        emb, "vec_id", "embedding", 0.9, maxBucket = 1000L, nTables = 2,
        planesPerTable = 3, dims = 8)
      .orderBy("d1", "d2").collect().toSeq
    assert(split == uncapped)
  }
}
