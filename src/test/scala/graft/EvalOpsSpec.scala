package graft

import org.apache.spark.sql.functions._
import graft.functions.{JaroWinkler, StringFunctions}
import graft.operators.{Relevance, Standardize, TextDedup}
import org.apache.spark.unsafe.types.UTF8String

/** Hand-computed expectations for the round-7 evaluation operators
  * (NDCG@k, Cohen's kappa, Jaro–Winkler), independent of the gate. */
class EvalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  // ── JaroWinkler kernel ──────────────────────────────────────────────────

  test("jaro-winkler matches the textbook cases") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
  }

  test("jaro-winkler edge cases match DuckDB semantics") {
    assert(jw("", "") == 1.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("a", "a") == 1.0)
    // window = max(0, 2/2−1) = 0: only same-position matches → 0
    assert(jw("ab", "ba") == 0.0)
    assert(jw("abc", "abc") == 1.0)
  }

  test("jaro-winkler boost only applies above 0.7 jaro") {
    // "abcdef" vs "fedcba": low similarity, no prefix — plain jaro
    val plain = jw("abcdef", "fedcba")
    assert(plain <= 0.7)
  }

  test("jaro_winkler SQL function is registered and codegen-evaluable") {
    val got = Seq(("martha", "marhta"), ("ab", "ba"))
      .toDF("a", "b")
      .select(round(StringFunctions.jaroWinkler(col("a"), col("b")), 6))
      .as[Double].collect().toSeq
    assert(got == Seq(0.961111, 0.0))
  }

  // ── ndcgAtK ─────────────────────────────────────────────────────────────

  test("ndcgAtK: perfect ranking scores 1, inverted scores below 1") {
    // group g: rels 3,2,1 — score column equals rel → perfect ranking
    val perfect = Seq(("g", 30, 1L, 3L), ("g", 20, 2L, 2L), ("g", 10, 3L, 1L))
      .toDF("grp", "score", "id", "rel")
    val p = Relevance.ndcgAtK(perfect, "grp", "score", "id", "rel", k = 10)
      .select("ndcg").as[Double].head()
    assert(p == 1.0)
    // inverted ranking: ndcg < 1
    val inverted = Seq(("g", 10, 1L, 3L), ("g", 20, 2L, 2L), ("g", 30, 3L, 1L))
      .toDF("grp", "score", "id", "rel")
    val i = Relevance.ndcgAtK(inverted, "grp", "score", "id", "rel", k = 10)
      .select("ndcg").as[Double].head()
    assert(i < 1.0 && i > 0.0)
  }

  test("ndcgAtK: all-zero relevance yields NULL ndcg; k cuts the list") {
    val zero = Seq(("g", 2, 1L, 0L), ("g", 1, 2L, 0L))
      .toDF("grp", "score", "id", "rel")
    val r = Relevance.ndcgAtK(zero, "grp", "score", "id", "rel", k = 10)
      .select(col("ndcg").isNull).as[Boolean].head()
    assert(r)
    // k=1: only the top item counts — rel 1 at top = ideal → ndcg 1
    val top = Seq(("g", 9, 1L, 1L), ("g", 1, 2L, 3L))
      .toDF("grp", "score", "id", "rel")
    val dcg1 = Relevance.ndcgAtK(top, "grp", "score", "id", "rel", k = 1)
      .select("dcg").as[Double].head()
    // top item rel=1: (2^1−1)/ln(2) = 1.442695
    assert(dcg1 == 1.442695)
  }

  // ── cohenKappa ──────────────────────────────────────────────────────────

  test("cohenKappa: perfect agreement → 1, disjoint labels → pe=0 path") {
    val df = Seq(
      ("s1", "x", "x"), ("s1", "y", "y"), ("s1", "x", "x"), ("s1", "y", "y"),
      // s2: labelings share no class: po=0, pe=0 → kappa 0
      ("s2", "a", "b"), ("s2", "a", "b")
    ).toDF("strat", "r1", "r2")
    val got = Standardize.cohenKappa(df, "r1", "r2", "strat")
      .orderBy("strat")
      .select("strat", "n", "n_agree", "po", "pe", "kappa")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got.head == (("s1", 4L, 4L, 1.0, 0.5, 1.0)))
    assert(got(1) == (("s2", 2L, 0L, 0.0, 0.0, 0.0)))
  }

  test("cohenKappa: known 2x2 table") {
    // classic: a=20 agree yes, d=15 agree no, b=5, c=10 (n=50):
    // po=0.7, pe=(25·30 + 25·20)/2500 = 0.5 → kappa = 0.4
    val rows =
      Seq.fill(20)(("s", "y", "y")) ++ Seq.fill(5)(("s", "y", "n")) ++
      Seq.fill(10)(("s", "n", "y")) ++ Seq.fill(15)(("s", "n", "n"))
    val got = Standardize.cohenKappa(rows.toDF("strat", "r1", "r2"),
        "r1", "r2", "strat")
      .select("po", "pe", "kappa")
      .as[(Double, Double, Double)].head()
    assert(got == ((0.7, 0.5, 0.4)))
  }

  // ── jaroWinklerPairs ────────────────────────────────────────────────────

  test("jaroWinklerPairs finds neighbors above threshold, canonical order") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delts"),   // 1 char off → high sim
      (3L, "zzz completely different text here")
    ).toDF("doc_id", "text")
    val got = TextDedup.jaroWinklerPairs(docs, "doc_id", "text",
        window = 3, minSim = 0.9)
      .select("d1", "d2").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }
}
