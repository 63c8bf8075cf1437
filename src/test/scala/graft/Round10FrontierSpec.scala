package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Classify, Graph, Relevance, Similarity, TextAnalysis, TextDedup}

/** Round-10 frontier specs: Kneser–Ney scoring, weighted (multiset)
  * Jaccard, distinct-n diversity, and χ² keyness — hand-computed
  * expectations, independent of the DuckDB gate. */
class Round10FrontierSpec extends SparkSpec {
  import spark.implicits._

  // ── Kneser–Ney ──────────────────────────────────────────────────────────

  test("kneserNeyScore matches hand-computed D=3/4 interpolation") {
    // corpus bigrams: (a,b)×2 from doc 1, (b,a)×1, (b,c)×1 → B = 3 types;
    // ctx(a)=2 n1x(a)=1; ctx(b)=2 n1x(b)=2; n1y(a)=n1y(b)=n1y(c)=1
    val docs = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Relevance.kneserNeyScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_scored", "sum_cxy", "sum_ctx", "sum_n1x",
        "sum_n1y", "sum_pq6")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // doc 1 slots: (a,b) p=((8−3)·3+3·1·1)/24=3/4; (b,a) p=(3+6)/24=3/8;
    // (a,b) again → pq6 sum = 750000+375000+750000
    assert(out == Seq(
      (1L, 3L, 5L, 6L, 4L, 3L, 1875000L),
      (2L, 1L, 1L, 2L, 2L, 1L, 375000L)))
  }

  test("kneserNey distribution is proper: observed p(·|b) mass sums to 1") {
    // corpus {(b,a), (b,c)}: every continuation type follows b, so the
    // two observed slots must carry ALL of p(·|b) — p(a|b) =
    // ((4−3)·2 + 3·2·1)/(4·2·2) = 1/2 and p(c|b) = 1/2 exactly
    val docs = Seq((9L, "b a"), (10L, "b c")).toDF("doc_id", "text")
    val vals = Relevance.kneserNeyScore(docs, "doc_id", "text")
      .orderBy("doc_id").select("sum_pq6").as[Long].collect().toSeq
    assert(vals == Seq(500000L, 500000L))
  }

  // ── weighted Jaccard ────────────────────────────────────────────────────

  test("weightedJaccardPairs separates same-types different-multiplicity") {
    // A and B share the SAME 3 shingle types (so MinHash signatures are
    // identical and banding MUST pair them) but different multiplicities:
    // A: "a b c"×3, "b c a"×2, "c a b"×2 (7 slots); B: ×2, ×1, ×1 (4)
    val docs = Seq(
      (1L, "a b c a b c a b c"),
      (2L, "a b c a b c")).toDF("doc_id", "text")
    val out = TextDedup.weightedJaccardPairs(docs, "doc_id", "text",
        k = 16, r = 4, w = 3, minPpm = 0L)
      .select("d1", "d2", "w_inter", "w_union", "wj_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // w_inter = 2+1+1 = 4; w_union = 7+4−4 = 7; ⌊4e6/7⌋ = 571428
    assert(out == Seq((1L, 2L, 4L, 7L, 571428L)))
  }

  test("weightedJaccardPairs gives 1.0 for identical documents") {
    val docs = Seq(
      (1L, "p q r s t u v w"),
      (2L, "p q r s t u v w")).toDF("doc_id", "text")
    val out = TextDedup.weightedJaccardPairs(docs, "doc_id", "text")
      .select("wj_ppm").as[Long].collect().toSeq
    assert(out == Seq(1000000L))
  }

  // ── distinct-n diversity ────────────────────────────────────────────────

  test("distinctNgramDiversity counts types vs slots per stratum") {
    val docs = Seq(
      ("en", "a b a"), ("en", "a b"),
      ("fr", "x y z")).toDF("lang", "text")
    val out = TextAnalysis.distinctNgramDiversity(docs, "text", "lang",
        maxN = 3)
      .orderBy("lang")
      .select("lang", "distinct1", "total1", "distinct1_ppm",
        "distinct2", "total2", "distinct2_ppm",
        "distinct3", "total3", "distinct3_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // en 1-grams: {a,b} over 5 slots; 2-grams {a b, b a} over 3; 3-grams
    // {a b a} over 1. fr: all unique.
    assert(out == Seq(
      ("en", 2L, 5L, 400000L, 2L, 3L, 666666L, 1L, 1L, 1000000L),
      ("fr", 3L, 3L, 1000000L, 2L, 2L, 1000000L, 1L, 1L, 1000000L)))
  }

  test("distinctNgramDiversity drops strata with no maxN-gram (contract)") {
    val docs = Seq(("en", "a b c"), ("fr", "x y")).toDF("lang", "text")
    val langs = TextAnalysis.distinctNgramDiversity(docs, "text", "lang",
        maxN = 3).select("lang").as[String].collect().toSeq
    assert(langs == Seq("en"))
  }

  // ── χ² term keyness ─────────────────────────────────────────────────────

  test("termKeyness ranks over-represented terms by exact χ²") {
    val docs = Seq(
      ("en", "a a b"), ("fr", "b c")).toDF("lang", "text")
    val out = TextAnalysis.termKeyness(docs, "text", "lang", focus = "en",
        k = 10)
      .select("term", "tf_focus", "tf_rest", "chi2_milli")
      .as[(String, Long, Long, Long)].collect().toSeq
    // only 'a' is over-represented (cross = 2·2 − 0·1 = 4 > 0):
    // χ² = 5·4²/(2·3·3·2) = 80/36 → ⌊10³·χ²⌋ = 2222; 'b' and 'c' have
    // cross ≤ 0 and are filtered
    assert(out == Seq(("a", 2L, 0L, 2222L)))
  }

  // ── soft-dedup weights ──────────────────────────────────────────────────

  test("softDedupWeights halves duplicates, keeps singletons whole") {
    val txt = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, txt), (2L, txt),
      (3L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val out = TextDedup.softDedupWeights(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "cluster_size", "weight_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 500000L), (2L, 2L, 500000L),
      (3L, 1L, 1000000L)))
  }

  // ── label propagation ───────────────────────────────────────────────────

  test("labelPropagation: triangle collapses, 2-cycle oscillates (R=3)") {
    // hand-simulated synchronous rounds with min-label ties:
    // triangle {1,2,3} reaches label 1 by round 2 and stays; the pendant
    // pair {4,5} swaps labels every round (classic bipartite oscillation
    // — the documented reason the operator runs a FIXED round count)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L))
      .toDF("src", "dst")
    val out = Graph.labelPropagation(edges, "src", "dst", rounds = 3)
      .orderBy("node").select("node", "label")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 5L), (5L, 4L)))
  }

  test("labelPropagation plurality beats min label") {
    // star: node 10 has neighbors {20, 21, 22} all pre-labeled... after
    // round 1 each leaf holds 10, center holds 20 (min of distinct);
    // round 2: center sees {10,10,10} → plurality 10 even though its
    // own round-1 label was 20
    val edges = Seq((10L, 20L), (10L, 21L), (10L, 22L)).toDF("a", "b")
    val out = Graph.labelPropagation(edges, "a", "b", rounds = 2)
      .orderBy("node").select("node", "label")
      .as[(Long, Long)].collect().toSeq
    // round1: 10→20, 20→10, 21→10, 22→10; round2: 10 sees {10,10,10}→10,
    // leaves see {20} → 20
    assert(out == Seq((10L, 10L), (20L, 20L), (21L, 20L), (22L, 20L)))
  }

  // ── ICT pairs ───────────────────────────────────────────────────────────

  test("ictPairs excises the query span and keeps the remainder") {
    val words = (0 until 12).map(i => s"w$i")
    val docs = Seq((7L, words.mkString(" ")),
      (8L, "a b c d e f g h")).toDF("doc_id", "text") // 8 words: skipped
    val out = Chunking.ictPairs(docs, "doc_id", "text", queryWords = 8)
      .select("doc_id", "n_words", "q_start", "query_text", "context_text")
      .as[(Long, Long, Long, String, String)].collect().toSeq
    assert(out.map(_._1) == Seq(7L))
    val (_, n, qs, q, ctx) = out.head
    assert(n == 12L && qs >= 0 && qs <= 4)
    val s = qs.toInt
    assert(q == words.slice(s, s + 8).mkString(" "))
    assert(ctx == (words.take(s) ++ words.drop(s + 8)).mkString(" "))
    // deterministic: same input → same span
    val again = Chunking.ictPairs(docs, "doc_id", "text", queryWords = 8)
      .select("q_start").as[Long].collect().head
    assert(again == qs)
  }

  // ── Dirichlet query likelihood ──────────────────────────────────────────

  test("dirichletQueryLikelihood matches hand-computed smoothed mass") {
    // corpus: d1 = "q q x" (dl 3), d2 = "x y z" (dl 3); query {q}:
    // N = 6, cf(q) = 2; with μ = 4: p(q|d1) = (2·6 + 4·2)/(6·(3+4))
    // = 20/42 → ⌊10⁶·p⌋ = 476190. d2 has no query term → not a candidate
    val docs = Seq((1L, "q q x"), (2L, "x y z")).toDF("doc_id", "text")
    val out = Relevance.dirichletQueryLikelihood(docs, "doc_id", "text",
        Seq("q"), mu = 4L, k = 5)
      .select("doc_id", "dl", "n_hit_terms", "score_q6")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 1L, 476190L)))
  }

  test("dirichletQueryLikelihood: absent query terms add smoothing mass") {
    // query {q, y}: d1 contains q but not y — y still contributes
    // μ·cf(y)/(N·(dl+μ)) = 4·1/(6·7) = 2/21 → 95238
    val docs = Seq((1L, "q q x"), (2L, "x y z")).toDF("doc_id", "text")
    val out = Relevance.dirichletQueryLikelihood(docs, "doc_id", "text",
        Seq("q", "y"), mu = 4L, k = 5)
      .orderBy("doc_id")
      .select("doc_id", "n_hit_terms", "score_q6")
      .as[(Long, Long, Long)].collect().toSeq
    // d1 (1 hit term): 476190 (q) + 95238 (y absent) = 571428; d2
    // (1 hit term): q absent gives 4·2/42 = 190476, y present gives
    // (1·6+4·1)/42 = 238095 → 428571
    assert(out == Seq((1L, 1L, 571428L), (2L, 1L, 428571L)))
  }

  // ── blocking quality ────────────────────────────────────────────────────

  test("blockingQualityAudit: identical docs are found, PC/RR exact") {
    val t1 = "a b c d e f g h"
    val docs = Seq((1L, t1), (2L, t1),
      (3L, "p q r s t u v w"), (4L, "k l m n o p q r"))
      .toDF("doc_id", "text")
    val row = TextDedup.blockingQualityAudit(docs, "doc_id", "text")
      .select("n_docs", "n_true_pairs", "n_found", "total_pairs",
        "pc_ppm")
      .as[(Long, Long, Long, Long, Long)].head()
    // truth: only (1,2) with J = 1; identical sigs → must be a candidate
    assert(row._1 == 4L && row._2 == 1L && row._3 == 1L)
    assert(row._4 == 6L && row._5 == 1000000L)
  }

  // ── term dispersion ─────────────────────────────────────────────────────

  test("termDispersion: even terms score 0, concentrated terms high") {
    // strata sizes 4/4: 'u' appears twice in each (v = s exactly →
    // DP = 0); 'z' appears only in src A: DP = ½(|2·8−2·4| + 2·4)/16
    // = ½·16/16 → dp_milli = 500
    val docs = Seq(
      ("A", "u u z z"), ("B", "u u w w")).toDF("source", "text")
    val out = TextAnalysis.termDispersion(docs, "text", "source", k = 10)
      .select("term", "tf", "dp_milli")
      .as[(String, Long, Long)].collect().toSeq
    val m = out.map(t => t._1 -> t._3).toMap
    assert(m("u") == 0L)
    assert(m("z") == 500L && m("w") == 500L)
  }

  // ── k-truss ─────────────────────────────────────────────────────────────

  test("trussPeel: bridge edges fall, triangle edges survive") {
    // two triangles joined by a bridge: {1,2,3} — 4 — {5,6,7}? simpler:
    // triangle {1,2,3} + bridge (3,4): bridge has support 0 → removed
    // round 1; triangle edges keep support 1 (k=3 → need ≥ 1)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("s", "d")
    val out = Graph.trussPeel(edges, "s", "d", k = 3, rounds = 3)
      .orderBy("a", "b").select("a", "b", "support")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("trussPeel cascade: edge that loses its triangle falls next round") {
    // diamond minus one edge: triangle {1,2,3} plus edges (2,4),(3,4):
    // edge (2,4): common nbr of 2 and 4 is 3 → support 1; (3,4): common
    // nbr 2 → support 1; all survive round 1 with k=3… use k=4
    // (support ≥ 2): round 1 removes (2,4),(3,4) (support 1) AND the
    // triangle edges (support 1 each except (2,3) which has nbrs {1,4}
    // → support 2). Round 2: (2,3) alone → support 0 → gone. Empty.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("s", "d")
    val out = Graph.trussPeel(edges, "s", "d", k = 4, rounds = 3)
    assert(out.count() == 0L)
  }

  // ── rank-biased overlap ─────────────────────────────────────────────────

  test("rankBiasedOverlap matches hand-computed p=1/2 terms") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rnk")
    val b = Seq((2L, 1L), (1L, 2L), (4L, 3L)).toDF("id", "rnk")
    val out = Relevance.rankBiasedOverlap(a, b, "id", "rnk", depth = 3)
      .orderBy("d").select("d", "overlap", "term_q9", "rbo_q9")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // d1: {1}∩{2}=0; d2: {1,2}∩{2,1}=2 → ⌊2e9/8⌋; d3: still 2 → ⌊2e9/24⌋
    assert(out == Seq(
      (1L, 0L, 0L, 0L),
      (2L, 2L, 250000000L, 250000000L),
      (3L, 2L, 83333333L, 333333333L)))
  }

  test("rankBiasedOverlap of identical rankings approaches 1 − 2^-D") {
    val a = Seq((7L, 1L), (9L, 2L)).toDF("id", "rnk")
    val out = Relevance.rankBiasedOverlap(a, a, "id", "rnk", depth = 2)
      .orderBy("d").select("rbo_q9").as[Long].collect().toSeq
    // Σ 1/2^d = 1 − 2^-D → 750000000 at D = 2
    assert(out == Seq(500000000L, 750000000L))
  }

  // ── DBSCAN ──────────────────────────────────────────────────────────────

  test("dbscanClusters assigns core / border / noise deterministically") {
    val r2 = (math.sqrt(0.5)).toFloat
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0f)), (3L, Array(1f, 0f)),
      (4L, Array(r2, r2)),   // bridges the (1,0) block to (0,1)
      (5L, Array(0f, 1f)),   // one neighbor (4) → border
      (6L, Array(-1f, 0f)))  // no neighbors → noise
      .toDF("vec_id", "embedding")
    val out = Similarity.dbscanClusters(emb, "vec_id", "embedding",
        tau = 0.7, minPts = 3)
      .orderBy("vec_id").select("vec_id", "role", "cluster")
      .as[(Long, String, Option[Long])].collect().toSeq
    // degrees: 1,2,3 → {two twins, 4} = 3 → core; 4 → {1,2,3,5} = 4 →
    // core; 5 → {4} → border of 4's cluster; 6 isolated → noise
    assert(out == Seq(
      (1L, "core", Some(1L)), (2L, "core", Some(1L)),
      (3L, "core", Some(1L)), (4L, "core", Some(1L)),
      (5L, "border", Some(1L)), (6L, "noise", None)))
  }

  // ── FIM split plan ──────────────────────────────────────────────────────

  test("fimSplitPlan: cuts are ordered, lengths partition the doc") {
    val words = (0 until 15).map(i => s"t$i")
    val docs = Seq((3L, words.mkString(" "))).toDF("doc_id", "text")
    val out = Chunking.fimSplitPlan(docs, "doc_id", "text")
      .select("n_words", "cut1", "cut2", "mode", "prefix_len",
        "middle_len", "suffix_len", "parts_md5")
      .as[(Long, Long, Long, String, Long, Long, Long, String)].head()
    val (n, c1, c2, mode, pl, ml, sl, h) = out
    assert(n == 15L && c1 >= 0 && c1 <= c2 && c2 <= 15)
    assert(pl == c1 && ml == c2 - c1 && sl == n - c2)
    assert(mode == "psm" || mode == "spm")
    // fingerprint matches a hand-built reconstruction of the parts
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest((words.take(c1.toInt).mkString(" ") + "|" +
        words.slice(c1.toInt, c2.toInt).mkString(" ") + "|" +
        words.drop(c2.toInt).mkString(" ")).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(h == exp)
  }

  // ── burstiness ──────────────────────────────────────────────────────────

  test("termBurstiness: Poisson-ish spread ≈ sub-1, clumped term high") {
    // 'a' once in each of 4 docs: Σx=4, Σx²=4, n=4 → VMR =
    // (4·4 − 16)/(4·4) = 0 (uniform). 'b' 4 times in ONE doc: Σx=4,
    // Σx²=16 → (4·16 − 16)/16 = 3 → 3000 milli
    val docs = Seq(
      (1L, "a b b b b"), (2L, "a x"), (3L, "a y"), (4L, "a z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.termBurstiness(docs, "doc_id", "text", k = 10)
      .select("term", "tf", "n_docs_with", "vmr_milli")
      .as[(String, Long, Long, Long)].collect().toSeq
    val m = out.map(t => t._1 -> t._4).toMap
    assert(m("a") == 0L)
    assert(m("b") == 3000L)
  }

  // ── Burrows' Delta ──────────────────────────────────────────────────────

  test("burrowsDelta: identical registers score 0, opposite ones high") {
    // A and B share the same frequency profile; C inverts it
    val docs = Seq(
      ("A", "x x x y"), ("B", "x x x y"), ("C", "y y y x"))
      .toDF("source", "text")
    val out = TextAnalysis.burrowsDelta(docs, "text", "source", m = 2)
      .orderBy("src_a", "src_b")
      .select("src_a", "src_b", "delta_milli")
      .as[(String, String, Long)].collect().toSeq
    val m = out.map(t => (t._1, t._2) -> t._3).toMap
    assert(m(("A", "B")) == 0L)
    assert(m(("A", "C")) > 1000L && m(("A", "C")) == m(("B", "C")))
  }

  // ── content-defined chunking ────────────────────────────────────────────

  test("contentDefinedChunks: chunks partition the doc, boundaries local") {
    val words = (0 until 40).map(i => s"w$i")
    val docs = Seq((5L, words.mkString(" "))).toDF("doc_id", "text")
    val out = Chunking.contentDefinedChunks(docs, "doc_id", "text")
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_start", "n_words")
      .as[(Long, Long, Long)].collect().toSeq
    // partition invariants: first starts at 0, lengths tile n exactly
    assert(out.head._2 == 0L)
    assert(out.map(_._3).sum == 40L)
    assert(out.sliding(2).forall {
      case Seq(a, b) => b._2 == a._2 + a._3; case _ => true })
    assert(out.forall(_._3 >= 1L))
  }

  test("contentDefinedChunks: early insertion shifts at most one boundary") {
    // CDC's reason to exist: the suffix chunks of doc2 (one word
    // prepended) must carry the SAME fingerprints as doc1's suffix
    val words = (0 until 60).map(i => s"v$i")
    val docs = Seq(
      (1L, words.mkString(" ")),
      (2L, ("zzz " + words.mkString(" ")))).toDF("doc_id", "text")
    val by = Chunking.contentDefinedChunks(docs, "doc_id", "text")
      .select("doc_id", "chunk_md5").as[(Long, String)].collect()
    val h1 = by.filter(_._1 == 1L).map(_._2).toSet
    val h2 = by.filter(_._1 == 2L).map(_._2).toSet
    // all but the first (perturbed) chunk of doc1 reappear in doc2
    assert((h1 -- h2).size <= 1, s"shifted fingerprints: ${(h1 -- h2).size}")
  }

  // ── PRF expansion ───────────────────────────────────────────────────────

  test("prfExpandedRetrieve widens recall beyond the seed-term docs") {
    // seed hits docs mentioning 'aa'; 'bb' dominates the feedback docs
    // (tfb 6 · ln(6/4) ≈ 2.43 beats every hapax's 1 · ln(6/2) ≈ 1.10),
    // so expansion must pull in the bb-only doc 4
    val docs = Seq(
      (1L, "aa bb bb bb x"), (2L, "aa bb bb bb y"), (3L, "aa cc r s"),
      (4L, "bb bb t u"), (5L, "zz zz zz zz"))
      .toDF("doc_id", "text")
    val out = Relevance.prfExpandedRetrieve(docs, "doc_id", "text",
        seed = Seq("aa"), fbK = 3, expK = 1, k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(out.contains(4L), s"expansion missed the bb-only doc: $out")
    assert(!out.contains(5L))
  }

  // ── personalized PageRank ───────────────────────────────────────────────

  test("personalizedPageRank: teleport mass returns only to seeds") {
    // path 1—2—3, seed {1}, S = 10¹², d = 17/20 — hand-unrolled:
    // r1: (1.5e11, 8.5e11, 0); r2: (5.1125e11, 1.275e11, 3.6125e11)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val out = Graph.personalizedPageRank(edges, "s", "d", seeds, "id",
        iters = 2)
      .orderBy("node").select("node", "deg", "is_seed", "ppr_scaled")
      .as[(Long, Long, Boolean, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, true, 511250000000L),
      (2L, 2L, false, 127500000000L),
      (3L, 1L, false, 361250000000L)))
  }

  test("personalizedPageRank ignores seeds absent from the graph") {
    val edges = Seq((1L, 2L)).toDF("s", "d")
    val seeds = Seq(1L, 99L).map(Tuple1(_)).toDF("id")
    val out = Graph.personalizedPageRank(edges, "s", "d", seeds, "id",
        iters = 1)
      .orderBy("node").select("node", "ppr_scaled")
      .as[(Long, Long)].collect().toSeq
    // ns = 1 (only node 1 is in the graph): r1(1) = 3S/20,
    // r1(2) = 17·S/20
    assert(out == Seq((1L, 150000000000L), (2L, 850000000000L)))
  }

  // ── conformal threshold ─────────────────────────────────────────────────

  test("conformalLowerThreshold: exact order-statistic cut and coverage") {
    val rows = (1 to 10).map(i => (i.toLong, i * 10L, true)) ++
      Seq((11L, 5L, false), (12L, 55L, false), (13L, 1000L, false))
    val df = rows.toDF("id", "score", "is_cal")
    val out = Classify.conformalLowerThreshold(df, "id", "score",
        "is_cal", aNum = 2L, aDen = 10L)
      .select("n_cal", "k_rank", "q_hat", "n_test", "n_flagged",
        "flagged_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // k = ⌈2·11/10⌉ = 3 → q̂ = 30; only the score-5 test row is below
    assert(out == ((10L, 3L, 30L, 3L, 1L, 333333L)))
  }

  test("termKeyness is symmetric-safe: swapping focus flips the list") {
    val docs = Seq(
      ("en", "a a b"), ("fr", "b c c c")).toDF("lang", "text")
    val en = TextAnalysis.termKeyness(docs, "text", "lang", "en", 10)
      .select("term").as[String].collect().toSet
    val fr = TextAnalysis.termKeyness(docs, "text", "lang", "fr", 10)
      .select("term").as[String].collect().toSet
    assert(en.contains("a") && !en.contains("c"))
    assert(fr.contains("c") && !fr.contains("a"))
  }
}
