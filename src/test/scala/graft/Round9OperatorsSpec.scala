package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decontamination, Packing, Relevance, Sampling, TextAnalysis, TextDedup, VectorAggs}

/** Round-9 curation-quality specs: the Gopher-style rule battery,
  * Jelinek–Mercer interpolated perplexity, and embedding-space
  * decontamination — hand-computed expectations, independent of the
  * DuckDB gate. */
class Round9OperatorsSpec extends SparkSpec {
  import spark.implicits._

  // ── gopherRuleAudit ─────────────────────────────────────────────────────

  test("gopherRuleAudit computes per-rule flags, n_failed, and keep") {
    // doc 1: 30 words, all rules pass except top_share ("the" 4/30 > 0.1)
    //        and ttr (distinct 9/30 < 0.5) and... compute by hand below
    val doc1 = (Seq.fill(4)("the") ++ Seq.fill(4)("and") ++
      Seq("table", "query", "filter", "window", "stream", "column",
        "partition", "shuffle", "whole", "stage", "codegen", "exchange",
        "sortmerge", "broadcast", "hashagg", "project", "generate",
        "expand", "sample", "union", "window2", "limit2")).mkString(" ")
    // doc 2: 3 words — fails word count; no stopwords → fails stopwords
    val doc2 = "alpha beta gamma"
    val docs = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRuleAudit(docs, "doc_id", "text",
      minWords = 10, maxWords = 5000, minMeanLen = 3.0, maxMeanLen = 10.0,
      minStop = 2, minTtr = 0.5, maxTopShare = 0.1)
      .orderBy("doc_id").collect()

    val r1 = out(0)
    assert(r1.getAs[Long]("n_words") == 30L)
    // words: 4×"the"(3) + 4×"and"(3) + the 22 listed
    assert(r1.getAs[Long]("n_stopwords") == 2L) // the, and
    // distinct words: the, and + 22 distinct = 24 → ttr = 0.8
    assert(r1.getAs[Double]("ttr") == 0.8)
    // top word "the"/"and" count 4 → share 4/30 ≈ 0.133333 > 0.1 → fail
    assert(r1.getAs[Double]("top_share") == 0.133333)
    assert(r1.getAs[Boolean]("r_word_count"))
    assert(r1.getAs[Boolean]("r_stopwords"))
    assert(r1.getAs[Boolean]("r_ttr"))
    assert(!r1.getAs[Boolean]("r_top_share"))
    assert(r1.getAs[Long]("n_failed") == 1L)
    assert(!r1.getAs[Boolean]("keep"))

    val r2 = out(1)
    assert(r2.getAs[Long]("n_words") == 3L)
    assert(!r2.getAs[Boolean]("r_word_count"))
    assert(!r2.getAs[Boolean]("r_stopwords"))
    assert(r2.getAs[Boolean]("r_ttr"))   // 3/3 = 1.0
    // top_share = 1/3 ≈ 0.333333 > 0.1 → fail; mean len 5+4+5=14/3≈4.67 ok
    assert(!r2.getAs[Boolean]("r_top_share"))
    assert(r2.getAs[Long]("n_failed") == 3L)
    assert(!r2.getAs[Boolean]("keep"))
  }

  test("gopherRuleAudit mean word length is over word lengths, not chars/words") {
    val docs = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRuleAudit(docs, "doc_id", "text",
      minWords = 1).collect()
    // 6 letter chars / 3 words = 2.0 (chars/words incl. spaces would be 8/3)
    assert(out(0).getAs[Double]("mean_word_len") == 2.0)
  }

  // ── interpolatedPerplexity ──────────────────────────────────────────────

  test("interpolatedPerplexity matches a hand-computed two-doc corpus") {
    // corpus: "a b a b" (doc 1), "a b" (doc 2) → N = 6, c(a)=3, c(b)=3
    // bigrams: (a,b)×3, (b,a)×1 → c(a,b)=3, c(b,a)=1
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = Relevance.interpolatedPerplexity(docs, "doc_id", "text",
      lambda = 0.75).orderBy("doc_id").collect()
    // p(b|a) = 0.75·(3/3) + 0.25·(3/6) = 0.875 → ln = −0.133531
    // p(a|b) = 0.75·(1/3) + 0.25·(3/6) = 0.375 → ln = −0.980829
    // doc1: slots b,a,b → sum = −0.133531·2 − 0.980829 = −1.247891
    val d1 = out(0)
    assert(d1.getAs[Long]("n_scored") == 3L)
    assert(d1.getAs[java.math.BigDecimal]("sum_logp")
      .compareTo(new java.math.BigDecimal("-1.247891")) == 0)
    assert(d1.getAs[Double]("ppl") ==
      BigDecimal(math.exp(1.247891 / 3.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // portable surface, doc1: slots (a,b),(b,a),(a,b) →
    // sum_cxy = 3+1+3, sum_cx = c(a)+c(b)+c(a) = 9, sum_cy = 9,
    // sum_pq6 = ⌊10⁶·0.875⌋·2 + ⌊10⁶·0.375⌋ = 2125000
    assert(d1.getAs[Long]("sum_cxy") == 7L)
    assert(d1.getAs[Long]("sum_cx") == 9L)
    assert(d1.getAs[Long]("sum_cy") == 9L)
    assert(d1.getAs[Long]("sum_pq6") == 2125000L)
    // doc2: one slot (a,b) → sum = −0.133531, ppl = e^0.133531
    val d2 = out(1)
    assert(d2.getAs[Long]("n_scored") == 1L)
    assert(d2.getAs[java.math.BigDecimal]("sum_logp")
      .compareTo(new java.math.BigDecimal("-0.133531")) == 0)
    assert(d2.getAs[Long]("sum_pq6") == 875000L)
  }

  test("interpolatedPerplexity drops docs shorter than two words") {
    val docs = Seq((1L, "solo"), (2L, "a a")).toDF("doc_id", "text")
    val out = Relevance.interpolatedPerplexity(docs, "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("interpolatedPerplexity rejects lambda outside (0,1)") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Relevance.interpolatedPerplexity(docs, "doc_id", "text", lambda = 1.0)
    }
  }

  // ── semanticContaminated ────────────────────────────────────────────────

  test("semanticContaminated flags cosine >= tau hits against the eval set") {
    val train = Seq(
      (1L, Array(1.0f, 0.0f)),   // cos 1.0 to eval 100, 0.0 to eval 101
      (2L, Array(1.0f, 1.0f)),   // cos ≈0.707107 to both
      (3L, Array(-1.0f, 0.0f))   // cos −1 / 0 → no hits at τ=0.9
    ).toDF("vec_id", "embedding")
    val ev = Seq(
      (100L, Array(1.0f, 0.0f)),
      (101L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Decontamination.semanticContaminated(train, ev,
        "vec_id", "embedding", tau = 0.9)
      .orderBy("vec_id").collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("vec_id") == 1L)
    assert(out(0).getAs[Long]("n_eval_hits") == 1L)
    assert(out(0).getAs[Double]("max_cosine") == 1.0)

    val loose = Decontamination.semanticContaminated(train, ev,
        "vec_id", "embedding", tau = 0.7)
      .orderBy("vec_id").collect()
    assert(loose.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L))
    assert(loose(1).getAs[Long]("n_eval_hits") == 2L)
    assert(loose(1).getAs[Double]("max_cosine") == 0.707107)
  }

  // ── pqEncode ────────────────────────────────────────────────────────────

  test("pqEncode assigns each subspace to its nearest codeword with tie-break") {
    // dims=4, m=2 (sub=2), k=2 codewords: ids 1 and 2
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f, 10.0f, 10.0f)),  // codeword 0
      (2L, Array(4.0f, 4.0f, 0.0f, 0.0f)),    // codeword 1
      // subspace 0 nearer cw1 (dist 2 vs 18), subspace 1 nearer cw0
      // (dist 2 vs 162)
      (7L, Array(3.0f, 3.0f, 9.0f, 9.0f)),
      // equidistant in subspace 0 from both codewords (dist 8) → code 0
      (9L, Array(2.0f, 2.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = VectorAggs.pqEncode(vecs, "vec_id", "embedding",
        dims = 4, m = 2, k = 2)
      .orderBy("vec_id", "subspace").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("subspace"),
        r.getAs[Int]("code"), r.getAs[Double]("l2_sq")))
    assert(out.toSeq == Seq(
      (1L, 0, 0, 0.0), (1L, 1, 0, 0.0),
      (2L, 0, 1, 0.0), (2L, 1, 1, 0.0),
      (7L, 0, 1, 2.0), (7L, 1, 0, 2.0),
      (9L, 0, 0, 8.0), (9L, 1, 1, 0.0)))
  }

  test("pqEncode rejects a subspace count that does not divide dims") {
    val vecs = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      VectorAggs.pqEncode(vecs, "vec_id", "embedding", dims = 3, m = 2, k = 1)
    }
  }

  // ── crossSourceOverlap ──────────────────────────────────────────────────

  test("crossSourceOverlap keys pairs by canonical source pair") {
    // near-identical docs across sources; w=1 shingles for tiny text
    val docs = Seq(
      (1L, "x y z", "crawlB"),
      (2L, "x y z", "crawlA"),   // dup of 1 across sources
      (3L, "x y z", "crawlA"),   // dup of 1 (B,A) and of 2 (A,A diagonal)
      (4L, "p q r", "crawlA")    // no dups
    ).toDF("doc_id", "text", "source")
    val out = TextDedup.crossSourceOverlap(docs, "doc_id", "text", "source",
        k = 16, r = 4, w = 1, threshold = 0.5)
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"),
        r.getAs[Long]("n_pairs"), r.getAs[Double]("max_jaccard")))
    // pairs: (1,2) B-A, (1,3) B-A, (2,3) A-A — all jaccard 1.0
    assert(out.toSeq == Seq(
      ("crawlA", "crawlA", 1L, 1.0),
      ("crawlA", "crawlB", 2L, 1.0)))
  }

  // ── keySkewAudit ────────────────────────────────────────────────────────

  test("keySkewAudit ranks hot keys with cumulative shares") {
    import graft.operators.Profiling
    // key counts: k1×5, k2×3, k3×2 → 10 rows, shares .5/.3/.2
    val rows = (Seq.fill(5)("k1") ++ Seq.fill(3)("k2") ++ Seq.fill(2)("k3"))
      .toDF("k")
    val out = Profiling.keySkewAudit(rows, "k", k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("k"),
        r.getAs[Long]("n"), r.getAs[Double]("share"),
        r.getAs[Double]("cum_share"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("n_rows")))
    assert(out.toSeq == Seq(
      (1, "k1", 5L, 0.5, 0.5, 3L, 10L),
      (2, "k2", 3L, 0.3, 0.8, 3L, 10L)))
  }

  // ── sourceDataCard ──────────────────────────────────────────────────────

  test("sourceDataCard reports counts, dup rate, and exact median") {
    import graft.operators.Profiling
    val docs = Seq(
      (1L, "A", "en", "a b c"),        // 3 tokens
      (2L, "A", "en", "a b c"),        // exact dup of 1
      (3L, "A", "fr", "x y z w q"),    // 5 tokens
      (4L, "B", "de", "solo")          // 1 token
    ).toDF("doc_id", "source", "lang", "text")
    val out = Profiling.sourceDataCard(docs, "source", "lang", "text")
      .orderBy("source").collect()
    val a = out(0)
    assert(a.getAs[Long]("n_docs") == 3L)
    assert(a.getAs[Long]("n_tokens") == 11L)
    assert(a.getAs[Long]("n_langs") == 2L)
    assert(a.getAs[Double]("en_frac") == 0.666667)
    assert(a.getAs[Long]("n_distinct_texts") == 2L)
    assert(a.getAs[Double]("exact_dup_frac") == 0.333333)
    // token counts {3,3,5} → exact interpolated median = 3.0
    assert(a.getAs[Double]("median_tokens") == 3.0)
    assert(a.getAs[Long]("max_tokens") == 5L)
    val b = out(1)
    assert(b.getAs[Long]("n_docs") == 1L)
    assert(b.getAs[Double]("exact_dup_frac") == 0.0)
    assert(b.getAs[Double]("median_tokens") == 1.0)
  }

  // ── boilerplateProfile ──────────────────────────────────────────────────

  test("boilerplateProfile flags corpus-heavy shingles per doc") {
    // shingle "a b c" appears in docs 1,2,3 (df 3 ≥ minDf 3) — boilerplate;
    // everything else is df 1
    val docs = Seq(
      (1L, "a b c x y"),     // shingles: [a b c][b c x][c x y] → 1/3 boiler
      (2L, "q a b c"),       // [q a b][a b c] → 1/2
      (3L, "a b c"),         // [a b c] → 1/1
      (4L, "z z z z")        // [z z z] (df 1) → 0/1... (distinct → one shingle)
    ).toDF("doc_id", "text")
    val out = TextDedup.boilerplateProfile(docs, "doc_id", "text",
        w = 3, minDf = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_boilerplate"), r.getAs[Double]("boiler_frac")))
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, 0.333333),
      (2L, 2L, 1L, 0.5),
      (3L, 1L, 1L, 1.0),
      (4L, 1L, 0L, 0.0)))
  }

  // ── perceptualHash ──────────────────────────────────────────────────────

  test("perceptualHash matches a JVM replay and is payload-deterministic") {
    import graft.operators.{Multimodal, TextDedup}
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = Multimodal.perceptualHash(docs, "doc_id", "payload")
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("phash")))
    // identical payloads → identical hashes
    assert(out(0)._2 == out(1)._2)
    // JVM replay of the stub decode + integer-mean aHash
    def replay(text: String): Long = {
      val px = (0 until 32).map { i =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest((text + s"_px${i / 16}").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(2 * (i % 16), 2 * (i % 16) + 2), 16)
      }
      val s = px.sum
      px.zipWithIndex.map { case (p, i) => if (p * 32 > s) 1L << i else 0L }.sum
    }
    assert(out(0)._2 == replay("hello world"))
    assert(out(2)._2 == replay("other"))
    // exact twins survive the banded Hamming join at distance 0
    val pairs = TextDedup.hammingPairs(
        Multimodal.perceptualHash(docs, "doc_id", "payload"),
        "doc_id", "phash", bits = 32, bands = 4, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((1L, 2L, 0)))
  }

  // ── kmvIntersectPairs ───────────────────────────────────────────────────

  test("kmvIntersectPairs estimates pairwise overlap with exact-stratum cuts") {
    import graft.operators.Sketches
    // X kept {1,2,3} (full, n=k → cut 3); Y kept {2,3,100} (cut 100);
    // Z holds ONE hash (n < k → exact, cut = 2^32)
    val sketch = Seq(("X", 1L), ("X", 2L), ("X", 3L),
        ("Y", 2L), ("Y", 3L), ("Y", 100L), ("Z", 5L))
      .toDF("source", "h")
    val out = Sketches.kmvIntersectPairs(sketch, "source", k = 3)
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"),
        r.getAs[Long]("n_common"), r.getAs[java.lang.Double]("est_intersection"),
        r.getAs[java.lang.Double]("est_jaccard")))
    // (X,Y): cut 3; common {2,3} → est = 2·2³²/3; X'=3, Y'={2,3} → J=2/3
    val estXY = BigDecimal(2.0 * 4294967296.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(
      ("X", "Y", 2L, Double.box(estXY), Double.box(0.666667)),
      // (X,Z): cut 3; Z's hash 5 > 3 → nb=0; no common → 0s
      ("X", "Z", 0L, Double.box(0.0), Double.box(0.0)),
      // (Y,Z): cut 100; Y'=3, Z'={5} → no common → 0s
      ("Y", "Z", 0L, Double.box(0.0), Double.box(0.0))))
  }

  // ── lengthGroupedBatches ────────────────────────────────────────────────

  test("lengthGroupedBatches cuts the sorted order into padded batches") {
    // lengths: ids 1..5 → 7, 3, 9, 3, 5; sorted desc with id tiebreak:
    // [3(9), 1(7), 5(5), 2(3), 4(3)] → batches of 2: [3,1], [5,2], [4]
    val docs = Seq((1L, 7L), (2L, 3L), (3L, 9L), (4L, 3L), (5L, 5L))
      .toDF("doc_id", "n_tok")
    val out = Packing.lengthGroupedBatches(docs, "doc_id", col("n_tok"),
        batchSize = 2)
      .orderBy("batch_id").collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("max_len"), r.getAs[Long]("total_tokens"),
        r.getAs[Long]("padding_tokens"), r.getAs[Long]("padding_ppm")))
    // ppm: 2/18 = 111111.1… → 111111; 2/10 = 200000 exactly
    assert(out.toSeq == Seq(
      (0L, 2L, 9L, 16L, 2L, 111111L),
      (1L, 2L, 5L, 8L, 2L, 200000L),
      (2L, 1L, 3L, 3L, 0L, 0L)))
  }

  // ── perplexityMixtureWeights ────────────────────────────────────────────

  test("perplexityMixtureWeights deflates token share by mean perplexity") {
    // hand-built per-doc scores (the interpolatedPerplexity output shape)
    val ppl = Seq(
      (1L, 10L, 9000000L, java.math.BigDecimal.valueOf(-5.0), 2.0),
      (2L, 10L, 5000000L, java.math.BigDecimal.valueOf(-5.0), 4.0),   // src A: 20 tok, mean ppl 3
      (3L, 30L, 12000000L, java.math.BigDecimal.valueOf(-5.0), 6.0)   // src B: 30 tok, mean ppl 6
    ).toDF("doc_id", "n_scored", "sum_pq6", "sum_logp", "ppl")
    val strata = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C"))
      .toDF("doc_id", "source")   // doc 4 unscored → C absent from output
    val out = Sampling.perplexityMixtureWeights(ppl, "doc_id",
        strata, "source")
      .orderBy("source").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Double]("mass"),
        r.getAs[Double]("weight"), r.getAs[Long]("mass_q"),
        r.getAs[Long]("weight_ppm")))
    // mass A = 20·2/6 = 6.666667, mass B = 30·1/6 = 5.0
    // total = 11.666667 → wA = 0.571428, wB = 0.428572 (6-dp HALF_UP)
    // portable: mass_q A = 14e6, B = 12e6, total 26e6 →
    // weight_ppm A = ⌊10⁶·14/26⌋ = 538461, B = ⌊10⁶·12/26⌋ = 461538
    assert(out.length == 2)
    assert(out(0) == ("A", 2L, 20L, 6.666667,
      BigDecimal(6.666667 / 11.666667)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      14000000L, 538461L))
    assert(out(1) == ("B", 1L, 30L, 5.0,
      BigDecimal(5.0 / 11.666667)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      12000000L, 461538L))
  }

  test("semanticContaminated eval side is broadcast (no corpus shuffle)") {
    val train = (1L to 100L).map(i => (i, Array(i.toFloat, 1.0f)))
      .toDF("vec_id", "embedding")
    val ev = Seq((1000L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val plan = Decontamination.semanticContaminated(train, ev,
      "vec_id", "embedding", tau = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"expected broadcast in:\n$plan")
  }
}
