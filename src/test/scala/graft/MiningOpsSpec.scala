package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Profiling, Relevance, Similarity, TextAnalysis}

/** Round-10 third-wave specs: CCNet perplexity tiering and margin-based
  * pair mining — hand-computed expectations, independent of the DuckDB
  * gate. */
class MiningOpsSpec extends SparkSpec {
  import spark.implicits._

  // ── perplexityTiers ─────────────────────────────────────────────────────

  private def scored(rows: (Long, String, Long)*) =
    rows.map { case (id, g, score) => (id, g, score, 1L) }
      .toDF("doc_id", "lang", "sum_pq6", "n_scored")

  test("perplexityTiers splits distinct levels into equal-count tiers") {
    // six distinct scores → exactly two docs per tier, head = most
    // predictable (highest mean quantized probability)
    val df = scored((1L, "en", 60L), (2L, "en", 50L), (3L, "en", 40L),
      (4L, "en", 30L), (5L, "en", 20L), (6L, "en", 10L))
    val out = Relevance.perplexityTiers(df, "doc_id", "lang")
      .select("doc_id", "tier").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "head", 2L -> "head", 3L -> "middle",
      4L -> "middle", 5L -> "tail", 6L -> "tail"))
  }

  test("perplexityTiers keeps a tied score level in ONE tier") {
    // three docs share score 50; the boundary cannot split them, so the
    // head tier overflows to 4 docs and middle is empty
    val df = scored((1L, "en", 60L), (2L, "en", 50L), (3L, "en", 50L),
      (4L, "en", 50L), (5L, "en", 20L), (6L, "en", 10L))
    val out = Relevance.perplexityTiers(df, "doc_id", "lang")
      .select("doc_id", "tier").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "head", 2L -> "head", 3L -> "head",
      4L -> "head", 5L -> "tail", 6L -> "tail"))
  }

  test("perplexityTiers tiers each group independently") {
    val df = scored((1L, "en", 60L), (2L, "en", 40L), (3L, "en", 20L),
      (4L, "de", 9L), (5L, "de", 6L), (6L, "de", 3L))
    val out = Relevance.perplexityTiers(df, "doc_id", "lang")
      .select("doc_id", "tier").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "head", 2L -> "middle", 3L -> "tail",
      4L -> "head", 5L -> "middle", 6L -> "tail"))
    // mean quantization: score is sum_pq6 div n_scored, not sum_pq6
    val uneven = Seq((1L, "en", 100L, 10L), (2L, "en", 30L, 1L),
      (3L, "en", 5L, 1L))
      .toDF("doc_id", "lang", "sum_pq6", "n_scored")
    val tiers = Relevance.perplexityTiers(uneven, "doc_id", "lang")
      .select("doc_id", "tier").as[(Long, String)].collect().toMap
    // 100/10 = 10 ranks BELOW 30 → doc 2 is head, doc 1 middle
    assert(tiers == Map(2L -> "head", 1L -> "middle", 3L -> "tail"))
  }

  // ── marginMining ────────────────────────────────────────────────────────

  test("marginMining picks the best ratio-margin target per source") {
    val src = Seq(
      (0L, Array(1f, 0f)),
      (2L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val tgt = Seq(
      (1L, Array(1f, 0f)),
      (3L, Array(0.6f, 0.8f)),
      (5L, Array(1f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.marginMining(src, tgt, "vec_id", "embedding",
        k = 2, tau = 1.05)
      .select("src_id", "tgt_id", "margin")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // hand computation (k=2 neighborhoods):
    //   cos: (0,1)=1  (0,3)=.6  (0,5)=.707107  (2,1)=0  (2,3)=.8  (2,5)=.707107
    //   avg2(0→T)=.853554  avg2(2→T)=.753554
    //   avg2(1→S)=.5  avg2(3→S)=.7  avg2(5→S)=.707107
    //   m(0,1)=1/((.853554+.5)/2)≈1.47760  → best for 0, clears 1.05
    //   m(2,3)=.8/((.753554+.7)/2)≈1.10068 → best for 2, clears 1.05
    assert(out.map(r => (r._1, r._2)) == Seq((0L, 1L), (2L, 3L)))
    assert(math.abs(out(0)._3 - 1.47760) < 1e-4)
    assert(math.abs(out(1)._3 - 1.10068) < 1e-4)
  }

  test("marginMining suppresses hub targets; tau filters sources") {
    // t1 is a hub: near BOTH sources. For s0 the hub's inflated
    // denominator makes the non-hub t3 win on margin even though the
    // hub wins on raw cosine.
    val src = Seq(
      (0L, Array(1f, 0.1f)),
      (2L, Array(0.1f, 1f))).toDF("vec_id", "embedding")
    val tgt = Seq(
      (1L, Array(1f, 1f)),     // hub: cos ≈ .778 to both sources
      (3L, Array(1f, 0f)),     // matches s0 (cos ≈ .995)
      (5L, Array(-1f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.marginMining(src, tgt, "vec_id", "embedding",
        k = 1, tau = 1.2)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toSeq
    // k=1: avg1(0→T)=cos(0,3)=.995037; avg1(3→S)=.995037 ⇒ m(0,3)=1.0
    // avg1(1→S)=.778499 ⇒ m(0,1)=.778499/((.995037+.778499)/2)=.877963
    // best for s0 is t3 at margin 1.0 < tau → filtered out entirely;
    // s2: m(2,1)=.778499/((.778499+.778499)/2)=1.0 < tau → also out
    assert(out.isEmpty)
  }

  test("marginMining keeps symmetric mutual best pairs at tau = 1") {
    val src = Seq((0L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val tgt = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.marginMining(src, tgt, "vec_id", "embedding",
        k = 1, tau = 1.0)
      .select("src_id", "tgt_id", "cosine", "margin")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq((0L, 1L, 1.0, 1.0)))
  }

  // ── leaveOneOutImpact ───────────────────────────────────────────────────

  test("leaveOneOutImpact computes counterfactual means and vocab") {
    val docs = Seq(
      (1L, "x y z", "A"), (2L, "x q", "A"),
      (3L, "x y", "B")).toDF("doc_id", "text", "source")
    val out = Profiling.leaveOneOutImpact(docs, "doc_id", "text", "source")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long], Long, Long)]
      .collect().toSeq
    // corpus: 3 docs, 7 tokens, vocab {x,y,z,q}; A exclusively owns z,q
    assert(out == Seq(
      ("A", 2L, 5L, 714285L, 2333333L, Some(2000000L), Some(-333333L), 2L, 2L),
      ("B", 1L, 2L, 285714L, 2333333L, Some(2500000L), Some(166667L), 0L, 4L)))
  }

  test("leaveOneOutImpact: a sole source yields NULL counterfactuals") {
    val docs = Seq((1L, "x y", "A"), (2L, "z", "A"))
      .toDF("doc_id", "text", "source")
    val out = Profiling.leaveOneOutImpact(docs, "doc_id", "text", "source")
      .select("mean_wo_ppm", "delta_mean_ppm", "vocab_excl", "vocab_without")
      .as[(Option[Long], Option[Long], Long, Long)].collect().toSeq
    assert(out == Seq((None, None, 3L, 0L)))
  }

  // ── w1StrataDrift ───────────────────────────────────────────────────────

  test("w1StrataDrift equals the hand-computed earth-mover distance") {
    // A = {1, 1, 3}, B = {2}: W1(A, rest) = |2/3-0|·1 + |2/3-1|·1 = 1.0
    // and symmetrically W1(B, rest) = 1.0
    val df = Seq(("A", 1L), ("A", 1L), ("A", 3L), ("B", 2L))
      .toDF("source", "v")
    val out = Profiling.w1StrataDrift(df, "v", "source")
      .orderBy("source")
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(out == Seq(("A", 3L, 1L, Some(1000000L)),
      ("B", 1L, 3L, Some(1000000L))))
  }

  test("w1StrataDrift: identical distributions have zero distance") {
    val df = Seq(("A", 5L), ("A", 9L), ("B", 5L), ("B", 9L))
      .toDF("source", "v")
    val out = Profiling.w1StrataDrift(df, "v", "source")
      .select("w1_ppm").as[Option[Long]].collect().toSeq
    assert(out == Seq(Some(0L), Some(0L)))
    // sole stratum → NULL, not a division by zero
    val solo = Profiling.w1StrataDrift(
        Seq(("A", 1L), ("A", 2L)).toDF("source", "v"), "v", "source")
      .select("n_rest", "w1_ppm").as[(Long, Option[Long])].collect().toSeq
    assert(solo == Seq((0L, None)))
  }

  // ── missingMassAudit ────────────────────────────────────────────────────

  test("missingMassAudit counts hapax/dis-legomena and GT mass exactly") {
    val docs = Seq((1L, "a b a", "A"), (2L, "x", "B"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.missingMassAudit(docs, "text", "source")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // A: 3 tokens, types {a:2, b:1} → n1=1, n2=1, mass = ⌊10⁶/3⌋
    // B: a single hapax → the whole mass is unseen
    assert(out == Seq(("A", 3L, 2L, 1L, 1L, 333333L),
      ("B", 1L, 1L, 1L, 0L, 1000000L)))
  }

  // ── vocabGrowthCurve ────────────────────────────────────────────────────

  test("vocabGrowthCurve attributes words to their first tranche") {
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "c d"), (4L, "a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowthCurve(docs, "doc_id", "text",
        buckets = 2)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // tranche 1 = docs {1,2} introduces {a,b,c}; tranche 2 adds only d
    assert(out == Seq((1L, 2L, 4L, 3L, 3L, 4L),
      (2L, 2L, 3L, 1L, 4L, 7L)))
  }

  test("vocabGrowthCurve: a tranche with no new words reports zero") {
    val docs = Seq((1L, "a"), (2L, "a")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowthCurve(docs, "doc_id", "text",
        buckets = 2)
      .orderBy("bucket")
      .select("bucket", "new_words", "cum_vocab")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 1L), (2L, 0L, 1L)))
  }

  // ── jlDistortionPairs ───────────────────────────────────────────────────

  test("jlDistortionPairs is exact for 1-d inputs and pairs (even, +1)") {
    // dims = 1: every Rademacher row is ±1, so ‖Ry‖² = dOut·‖y‖² exactly
    // and the ratio is precisely 10⁶ for every pair
    val vecs = Seq((0L, Array(1f)), (1L, Array(4f)), (2L, Array(2f)),
      (3L, Array(2f)), (4L, Array(9f)) /* no partner 5 */)
      .toDF("vec_id", "embedding")
    val out = Similarity.jlDistortionPairs(vecs, "vec_id", "embedding",
        dims = 1, dOut = 8)
      .orderBy("a_id")
      .as[(Long, Long, Double, Double, Option[Long])].collect().toSeq
    // (0,1): d²=9, proj d²=72, ratio exact; (2,3): identical → NULL ratio;
    // 4 has no partner and odd ids never lead a pair
    assert(out == Seq((0L, 1L, 9.0, 72.0, Some(1000000L)),
      (2L, 3L, 0.0, 0.0, None)))
  }

  test("jlDistortionPairs ratio is scale-invariant and concentrates") {
    val base = (0L until 20L).map(i =>
      (i, Array.tabulate(16)(d => math.sin(i * 16 + d + 1).toFloat)))
    val scaled = base.map { case (i, v) => (i, v.map(_ * 4f)) }
    val r1 = Similarity.jlDistortionPairs(base.toDF("vec_id", "embedding"),
        "vec_id", "embedding", dims = 16, dOut = 8)
      .select("a_id", "ratio_ppm").as[(Long, Option[Long])]
      .collect().toMap
    val r2 = Similarity.jlDistortionPairs(scaled.toDF("vec_id", "embedding"),
        "vec_id", "embedding", dims = 16, dOut = 8)
      .select("a_id", "ratio_ppm").as[(Long, Option[Long])]
      .collect().toMap
    assert(r1 == r2 && r1.size == 10)
    // JL concentration: ratios live in a broad band around 10⁶, and the
    // projection never collapses a genuinely distinct pair to zero
    assert(r1.values.forall(r => r.exists(v => v > 50000L && v < 20000000L)))
  }

  // ── lexiconTag ──────────────────────────────────────────────────────────

  test("lexiconTag counts unigram and bigram phrase hits per tag") {
    val docs = Seq((1L, "table fast fast hash value"), (2L, "nothing here"))
      .toDF("doc_id", "text")
    val lex = Seq("storage" -> "table", "perf" -> "fast",
      "exec" -> "hash value")
    val out = TextAnalysis.lexiconTag(docs, "doc_id", "text", lex)
      .orderBy("doc_id", "tag")
      .as[(Long, String, Long)].collect().toSeq
    // doc 2 has no hits at all and emits nothing
    assert(out == Seq((1L, "exec", 1L), (1L, "perf", 2L),
      (1L, "storage", 1L)))
    // a phrase can carry several tags and counts once per tag
    val multi = TextAnalysis.lexiconTag(docs, "doc_id", "text",
        Seq("a" -> "table", "b" -> "table"))
      .orderBy("tag").as[(Long, String, Long)].collect().toSeq
    assert(multi == Seq((1L, "a", 1L), (1L, "b", 1L)))
    intercept[IllegalArgumentException] {
      TextAnalysis.lexiconTag(docs, "doc_id", "text",
        Seq("x" -> "one two three"))
    }
  }

  // ── spanMaskPlan ────────────────────────────────────────────────────────

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("spanMaskPlan: block arithmetic, tail handling, and ppm are exact") {
    // 10 words, 4-word blocks, 2-word spans: 2 full blocks + a 2-word
    // tail that still fits → 3 spans, 6 masked, 600000 ppm
    val docs = Seq((1L, Array.fill(10)("w").mkString(" ")),
      (2L, "a b c"),      // 3 words < one block, tail fits → 1 span
      (3L, "a")).toDF("doc_id", "text") // 1 word < span → no spans
    val out = Chunking.spanMaskPlan(docs, "doc_id", "text",
        blockWords = 4, spanWords = 2, salt = "t")
      .orderBy("doc_id")
      .select("doc_id", "n_words", "n_spans", "n_masked", "masked_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 10L, 3L, 6L, 600000L),
      (2L, 3L, 1L, 2L, 666666L), (3L, 1L, 0L, 0L, 0L)))
  }

  test("spanMaskPlan: a span that exactly fills its slot starts at zero") {
    // n = spanWords: the only valid start is 0, so the fingerprint is
    // fully determined regardless of the hash draw
    val docs = Seq((7L, "a b c d")).toDF("doc_id", "text")
    val out = Chunking.spanMaskPlan(docs, "doc_id", "text",
        blockWords = 10, spanWords = 4, salt = "t")
      .select("n_spans", "masked_ppm", "starts_md5")
      .as[(Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 1000000L, md5hex("0"))))
    // and the empty plan fingerprints the empty string
    val none = Chunking.spanMaskPlan(Seq((8L, "a")).toDF("doc_id", "text"),
        "doc_id", "text", blockWords = 10, spanWords = 4, salt = "t")
      .select("starts_md5").as[String].collect().toSeq
    assert(none == Seq(md5hex("")))
  }

  // ── collocationMerge ────────────────────────────────────────────────────

  test("collocationMerge merges local-maximum collocations, never overlaps") {
    // N = 9; s(new,york) = 3·9/9 = 3, s(york,new) = 1, s(york,is) = 3,
    // s(is,big) = 9, s(york,city) = 3. Doc 1 slots score [3,1,3,3,9]:
    // local maxima at 0 (beats 1), 2 (beats 1, ties-left vs 3), 4 —
    // adjacent slots can never both win by construction
    val docs = Seq((1L, "new york new york is big"), (2L, "new york city"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.collocationMerge(docs, "doc_id", "text",
        delta = 0L, tauNum = 1L, tauDen = 1L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 6L, 3L, 3L, md5hex("new_york new_york is_big")),
      (2L, 3L, 1L, 2L, md5hex("new_york city"))))
  }

  test("collocationMerge: the discount suppresses rare pairs; 1-word docs") {
    val docs = Seq((1L, "new york new york is big"), (2L, "new york city"),
      (3L, "solo")).toDF("doc_id", "text")
    // delta = 3 wipes every pair count (max c_xy = 3) → zero merges,
    // text passes through verbatim; a 1-word doc has no slots at all
    val out = TextAnalysis.collocationMerge(docs, "doc_id", "text",
        delta = 3L, tauNum = 1L, tauDen = 1L)
      .orderBy("doc_id")
      .select("doc_id", "n_merges", "merged_md5")
      .as[(Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 0L, md5hex("new york new york is big")),
      (2L, 0L, md5hex("new york city")), (3L, 0L, md5hex("solo"))))
  }

  // ── geometricMedian ─────────────────────────────────────────────────────

  test("geometricMedian resists the outlier that drags the mean") {
    import graft.operators.VectorAggs
    // three points at the origin + one outlier at (100, 0): the mean
    // lands at x = 25; two Weiszfeld rounds pull the estimate to
    // x ≈ 3.57 (exact sequence 25 → 10 → 100/90 ÷ 0.311111)
    val vecs = Seq(
      (1, Array(0f, 0f)), (1, Array(0f, 0f)), (1, Array(0f, 0f)),
      (1, Array(100f, 0f)),
      (2, Array(7f, 7f))).toDF("label", "embedding")
    val out = VectorAggs.geometricMedian(vecs, "label", "embedding",
        iters = 2)
      .orderBy("label", "dim")
      .as[(Int, Long, Long, Double)].collect().toSeq
    val byKey = out.map(r => (r._1, r._3) -> (r._2, r._4)).toMap
    assert(byKey((1, 0L))._1 == 4L)
    val x1 = byKey((1, 0L))._2
    assert(x1 > 3.5 && x1 < 3.65, s"expected ~3.57, got $x1")
    assert(byKey((1, 1L))._2 == 0.0)
    // a singleton label is its own median (the d=0 guard fires)
    assert(byKey((2, 0L))._2 == 7.0 && byKey((2, 1L))._2 == 7.0)
  }

  // ── q257 signals table ──────────────────────────────────────────────────

  test("signals table keeps every document; unscored tiers stay NULL") {
    val out = graft.queries.MiningQueries.q257SignalsTable(spark,
      "/root/testdata/sf0.001")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    // the composition is doc-preserving: inner joins on verified per-doc
    // operators must not drop or duplicate rows
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // every short doc (< 2 words) has no perplexity tier, and no scored
    // doc lost its tier through the left join
    val short = docs.filter(size(split(col("text"), " ")) < 2).count()
    assert(out.filter(col("ppl_tier").isNull).count() == short)
  }

  // ── encodingPlan ────────────────────────────────────────────────────────

  test("encodingPlan computes exact varint/dict/plain sizes and the pick") {
    import graft.operators.Layout
    val df = Seq((0L, "x"), (1L, "x"), (300L, "yy")).toDF("a", "b")
    val out = Layout.encodingPlan(df, Seq("a", "b"))
      .orderBy("col_name")
      .as[(String, String, Long, Long, Long, Option[Long], Long, String, Long)]
      .collect().toSeq
    // a: zigzag varints 1+1+2 = 4 B vs plain 24 vs dict 3·1 + 3·8 = 27
    // b: dict = 3 idx + (3 distinct chars + 2·4) = 14 B vs plain 16
    assert(out == Seq(
      ("a", "int", 3L, 3L, 24L, Some(4L), 27L, "varint", 833333L),
      ("b", "str", 3L, 2L, 16L, None, 14L, "dict", 125000L)))
    // zigzag keeps negatives small: -1 → 1 → one byte
    val neg = Layout.encodingPlan(Seq((-1L, "z")).toDF("a", "b"), Seq("a"))
      .select("varint_bytes").as[Option[Long]].head()
    assert(neg.contains(1L))
    intercept[IllegalArgumentException] {
      Layout.encodingPlan(Seq((1.5, "z")).toDF("a", "b"), Seq("a"))
    }
  }

  // ── pearsonByStrata ─────────────────────────────────────────────────────

  test("pearsonByStrata: exact ±1 on linear data, NULL on degenerate") {
    val df = Seq(
      ("up", 1L, 2.0), ("up", 2L, 4.0), ("up", 3L, 6.0),
      ("down", 1L, 3.0), ("down", 2L, 2.0), ("down", 3L, 1.0),
      ("flat", 1L, 5.0), ("flat", 2L, 5.0),
      ("solo", 9L, 9.0)).toDF("src", "x", "y")
    val out = Profiling.pearsonByStrata(df, "x", "y", "src")
      .as[(String, Long, Option[Double])].collect().toSeq
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("up") == ((3L, Some(1.0))))
    assert(out("down") == ((3L, Some(-1.0))))
    assert(out("flat") == ((2L, None)))   // zero variance in y
    assert(out("solo") == ((1L, None)))   // n < 2
  }
  // ── linearProbeTrain / linearProbeConfusion ─────────────────────────────

  test("linearProbeTrain recovers an exact linear relation") {
    import graft.operators.Classify
    // y = 2 + 3·x1 + x2 exactly → perfect fit, R² = 1
    val df = Seq((2L, 0L, 0L), (5L, 1L, 0L), (3L, 0L, 1L), (6L, 1L, 1L))
      .toDF("y", "x1", "x2")
    val out = Classify.linearProbeTrain(df, "y", "x1", "x2")
      .select("n", "beta0", "beta1", "beta2", "r2")
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].head()
    assert(out == ((4L, Some(2.0), Some(3.0), Some(1.0), Some(1.0))))
  }

  test("linearProbeTrain: singular design yields NULL coefficients") {
    import graft.operators.Classify
    val df = Seq((1L, 1L, 0L), (0L, 1L, 1L), (1L, 1L, 2L))
      .toDF("y", "x1", "x2") // x1 constant → X'X singular
    val out = Classify.linearProbeTrain(df, "y", "x1", "x2")
      .select("beta0", "beta1", "beta2", "r2")
      .as[(Option[Double], Option[Double], Option[Double], Option[Double])]
      .head()
    assert(out == ((None, None, None, None)))
  }

  test("linearProbeConfusion scores a separable probe perfectly") {
    import graft.operators.Classify
    // y = x1 exactly (x2 is noise the fit zeroes out) → clean confusion
    val df = Seq(("a", 1L, 1L, 0L), ("a", 1L, 1L, 1L),
      ("b", 0L, 0L, 0L), ("b", 0L, 0L, 1L))
      .toDF("src", "y", "x1", "x2")
    val out = Classify.linearProbeConfusion(df, "y", "x1", "x2", "src")
      .orderBy("src")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 2L, 2L, 0L, 0L, 0L),
      ("b", 2L, 0L, 0L, 0L, 2L)))
  }
  // ── maxSimTopK ──────────────────────────────────────────────────────────

  test("maxSimTopK rewards per-slice partial matches plain cosine misses") {
    val q = Seq((100L, Array(1f, 0f, 0f, 1f))).toDF("vec_id", "embedding")
    val d = Seq(
      (1L, Array(1f, 0f, 1f, 0f)),   // slice1 matches, slice2 doesn't → 1
      (2L, Array(0f, 1f, 1f, 0f)),   // both q slices match SWAPPED d
                                     // slices → 2 (plain cosine = 0!)
      (3L, Array(-1f, 0f, 0f, -1f))) // anti-aligned → 0
      .toDF("vec_id", "embedding")
    val out = Similarity.maxSimTopK(q, d, "vec_id", "embedding",
        dims = 4, m = 2, k = 2)
      .orderBy(col("maxsim").desc)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((100L, 2L, 2.0), (100L, 1L, 1.0)))
  }

  test("maxSimTopK with m = 1 degenerates to whole-vector cosine top-k") {
    val q = Seq((100L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val d = Seq((1L, Array(0.6f, 0.8f)), (2L, Array(1f, 0f)),
      (3L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.maxSimTopK(q, d, "vec_id", "embedding",
        dims = 2, m = 1, k = 3)
      .orderBy(col("maxsim").desc, col("d_id"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(_._2) == Seq(2L, 1L, 3L))
    assert(out.map(_._3) == Seq(1.0, 0.6, 0.0))
  }
  // ── lightweightCoreset ──────────────────────────────────────────────────

  test("lightweightCoreset: outliers carry high sensitivity, low weight") {
    import graft.operators.VectorAggs
    // mean = (2.5, 0); d² = 6.25 for the three origin points, 56.25 for
    // the outlier; Σd² = 75 → q(origin) = 1/8 + 6.25/150 = 0.1666…,
    // q(outlier) = 1/8 + 56.25/150 = 0.5 exactly
    val vecs = Seq((1L, Array(0f, 0f)), (2L, Array(0f, 0f)),
      (3L, Array(0f, 0f)), (4L, Array(10f, 0f)))
      .toDF("vec_id", "embedding")
    val out = VectorAggs.lightweightCoreset(vecs, "vec_id", "embedding",
        t = 4, salt = "t")
      .orderBy("vec_id")
      .as[(Long, Double, Long, Long)].collect().toSeq
    assert(out.size == 4)
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(4L) == ((4L, 56.25, 500000L, 500000L)))
    assert(byId(1L)._2 == 6.25 && byId(1L)._3 == 166666L)
    // unbiasing: weight = 1/(t·q) → origin points get 1.5M ppm
    assert(byId(1L)._4 == 1499999L || byId(1L)._4 == 1500000L)
  }

  test("lightweightCoreset: zero-spread corpus falls back to uniform") {
    import graft.operators.VectorAggs
    val vecs = (1L to 4L).map(i => (i, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val out = VectorAggs.lightweightCoreset(vecs, "vec_id", "embedding",
        t = 2, salt = "t")
      .as[(Long, Double, Long, Long)].collect().toSeq
    assert(out.size == 2)
    assert(out.forall(r => r._2 == 0.0 && r._3 == 250000L &&
      r._4 == 2000000L))
  }
  // ── hubnessAudit ────────────────────────────────────────────────────────

  test("hubnessAudit counts k-occurrence with hub and anti-hub flags") {
    // c = (1,0) is everyone's neighbor among the cluster; the outlier
    // p3 and the mirrored p2 appear in nobody's top-1 list
    val vecs = Seq(
      (0L, Array(1f, 0f)),      // c: chosen by 1 and 2 → N₁ = 2 → hub
      (1L, Array(0.9f, 0.1f)),  // chosen by 0 (tie-break) and 3 → hub
      (2L, Array(0.9f, -0.1f)), // N₁ = 0 → anti-hub
      (3L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.hubnessAudit(vecs, "vec_id", "embedding", k = 1)
      .orderBy("vec_id")
      .as[(Long, Long, Boolean, Boolean)].collect().toSeq
    assert(out == Seq((0L, 2L, true, false), (1L, 2L, true, false),
      (2L, 0L, false, true), (3L, 0L, false, true)))
    // conservation: in-degrees sum to n·k
    assert(out.map(_._2).sum == 4L)
  }
  // ── kCorePeel ───────────────────────────────────────────────────────────

  test("kCorePeel stamps onion layers and keeps the k-core unstamped") {
    import graft.operators.Graph
    // triangle {1,2,3} with a tail 3-4-5: under k = 2 the tail peels
    // outside-in (5 falls first, then 4), the triangle survives
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val out = Graph.kCorePeel(edges, "a", "b", k = 2)
      .orderBy("node")
      .as[(Long, Option[Long], Boolean)].collect().toSeq
    assert(out == Seq((1L, None, true), (2L, None, true), (3L, None, true),
      (4L, Some(2L), false), (5L, Some(1L), false)))
  }

  test("kCorePeel: an empty core peels everything; maxRounds guards") {
    import graft.operators.Graph
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Graph.kCorePeel(path, "a", "b", k = 2)
      .orderBy("node")
      .as[(Long, Option[Long], Boolean)].collect().toSeq
    // round 1 removes both endpoints, round 2 the stranded middle
    assert(out == Seq((1L, Some(1L), false), (2L, Some(2L), false),
      (3L, Some(1L), false)))
    val longPath = (1L to 6L).sliding(2).map(p => (p.head, p.last))
      .toSeq.toDF("a", "b")
    intercept[IllegalStateException] {
      Graph.kCorePeel(longPath, "a", "b", k = 2, maxRounds = 2).collect()
    }
  }
  // ── knnEdgesFrom ─────────────────────────────────────────────────────────

  test("knnEdgesFrom: per-source top-k over symmetrized candidates, ties by id") {
    import graft.operators.Similarity
    // candidates touching node 1: (1,2,.9) (1,3,.9) (1,4,.5); k = 2 keeps
    // the two .9 edges with the id tiebreak; node 4 still gets ITS best
    // (the mirrored 4->1); a node absent from candidates emits nothing
    val cand = Seq((1L, 2L, 0.9), (1L, 3L, 0.9), (1L, 4L, 0.5))
      .toDF("d1", "d2", "cosine")
    val got = graft.operators.Similarity.knnEdgesFrom(cand, k = 2)
      .orderBy("a", "b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  // ── contentDigest ───────────────────────────────────────────────────────

  test("contentDigest is layout-invariant, content- and count-sensitive") {
    val a = Seq((1L, "x", "A"), (2L, "y", "A"), (3L, "z", "B"))
      .toDF("doc_id", "text", "source")
    def dig(df: org.apache.spark.sql.DataFrame) =
      Profiling.contentDigest(df, "source", Seq("doc_id", "text"))
        .orderBy("source")
        .as[(String, Long, java.math.BigDecimal)].collect().toSeq
        .map(r => (r._1, r._2, r._3.toBigInteger))
    val base = dig(a)
    // same multiset, different partitioning and row order → same digest
    assert(dig(a.repartition(7).orderBy(col("doc_id").desc)) == base)
    // one changed cell → different digest for that stratum only
    val mut = dig(Seq((1L, "x!", "A"), (2L, "y", "A"), (3L, "z", "B"))
      .toDF("doc_id", "text", "source"))
    assert(mut.head != base.head && mut.last == base.last)
    // a duplicated row changes the digest (multiset, not set, semantics)
    val dup = dig(Seq((1L, "x", "A"), (1L, "x", "A"), (2L, "y", "A"),
      (3L, "z", "B")).toDF("doc_id", "text", "source"))
    assert(dup.head._2 == 3L && dup.head._3 != base.head._3)
  }
  // ── aprioriTrigrams ─────────────────────────────────────────────────────

  test("aprioriTrigrams counts candidates from frequent bigrams only") {
    import graft.operators.Itemsets
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c"),
      (4L, "b c b c")).toDF("doc_id", "text")
    // bigrams: ab = 3, bc = 5, cb = 1 → frequent {ab, bc} at support 3;
    // the only candidate is "a b c" (ab joined to bc), counted 3 times
    val out = Itemsets.aprioriTrigrams(docs, "text", minSupport = 3L)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("a b c", 3L, 3L, 5L)))
  }

  test("aprioriTrigrams drops candidates whose sequence never occurs") {
    import graft.operators.Itemsets
    // xy and yz are both frequent, but "x y z" is never adjacent — the
    // candidate survives pruning and dies at the exact count
    val docs = Seq((1L, "x y x y x y"), (2L, "y z y z y z"))
      .toDF("doc_id", "text")
    val out = Itemsets.aprioriTrigrams(docs, "text", minSupport = 3L)
      .collect()
    assert(out.isEmpty)
  }

  test("contentDigest is additive over disjoint unions (IVM property)") {
    val a = Seq((1L, "x", "A"), (2L, "y", "A")).toDF("doc_id", "text", "source")
    val b = Seq((3L, "z", "A")).toDF("doc_id", "text", "source")
    def d(df: org.apache.spark.sql.DataFrame): BigInt =
      BigInt(Profiling.contentDigest(df, "source", Seq("doc_id", "text"))
        .select("digest").as[java.math.BigDecimal].head().toBigInteger)
    // digest(A ∪ B) = digest(A) + digest(B) mod 2^64 — the monoid that
    // makes snapshot digests incrementally maintainable
    val mod = BigInt(2).pow(64)
    assert(d(a.union(b)) == (d(a) + d(b)) % mod)
  }
  // ── TextRank composition ────────────────────────────────────────────────

  test("TextRank ranks the co-occurrence hub above peripheral words") {
    import graft.operators.{Graph, Relevance}
    // 'a' co-occurs with every other word; b..e only with 'a' (and the
    // ±2 windows around it) — the hub must take the top rank
    val docs = Seq((1L, "a b a c a d a e a b a c"))
      .toDF("doc_id", "text")
    val edges = Relevance.skipgramPairs(docs, "text", window = 2, k = 50)
    val ranked = Graph.pageRank(edges, "x", "y", iters = 3)
      .orderBy(col("pr_scaled").desc, col("node").asc)
      .as[(String, Long, Long)].collect().toSeq
    assert(ranked.head._1 == "a")
    // and the rank mass is conserved-ish: every node got a positive rank
    assert(ranked.forall(_._3 > 0L))
  }
  // ── k-center coverage ───────────────────────────────────────────────────

  test("k-center coverage assigns points and reports exact radii") {
    import graft.functions.VectorFunctions
    import graft.operators.{LatestSnapshot, Similarity}
    val emb = Seq((1L, Array(0f, 0f)), (2L, Array(0.1f, 0f)),
      (3L, Array(10f, 0f)), (4L, Array(10.1f, 0f)))
      .toDF("vec_id", "embedding")
    val cvec = Similarity.farthestPoints(emb, "vec_id", "embedding", k = 2)
      .select(col("vec_id").as("center_id"))
      .join(emb.select(col("vec_id").as("center_id"),
        col("embedding").as("cv")), "center_id")
    val assigned = emb.crossJoin(broadcast(cvec))
      .withColumn("d2", round(VectorFunctions.l2Sq(col("embedding"),
        col("cv")), 6).cast("decimal(18,6)"))
    val out = LatestSnapshot.topK(assigned, Seq("vec_id"),
        col("d2").asc, Seq(col("center_id").asc), 1)
      .groupBy("center_id")
      .agg(count(lit(1)).as("n"), max(col("d2")).cast("double").as("r"))
      .orderBy("center_id")
      .as[(Long, Long, Double)].collect().toSeq
    // greedy picks the min-id point then the farthest (10.1, 0); each
    // center covers its own pair with radius 0.1² = 0.01
    assert(out == Seq((1L, 2L, 0.01), (4L, 2L, 0.01)))
  }
  // ── privacyAudit ────────────────────────────────────────────────────────

  test("privacyAudit flags homogeneous groups k-anonymity alone passes") {
    // group (en, 0): 5 rows but ONE sensitive value — k-anonymous yet
    // NOT l-diverse (the homogeneity attack); (de, 0): diverse but tiny
    val df = (1 to 5).map(i => ("en", 0L, "src0")) ++
      Seq(("de", 0L, "srcA"), ("de", 0L, "srcB"), ("de", 0L, "srcC"))
    val out = Profiling.privacyAudit(
        df.toDF("lang", "len_bucket", "source"),
        Seq("lang", "len_bucket"), "source", k = 5L, l = 3L)
      .orderBy("lang")
      .as[(String, Long, Long, Long, Boolean, Boolean)].collect().toSeq
    assert(out == Seq(("de", 0L, 3L, 3L, false, true),
      ("en", 0L, 5L, 1L, true, false)))
  }
  // ── partitionMixing / assortativity ─────────────────────────────────────

  test("partitionMixing counts internal/cross edges and degree sums") {
    import graft.operators.Graph
    // path 1-2-3-4 with labels A,A,B,B: one internal edge per label and
    // one shared cross edge
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "t")
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("node", "lab")
    val out = Graph.partitionMixing(edges, "s", "t", labels, "node", "lab")
      .orderBy("lab")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("A", 2L, 1L, 1L, 3L, 3L),
      ("B", 2L, 1L, 1L, 3L, 3L)))
  }

  test("degree assortativity of a star is exactly -1") {
    import graft.operators.Profiling
    val p = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val sym = p.union(p.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
    val joined = sym
      .join(deg.select(col("node").as("a"), col("d").as("deg_a")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("d").as("deg_b")), Seq("b"))
      .withColumn("g", lit("all"))
    val out = Profiling.pearsonByStrata(joined, "deg_a", "deg_b", "g")
      .as[(String, Long, Option[Double])].head()
    // hubs connect only to leaves and vice versa — perfect
    // disassortativity
    assert(out == (("all", 6L, Some(-1.0))))
  }
  // ── vocabOverlapMatrix ──────────────────────────────────────────────────

  test("vocabOverlapMatrix computes exact pairwise Jaccard in one pass") {
    // vocab: en = {a, b, c}, de = {b, c, d}, fr = {x}
    val docs = Seq(("en", "a b c a"), ("de", "b c d"), ("fr", "x"))
      .toDF("lang", "text")
    val out = TextAnalysis.vocabOverlapMatrix(docs, "text", "lang",
        Seq("de", "en", "fr"))
      .orderBy("group_a", "group_b")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // en∩de = {b, c} → 2/4 = 500000 ppm; fr is disjoint from both
    assert(out == Seq(
      ("de", "en", 3L, 3L, 2L, 500000L),
      ("de", "fr", 3L, 1L, 0L, 0L),
      ("en", "fr", 3L, 1L, 0L, 0L)))
  }
  // ── bBitMinwiseCalibration ──────────────────────────────────────────────

  test("b-bit minwise: identical docs agree on every bit, estimate 1.0") {
    import graft.operators.TextDedup
    val docs = Seq((1L, "p q r s t u"), (2L, "p q r s t u"),
      (3L, "completely different words here now yes"))
      .toDF("doc_id", "text")
    val out = TextDedup.bBitMinwiseCalibration(docs, "doc_id", "text",
        k = 16, w = 3, threshold = 0.5)
      .as[(Long, Long, Double, Long, Long)].collect().toSeq
    // only the identical pair verifies at J >= 0.5; identical shingle
    // sets give identical signatures, so every low bit agrees and the
    // corrected estimate is exactly 1.0
    assert(out == Seq((1L, 2L, 1.0, 16L, 1000000L)))
  }

  test("b-bit minwise clamps dissimilar estimates at zero") {
    import graft.operators.TextDedup
    // force a verified pair then check the clamp arithmetic directly:
    // greatest(2A - k, 0) can never go negative into the division
    val est = (a: Long) => math.max(2 * a - 16, 0) * 1000000L / 16
    assert(est(8) == 0L && est(7) == 0L && est(12) == 500000L)
  }
  // ── percolation sweep ───────────────────────────────────────────────────

  test("percolation sweep is threshold-monotone and internally consistent") {
    val rows = graft.queries.MiningQueries.q275Percolation(spark,
        "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(_._1)
    assert(rows.size == 3)
    // raising the threshold can only remove edges and nodes
    assert(rows.sliding(2).forall { case Seq(lo, hi) =>
      hi._2 <= lo._2 && hi._3 <= lo._3 })
    // components partition the nodes; the giant share is a valid ppm
    rows.foreach { r =>
      assert(r._5 <= r._2 && r._4 <= r._2)
      assert(r._6 == r._5 * 1000000L / r._2)
    }
  }
  // ── filter yield matrix ─────────────────────────────────────────────────

  test("filter yield matrix: conjunction is the tightest filter") {
    val rows = graft.queries.MiningQueries.q276FilterYield(spark,
        "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long)].collect().toSeq
      .map(r => r._1 -> r).toMap
    val all = rows("all")
    assert(all._4 == 1000000L)
    // every single filter keeps at most everything; the conjunction
    // keeps at most the minimum of its constituents
    val singles = Seq("gopher_keep", "pred_en", "not_ppl_tail",
      "low_repetition").map(rows)
    singles.foreach(f => assert(f._2 <= all._2 && f._3 <= all._3))
    val conj = rows("conjunction")
    assert(singles.forall(f => conj._2 <= f._2 && conj._3 <= f._3))
  }
}
