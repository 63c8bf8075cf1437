package graft

import org.apache.spark.sql.functions._

import graft.operators.{DomainDedup, Sampling, TextAnalysis, TextDedup, VectorAggs}

/** Round-10 operator specs: URL normalization / registrable-domain
  * extraction, first-wins URL dedup, and per-domain token caps —
  * hand-computed expectations, independent of the DuckDB gate. */
class Round10OperatorsSpec extends SparkSpec {
  import spark.implicits._

  // ── normalizeUrl / registrableDomain ────────────────────────────────────

  test("normalizeUrl canonicalizes scheme, www, port, userinfo, query, slash") {
    val cases = Seq(
      ("HTTPS://WWW.Example.COM/Path/", "example.com/path"),
      ("http://example.com:8080/a?q=1#frag", "example.com/a"),
      ("https://user:pw@news.site.org/x/", "news.site.org/x"),
      ("example.com/a///", "example.com/a"),
      ("https://www.example.com", "example.com"))
    val out = cases.map(_._1).toDF("url")
      .select(DomainDedup.normalizeUrl(col("url")).as("n"))
      .as[String].collect().toSeq
    assert(out == cases.map(_._2))
  }

  test("registrableDomain is public-suffix-aware") {
    val cases = Seq(
      ("https://news.bbc.co.uk/story", "bbc.co.uk"),
      ("https://a.b.example.com/", "example.com"),
      ("https://example.com", "example.com"),
      ("https://www.co.uk", "co.uk"),        // 2 labels after www strip
      ("https://localhost/x", "localhost"))  // single label → itself
    val out = cases.map(_._1).toDF("url")
      .select(DomainDedup.registrableDomain(col("url")).as("d"))
      .as[String].collect().toSeq
    assert(out == cases.map(_._2))
  }

  // ── dedupByUrl ──────────────────────────────────────────────────────────

  test("dedupByUrl keeps the smallest id per normalized URL with n_copies") {
    val docs = Seq(
      (3L, "https://www.site.com/a/", "x"),
      (1L, "http://site.com/a?utm=9", "y"),   // same page as doc 3
      (2L, "https://site.com/b", "z")
    ).toDF("doc_id", "url", "text")
    val out = DomainDedup.dedupByUrl(docs, "doc_id", "url")
      .orderBy("doc_id")
      .select("doc_id", "norm_url", "n_copies", "text")
      .as[(Long, String, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "site.com/a", 2L, "y"),
      (2L, "site.com/b", 1L, "z")))
  }

  // ── capPerDomain ────────────────────────────────────────────────────────

  test("capPerDomain admits in id order until the domain budget is hit") {
    // domain x.com: weights 50+50 admitted, 50 more would exceed 100;
    // domain y.com: budget override 30 → only the first (id 10, w 30)
    val docs = Seq(
      (1L, "https://x.com/1", 50L),
      (2L, "https://www.x.com/2", 50L),
      (3L, "https://x.com/3", 50L),
      (10L, "https://y.com/1", 30L),
      (11L, "https://y.com/2", 1L)
    ).toDF("doc_id", "url", "w")
    val out = DomainDedup.capPerDomain(docs, "doc_id", "url", col("w"),
        Map("y.com" -> 30L), defaultBudget = 100L)
      .select("doc_id", "domain", "n_tokens")
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "x.com", 50L), (2L, "x.com", 50L), (10L, "y.com", 30L)))
  }

  test("capPerDomain admission is by id order, not weight order") {
    // the big early doc exhausts the budget before the small late one
    val docs = Seq(
      (1L, "https://z.com/1", 90L),
      (2L, "https://z.com/2", 20L),
      (3L, "https://z.com/3", 5L)
    ).toDF("doc_id", "url", "w")
    val out = DomainDedup.capPerDomain(docs, "doc_id", "url", col("w"),
        Map.empty, defaultBudget = 100L)
      .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
    // 90 admitted; doc 2 hits 110 > 100 → dropped; doc 3 is ALSO
    // dropped (prefix-sum cut: its cum_before of 110 counts every
    // earlier row, admitted or not — underBudget's documented contract,
    // and the same rule the q211 oracle applies)
    assert(out == Seq(1L))
  }

  // ── linearQualityScore ──────────────────────────────────────────────────

  test("linearQualityScore computes exact milli-logits and the sign label") {
    val docs = Seq(
      (1L, "spark spark slow x"),   // 400·2 − 300 − 100 = 400 > 0
      (2L, "slow slow y"),          // −300·2 − 100 = −700
      (3L, "x y z")                 // no hits → bias only = −100
    ).toDF("doc_id", "text")
    val out = TextAnalysis.linearQualityScore(docs, "doc_id", "text",
        Map("spark" -> 400L, "slow" -> -300L), biasMilli = -100L)
      .orderBy("doc_id")
      .select("doc_id", "n_terms", "n_hits", "logit_milli", "label")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 3L, 400L, true),
      (2L, 3L, 2L, -700L, false),
      (3L, 3L, 0L, -100L, false)))
  }

  test("linearQualityScore prob is the sigmoid of the logit (API column)") {
    val docs = Seq((1L, "spark")).toDF("doc_id", "text")
    val p = TextAnalysis.linearQualityScore(docs, "doc_id", "text",
        Map("spark" -> 1000L), biasMilli = 0L)
      .select("prob").as[Double].head()
    assert(p == BigDecimal(1.0 / (1.0 + math.exp(-1.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ── noveltyProfile ──────────────────────────────────────────────────────

  test("noveltyProfile splits a doc's shingles into first-seen vs repeated") {
    // doc 1 introduces "a b c","b c d"; doc 2 repeats "a b c" and adds
    // "c x y"... build with w=2 for compact hand math
    val docs = Seq(
      (1L, "a b c"),       // shingles: "a b","b c" — both novel
      (2L, "a b z"),       // "a b" repeated, "b z" novel
      (3L, "b c a b")      // "b c","c a","a b" — all repeated except "c a"
    ).toDF("doc_id", "text")
    val out = TextDedup.noveltyProfile(docs, "doc_id", "text", w = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_novel", "novelty_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, 1000000L),
      (2L, 2L, 1L, 500000L),
      (3L, 3L, 1L, 333333L)))
  }

  test("noveltyProfile prefix sums equal distinct-shingle counts (yield curve)") {
    val docs = Seq((1L, "a b c d"), (2L, "b c d e"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val prof = TextDedup.noveltyProfile(docs, "doc_id", "text", w = 3)
    val novelTotal = prof.agg(sum("n_novel")).as[Long].head()
    val distinctTotal = TextDedup.shingles(docs, "doc_id", "text", 3)
      .select("s").distinct().count()
    assert(novelTotal == distinctTotal)
  }

  // ── epochAllocation ─────────────────────────────────────────────────────

  test("epochAllocation saturates small strata and water-fills the rest") {
    // A=10, B=20, C=100 tokens; R=2, budget=100. Sorted A,B,C:
    //   A: 100 − 0 ≥ 2·10·3 = 60 ✓  B: 100−20=80 ≥ 2·20·2=80 ✓ (boundary)
    //   C: 100−60=40 ≥ 2·100·1=200 ✗
    // → A,B saturated (20, 40 tokens), C gets the remaining 40.
    val tk = Seq(("A", 10L), ("B", 20L), ("C", 100L))
      .toDF("source", "n_tokens")
    val out = Sampling.epochAllocation(tk, "source", "n_tokens",
        budgetTokens = 100L, maxEpochs = 2)
      .orderBy("source")
      .select("source", "saturated", "alloc_tokens", "epochs_milli")
      .as[(String, Boolean, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("A", true, 20L, 2000L),
      ("B", true, 40L, 2000L),
      ("C", false, 40L, 400L)))
  }

  test("epochAllocation reports unused budget when every stratum saturates") {
    val tk = Seq(("A", 10L), ("B", 20L)).toDF("source", "n_tokens")
    val out = Sampling.epochAllocation(tk, "source", "n_tokens",
        budgetTokens = 1000L, maxEpochs = 2)
      .select("alloc_tokens", "epochs_milli")
      .as[(Long, Long)].collect().toSeq.sorted
    // 2 epochs each — 60 of the 1000 consumed, the rest reported unused
    assert(out == Seq((20L, 2000L), (40L, 2000L)))
  }

  test("epochAllocation under-budget splits equally with nobody saturated") {
    val tk = Seq(("A", 100L), ("B", 100L)).toDF("source", "n_tokens")
    val out = Sampling.epochAllocation(tk, "source", "n_tokens",
        budgetTokens = 100L, maxEpochs = 4)
      .select("source", "saturated", "alloc_tokens", "epochs_milli")
      .orderBy("source")
      .as[(String, Boolean, Long, Long)].collect().toSeq
    assert(out == Seq(("A", false, 50L, 500L), ("B", false, 50L, 500L)))
  }

  // ── pqAdcRecall ─────────────────────────────────────────────────────────

  test("pqAdcRecall is perfect when the codebook holds every vector") {
    // k = n: every vector PQ-encodes to itself with zero error, so ADC
    // distances equal exact distances and recall@k is 1000000 ppm
    val vecs = (0L until 8L).map { i =>
      (i, Array.tabulate(8)(d => (i * 8 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val out = VectorAggs.pqAdcRecall(vecs, "vec_id", "embedding",
        vecs.filter(col("vec_id") === 0), "vec_id",
        dims = 8, m = 2, k = 8, topK = 3)
      .select("qid", "n_exact", "n_overlap", "recall_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 3L, 3L, 1000000L)))
  }

  test("pqAdcRecall with a lossy codebook still finds the self-match") {
    // k = 2 codewords over 8 well-separated vectors: quantization is
    // lossy, but the query's own code cell keeps it in BOTH top-k sets,
    // so overlap >= 1 and the audit columns stay in range
    val vecs = (0L until 8L).map { i =>
      (i, Array.tabulate(8)(d => (i * 100 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val out = VectorAggs.pqAdcRecall(vecs, "vec_id", "embedding",
        vecs.filter(col("vec_id") === 7), "vec_id",
        dims = 8, m = 2, k = 2, topK = 4)
      .select("qid", "n_exact", "n_overlap", "recall_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.length == 1)
    val (qid, nExact, nOverlap, ppm) = out.head
    assert(qid == 7L && nExact == 4L)
    assert(nOverlap >= 1L && nOverlap <= 4L)
    assert(ppm == 1000000L * nOverlap / 4L)
  }

  // ── pqTrain / pqEncodeWith ──────────────────────────────────────────────

  test("pqEncodeWith on the seeded codebook reproduces pqEncode") {
    val vecs = (0L until 12L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 7 + d * 3) % 11).toFloat))
    }.toDF("vec_id", "embedding")
    val direct = VectorAggs.pqEncode(vecs, "vec_id", "embedding",
        dims = 8, m = 2, k = 4)
      .orderBy("vec_id", "subspace")
      .as[(Long, Int, Int, Double)].collect().toSeq
    val viaCb = VectorAggs.pqEncodeWith(vecs, "vec_id", "embedding",
        VectorAggs.pqCodebookSeeded(vecs, "vec_id", "embedding", 8, 2, 4),
        dims = 8, m = 2)
      .orderBy("vec_id", "subspace")
      .as[(Long, Int, Int, Double)].collect().toSeq
    assert(viaCb == direct)
  }

  test("one Lloyd round never increases total quantization error") {
    val vecs = (0L until 16L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 13 + d * 5) % 17).toFloat))
    }.toDF("vec_id", "embedding")
    def totalErr(cb: org.apache.spark.sql.DataFrame): Double =
      VectorAggs.pqEncodeWith(vecs, "vec_id", "embedding", cb,
          dims = 8, m = 2)
        .agg(sum("l2_sq")).as[Double].head()
    val seeded = totalErr(
      VectorAggs.pqCodebookSeeded(vecs, "vec_id", "embedding", 8, 2, 4))
    val trained = totalErr(
      VectorAggs.pqTrain(vecs, "vec_id", "embedding", 8, 2, 4, iters = 1))
    assert(trained <= seeded,
      s"Lloyd round worsened the codebook: $seeded -> $trained")
  }

  test("pqAdcRecallWith is perfect when every vector is its own codeword") {
    // k = n and one Lloyd round: each subvector sits alone in its cell,
    // so the mean is itself and ADC distances stay exact
    val vecs = (0L until 8L).map { i =>
      (i, Array.tabulate(8)(d => (i * 8 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val cb = VectorAggs.pqTrain(vecs, "vec_id", "embedding", 8, 2, 8,
      iters = 1)
    val out = VectorAggs.pqAdcRecallWith(vecs, "vec_id", "embedding",
        vecs.filter(col("vec_id") === 3), "vec_id", cb,
        dims = 8, m = 2, topK = 3)
      .select("qid", "n_exact", "n_overlap", "recall_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((3L, 3L, 3L, 1000000L)))
  }

  test("ivfPqRecall is exact when probing all cells with a lossless codebook") {
    // nprobe = coarseK (no cell pruned) + k = n (no quantization loss)
    // → the full stack degenerates to the exact scan: recall 10⁶ ppm
    val vecs = (0L until 8L).map { i =>
      (i, Array.tabulate(8)(d => (i * 8 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val out = VectorAggs.ivfPqRecall(vecs, "vec_id", "embedding",
        vecs.filter(col("vec_id") === 5), "vec_id",
        dims = 8, m = 2, k = 8,
        coarseK = 2, coarseIters = 1, nprobe = 2, topK = 3)
      .select("qid", "n_exact", "n_overlap", "recall_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((5L, 3L, 3L, 1000000L)))
  }

  test("ivfPqRecall cell pruning can only lose candidates, never invent them") {
    val vecs = (0L until 12L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 23).toFloat))
    }.toDF("vec_id", "embedding")
    val out = VectorAggs.ivfPqRecall(vecs, "vec_id", "embedding",
        vecs.filter(col("vec_id") % 5 === 0), "vec_id",
        dims = 8, m = 2, k = 4,
        coarseK = 3, coarseIters = 1, nprobe = 1, topK = 4)
      .select("n_exact", "n_overlap")
      .as[(Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { case (ne, no) =>
      assert(ne == 4L && no >= 0L && no <= 4L)
    }
  }

  test("linearQualityScore broadcasts the weight table (corpus never shuffles on term)") {
    val docs = (1L to 50L).map(i => (i, s"spark t$i")).toDF("doc_id", "text")
    val plan = TextAnalysis.linearQualityScore(docs, "doc_id", "text",
        Map("spark" -> 1L), biasMilli = 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"weight attach must broadcast:\n$plan")
  }

  // ── paragraphDedup ──────────────────────────────────────────────────────

  test("paragraphDedup keeps each paragraph at its first (doc, pos) occurrence and rebuilds docs") {
    val docs = Seq(
      (1L, "a b c d a b"),  // paras: "a b"@0, "c d"@1, "a b"@2 (within-doc dup)
      (2L, "c d e"),        // "c d"@0 lost to doc 1, "e"@1 kept
      (3L, "a b")           // fully duplicated → empty reconstruction
    ).toDF("doc_id", "text")
    val out = TextDedup.paragraphDedup(docs, "doc_id", "text", pWords = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 2L, "a b c d"),
      (2L, 2L, 1L, "e"),
      (3L, 1L, 0L, "")))
  }

  // ── prototypePrune ──────────────────────────────────────────────────────

  test("prototypePrune marks the most-prototypical fraction per cluster, id tiebreak") {
    val assigned = Seq(
      (1L, 0L, Array(1f, 0f)),   // cos to centroid (.75,.5): 0.832051
      (2L, 0L, Array(1f, 0f)),   // same — tie with id 1, loses on id
      (3L, 0L, Array(0f, 1f)),   // 0.554700 — least prototypical
      (4L, 0L, Array(1f, 1f)),   // 0.980581 — most prototypical
      (5L, 1L, Array(0f, 1f)),   // cluster 1 centroid (0,1.5): cos = 1 both
      (6L, 1L, Array(0f, 2f))
    ).toDF("vec_id", "cluster", "embedding")
    // prune 1/2: cluster 0 (n=4) prunes ranks 1-2 = ids 4, 1;
    // cluster 1 (n=2) prunes rank 1 = id 5 (cos tie, id asc)
    val out = VectorAggs.prototypePrune(assigned, "vec_id", "cluster",
        "embedding", pruneNum = 1, pruneDen = 2)
      .orderBy("vec_id")
      .select("vec_id", "n_cluster", "proto_rank", "pruned")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 2L, true), (2L, 4L, 3L, false), (3L, 4L, 4L, false),
      (4L, 4L, 1L, true), (5L, 2L, 1L, true), (6L, 2L, 2L, false)))
  }

  test("prototypePrune broadcasts the centroid table") {
    val assigned = (1L to 40L)
      .map(i => (i, i % 2, Array(i.toFloat, 1f)))
      .toDF("vec_id", "cluster", "embedding")
    val plan = VectorAggs.prototypePrune(assigned, "vec_id", "cluster",
        "embedding", 1, 4).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"centroid attach must broadcast:\n$plan")
  }

  // ── mmrRerank ───────────────────────────────────────────────────────────

  test("mmrRerank trades relevance for diversity at the MMR score, id tiebreak") {
    val qs = Seq((100L, Array(1f, 0f))).toDF("qid", "embedding")
    val corpus = Seq(
      (1L, Array(1f, 0f)),   // rel 1.0
      (2L, Array(1f, 0f)),   // exact duplicate of 1 — rel 1.0
      (3L, Array(0f, 1f))    // rel 0.0 but orthogonal to the picks
    ).toDF("vec_id", "embedding")
    // λ = 2/5: after picking 1, doc 2 scores 2·1 − 3·1 = −1,
    // doc 3 scores 2·0 − 3·0 = 0 → diversity wins despite zero relevance
    val out = graft.operators.Similarity.mmrRerank(qs, "qid", corpus,
        "vec_id", "embedding", k = 3, candN = 3,
        lambdaNum = 2, lambdaDen = 5)
      .orderBy("sel_idx")
      .select("sel_idx", "vec_id")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L), (1L, 3L), (2L, 2L)))
  }

  // ── compactionPlan ──────────────────────────────────────────────────────

  test("compactionPlan packs small files into ~target groups, leaves large alone") {
    val files = Seq(
      ("a", 100L), ("b", 200L), ("c", 150L), ("d", 900L), ("e", 450L)
    ).toDF("path", "bytes")
    // small (< 300): a(100) c(150) b(200) in (bytes, path) order;
    // exclusive cumsums 0/100/250 → all group 0; d(900), e(450) large
    val out = graft.operators.Layout
      .compactionPlan(files, "path", "bytes", targetBytes = 300L)
      .orderBy("path")
      .as[(String, Long, Boolean, Option[Long])].collect().toSeq
    assert(out == Seq(
      ("a", 100L, true, Some(0L)),
      ("b", 200L, true, Some(0L)),
      ("c", 150L, true, Some(0L)),
      ("d", 900L, false, None),
      ("e", 450L, false, None)))
  }

  test("compactionPlan groups never split a file and cover every small file once") {
    val files = (1L to 200L).map(i => (s"f$i", 50L + i % 97))
      .toDF("path", "bytes")
    val out = graft.operators.Layout
      .compactionPlan(files, "path", "bytes", targetBytes = 1000L)
    assert(out.count() == 200L)
    val sizes = out.filter(col("compacted"))
      .groupBy("group_id").agg(sum(col("bytes")).as("gb"))
      .as[(Long, Long)].collect().toMap
    // every group except possibly the last reaches target before closing;
    // no group exceeds target + max file size
    val maxGroup = sizes.keys.max
    sizes.foreach { case (g, b) =>
      assert(b <= 1000L + 146L, s"group $g overflowed: $b")
      if (g < maxGroup) assert(b >= 1000L - 146L, s"group $g underfull: $b")
    }
  }

  // ── incrementalComponents ───────────────────────────────────────────────

  test("incrementalComponents folds a delta into prior labels: merges, new nodes, untouched comps") {
    val prior = Seq((1L, 1L), (2L, 1L), (3L, 3L), (5L, 5L))
      .toDF("node", "component")
    val delta = Seq((2L, 3L), (6L, 7L), (8L, 5L)).toDF("d1", "d2")
    val out = graft.operators.Graph.incrementalComponents(
        prior, "node", "component", delta, "d1", "d2")
      .orderBy("node")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L),
      (6L, 6L), (7L, 6L), (8L, 5L)))
  }

  test("ivfPqResidualRecall is exact with full probing and a lossless codebook") {
    // 12 vectors, codebook k = 12 (every residual its own codeword),
    // nprobe = coarseK: ‖(q−c) − (x−c)‖ = ‖q−x‖, so recall must be 10⁶
    val vecs = (1L to 12L)
      .map(i => (i, Array.tabulate(8)(d => ((i * 7 + d * 3) % 11).toFloat)))
      .toDF("vec_id", "embedding")
    val out = VectorAggs.ivfPqResidualRecall(vecs, "vec_id", "embedding",
        vecs.filter(col("vec_id") % 5 === 0), "vec_id",
        dims = 8, m = 2, k = 12,
        coarseK = 3, coarseIters = 1, nprobe = 3, topK = 4)
      .select("recall_ppm").as[Long].collect().toSeq
    assert(out.nonEmpty && out.forall(_ == 1000000L))
  }

  test("canaryScan counts exact substring occurrences, absence rows included") {
    val docs = Seq(
      (1L, "the secret token xyzzy and again xyzzy here"),
      (2L, "no markers at all"),
      (3L, "xyzzy once")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.canaryScan(docs, "doc_id", "text",
        Seq("xyzzy", "absent-canary"))
      .orderBy("canary")
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(out == Seq(
      ("absent-canary", 0L, 0L, None),
      ("xyzzy", 2L, 3L, Some(1L))))
  }

  test("multi-probe LSH never loses recall vs single-probe (candidate superset)") {
    // exact-top-k membership is monotone in the candidate set, and the
    // probe set contains the base bucket — so per-query hit counts can
    // only go up. Run the full q224 audit on the small SF and check
    // row-wise.
    val out = graft.queries.RefineQueries
      .q224MultiProbeRecall(spark, "/root/testdata/sf0.001")
      .select("q_id", "hits_single", "hits_multi")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { case (q, s, m) =>
      assert(m >= s, s"query $q: multi-probe hits $m < single-probe $s")
    }
  }

  test("incrementalComponents matches a full recompute on the union graph") {
    val oldEdges = Seq((1L, 2L), (3L, 4L), (10L, 11L)).toDF("d1", "d2")
    val delta = Seq((2L, 3L), (4L, 20L), (21L, 22L)).toDF("d1", "d2")
    val prior = graft.operators.Graph.connectedComponents(oldEdges, "d1", "d2")
    val inc = graft.operators.Graph.incrementalComponents(
        prior, "node", "component", delta, "d1", "d2")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val full = graft.operators.Graph.connectedComponents(
        oldEdges.union(delta), "d1", "d2")
      .select(col("node"), col("component"))
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(inc == full)
  }
}
