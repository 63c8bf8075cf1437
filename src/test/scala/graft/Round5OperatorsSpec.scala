package graft

import org.apache.spark.sql.functions._
import graft.operators.{Decontamination, Layout, Packing, Relevance, Sampling, Similarity, TextDedup, VectorAggs}

/** Targeted specs for the round-5 corpus-assembly operators
  * (decontamination, batch retrieval, sequence packing, uniform mixing,
  * matryoshka stats) — hand-computed expectations on crafted inputs,
  * independent of the DuckDB gate. */
class Round5OperatorsSpec extends SparkSpec {
  import spark.implicits._

  // ── decontamination ─────────────────────────────────────────────────────

  test("contaminated flags exactly the docs sharing a w-gram with eval") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),   // shares "the quick brown fox"
      (2L, "totally unrelated words here"),
      (3L, "quick brown fox jumps high")   // shares "quick brown fox jumps"
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "the quick brown fox sleeps"),
      (101L, "a quick brown fox jumps")
    ).toDF("doc_id", "text")
    val got = Decontamination.contaminated(train, eval_, "doc_id", "text",
        w = 4)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    // doc 1: "the quick brown fox" (hits 100) and "quick brown fox jumps"
    // (hits 101) → 2 shared 4-grams, 2 eval docs
    // doc 3: "quick brown fox jumps" (hits 101) → 1 and 1
    assert(got.toSeq == Seq((1L, 2L, 2L), (3L, 1L, 1L)))
  }

  test("short docs (< w words) never collide") {
    val train = Seq((1L, "quick brown fox")).toDF("doc_id", "text")
    val eval_ = Seq((2L, "quick brown fox")).toDF("doc_id", "text")
    assert(Decontamination.contaminated(train, eval_, "doc_id", "text",
      w = 4).count() == 0)
  }

  // ── batch BM25 retrieval ────────────────────────────────────────────────

  test("bm25RetrieveAll matches bm25TopK per query") {
    val docs = Seq(
      (1L, "spark join spark"), (2L, "join merge join"),
      (3L, "scan filter scan"), (4L, "spark scan merge filter")
    ).toDF("doc_id", "text")
    val queries = Seq((1, "spark"), (1, "join"), (2, "scan"))
      .toDF("query_id", "term")
    val all = Relevance.bm25RetrieveAll(docs, "doc_id", "text",
        queries, "query_id", k = 10, k1 = 1.5, b = 0.75)
      .orderBy("query_id", "doc_id")
      .select("query_id", "doc_id", "bm25").as[(Int, Long, Double)].collect()
    val single1 = Relevance.bm25TopK(docs, "doc_id", "text",
        Seq("spark", "join"), k = 10, k1 = 1.5, b = 0.75)
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    val single2 = Relevance.bm25TopK(docs, "doc_id", "text",
        Seq("scan"), k = 10, k1 = 1.5, b = 0.75)
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    all.foreach { case (q, d, s) =>
      val expect = if (q == 1) single1(d) else single2(d)
      assert(s == expect, s"q$q d$d: $s != $expect")
    }
    assert(all.count(_._1 == 1) == single1.size)
    assert(all.count(_._1 == 2) == single2.size)
  }

  test("bm25RetrieveAll keeps only top-k per query with doc tiebreak") {
    val docs = (1L to 6L).map(i => (i, "term")).toDF("doc_id", "text")
    val queries = Seq((1, "term")).toDF("query_id", "term")
    // all six docs tie exactly → k=3 keeps the smallest doc_ids
    val got = Relevance.bm25RetrieveAll(docs, "doc_id", "text",
        queries, "query_id", k = 3)
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  // ── sequence packing ────────────────────────────────────────────────────

  test("packPlan computes exact global token offsets and chunk spans") {
    val docs = Seq(
      (1L, "a b c"),          // 3 toks: 0..2   chunk 0
      (2L, "d e f g"),        // 4 toks: 3..6   chunks 0-1 (boundary at 4)
      (3L, "h"),              // 1 tok : 7      chunk 1
      (4L, "i j k l m n")     // 6 toks: 8..13  chunks 2-3 (boundary at 12)
    ).toDF("doc_id", "text")
    val got = Packing.packPlan(docs, "doc_id", "text", ctxLen = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (1L, 3L, 0L, 0L, 0L, 1L),
      (2L, 4L, 3L, 0L, 1L, 2L),
      (3L, 1L, 7L, 1L, 1L, 1L),
      (4L, 6L, 8L, 2L, 3L, 2L)))
  }

  test("packPlan offsets are independent of input partitioning") {
    val docs = (1L to 100L).map(i => (i, Seq.fill((i % 7 + 1).toInt)("w")
      .mkString(" "))).toDF("doc_id", "text")
    val a = Packing.packPlan(docs, "doc_id", "text", 16)
      .orderBy("doc_id").collect()
    val b = Packing.packPlan(docs.repartition(13), "doc_id", "text", 16)
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    // last doc's end must equal the total token count
    val total = (1L to 100L).map(i => i % 7 + 1).sum
    val last = a.last
    assert(last.getAs[Long]("start_tok") + last.getAs[Long]("n_tokens")
      == total)
  }

  // ── uniform mixing ──────────────────────────────────────────────────────

  test("uniformMix keeps small strata whole and downsamples large ones") {
    // stratum A: 300 rows, B: 50, C: 50 → N=400, k=3, fair share 133.3
    val df = ((1L to 300L).map(i => (i, "A")) ++
      (301L to 350L).map(i => (i, "B")) ++
      (351L to 400L).map(i => (i, "C"))).toDF("id", "s")
    val kept = Sampling.uniformMix(df, "id", "s", "t")
      .groupBy("s").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // keep rule for B/C: bucket·3·50 < 256·400 ⟺ bucket < 682 — always
    assert(kept("B") == 50 && kept("C") == 50)
    // A: bucket·3·300 < 256·400 ⟺ bucket < 113.8 → rate 114/256 ≈ 0.445
    assert(kept("A") < 300 * 6 / 10 && kept("A") > 300 * 3 / 10,
      s"A kept ${kept("A")}, expected ≈ 300·0.445")
    // deterministic: same salt → same kept set
    val again = Sampling.uniformMix(df.repartition(7), "id", "s", "t")
      .agg(count(lit(1))).as[Long].head()
    assert(again == kept.values.sum)
  }

  // ── temperature mixing ──────────────────────────────────────────────────

  test("temperatureMix keeps the smallest stratum whole, √-samples the rest") {
    // A: 400 rows, B: 100 → n_min=100. α=½: B rate 1 (bucket² < 65536
    // always), A rate: bucket² · 400 < 65536 · 100 ⟺ bucket < 128 → ~1/2,
    // target √(n_min·n_A) = 200.
    val df = ((1L to 400L).map(i => (i, "A")) ++
      (401L to 500L).map(i => (i, "B"))).toDF("id", "s")
    val kept = Sampling.temperatureMix(df, "id", "s", "t2")
      .groupBy("s").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(kept("B") == 100)
    assert(kept("A") > 140 && kept("A") < 260,
      s"A kept ${kept("A")}, expected ≈ 200")
    // p=0 (α=1) keeps everything
    assert(Sampling.temperatureMix(df, "id", "s", "t2", p = 0).count() == 500)
    // deterministic under repartitioning
    val again = Sampling.temperatureMix(df.repartition(7), "id", "s", "t2")
      .agg(count(lit(1))).as[Long].head()
    assert(again == kept.values.sum)
  }

  // ── unigram LM quality ──────────────────────────────────────────────────

  test("unigramLogProb scores docs by corpus unigram log-probability") {
    // corpus: a×3, b×2, N=5 → logp(a)=round(ln(3/5),6)=-0.510826,
    // logp(b)=round(ln(2/5),6)=-0.916291
    val docs = Seq((1L, "a a a b"), (2L, "b")).toDF("doc_id", "text")
    val got = Relevance.unigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    // d1: (3·(-0.510826) + (-0.916291)) / 4 = -0.61219225 → -612192 µ
    assert(got(0) == ((1L, 4L, -612192L)))
    assert(got(1) == ((2L, 1L, -916291L)))
  }

  test("unigramLogProb is partitioning-independent (exact decimal sums)") {
    val docs = (1L to 200L).map(i =>
      (i, Seq.tabulate((i % 9 + 1).toInt)(j => s"w${(i + j) % 23}")
        .mkString(" "))).toDF("doc_id", "text")
    val a = Relevance.unigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val b = Relevance.unigramLogProb(docs.repartition(17), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  // ── per-row banding ─────────────────────────────────────────────────────

  test("bandsPerRow is bit-identical to the explode-groupBy band pipeline") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val wide = TextDedup.lshBandsFromWide(
      TextDedup.minHashSignaturesWide(
        TextDedup.shingles(docs, "doc_id", "text", w = 3), "doc_id", 16),
      "doc_id", 16, 4)
    val perRow = TextDedup.bandsPerRow(docs, "doc_id", "text",
      k = 16, r = 4, w = 3)
    assert(perRow.collect().toSet == wide.collect().toSet)
    // short docs emit no bands in either form
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(TextDedup.bandsPerRow(short, "doc_id", "text").count() == 0)
  }

  // ── quantile normalization ──────────────────────────────────────────────

  test("quantileNormalize: percent-rank within stratum, ties share rank") {
    import graft.operators.TextAnalysis
    val df = Seq(
      ("A", 0.1), ("A", 0.2), ("A", 0.2), ("A", 0.4), // pr: 0, ⅓, ⅓, 1
      ("B", 9.9)                                      // singleton → 0
    ).zipWithIndex.map { case ((s, v), i) => (i.toLong, s, v) }
      .toDF("id", "src", "score")
    val got = TextAnalysis.quantileNormalize(df, "src", "score")
      .orderBy("id").select("q_norm_ppm").as[Long].collect()
    assert(got.toSeq == Seq(0L, 333333L, 333333L, 1000000L, 0L))
  }

  // ── ANN recall ──────────────────────────────────────────────────────────

  test("annRecallAtK is 1.0 when buckets contain the true neighbors") {
    // all vectors near-parallel → same LSH bucket → ANN = exact
    val df = (0L until 12L).map(i =>
      (i, Seq(1.0f, 0.001f * i, 0.5f, 0.25f))).toDF("vec_id", "embedding")
    val got = Similarity.annRecallAtK(df, "vec_id", "embedding",
        col("vec_id") < 2, k = 3, nPlanes = 4, dims = 4)
      .orderBy("q_id")
      .select("q_id", "n_exact", "n_hits", "recall")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == 2)
    got.foreach { case (q, ne, nh, r) =>
      assert(ne == 3 && nh == 3 && r == 1.0, s"q$q: $ne/$nh/$r")
    }
  }

  // ── bigram PMI (BPE merge mining) ───────────────────────────────────────

  test("bigramPmiTopK counts all adjacent occurrences and scores PMI") {
    // "a b a b": pairs (a,b)×2, (b,a)×1; unigrams a:2 b:2, N=4, Npair=3
    // PMI(a,b) = ln(2·4·4 / (3·2·2)) = ln(8/3) → 0.980829
    // PMI(b,a) = ln(1·4·4 / (3·2·2)) = ln(4/3) → 0.287682
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val got = Relevance.bigramPmiTopK(docs, "text", k = 5)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq(
      ("a", "b", 2L, 2L, 2L, 0.980829),
      ("b", "a", 1L, 2L, 2L, 0.287682)))
  }

  // ── vocabulary coverage ─────────────────────────────────────────────────

  test("vocabCoverage ranks by frequency and sums covered token mass") {
    // counts: a×5, b×3, c×2, d×1, e×1 → N=12, rank a,b,c,d,e (term ties
    // break lexicographically: d before e)
    val docs = Seq((1L, "a a a b b c"), (2L, "a a b c d e"))
      .toDF("doc_id", "text")
    val got = Relevance.vocabCoverage(docs, "text", Seq(1, 2, 4))
      .orderBy("cutoff")
      .as[(Int, Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq(
      (1, 5L, 5L, 12L, 5.0 / 12),
      (2, 8L, 5L, 12L, 8.0 / 12),
      (4, 11L, 5L, 12L, 11.0 / 12)))
  }

  // ── containment dedup ───────────────────────────────────────────────────

  test("ngramContainmentPairs catches subsumption Jaccard misses") {
    val docsDf = Seq(
      (1L, "a b c d e"),                  // 3 shingles, all inside doc 2
      (2L, "a b c d e f g h i j"),        // 8 shingles
      (3L, "x y z w")                     // disjoint
    ).toDF("doc_id", "text")
    val got = TextDedup.ngramContainmentPairs(docsDf, "doc_id", "text",
        w = 3, threshold = 0.8)
      .select("d1", "d2", "inter", "n1", "n2", "containment")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // containment = 3/min(3,8) = 1.0; Jaccard would be 3/8 = 0.375
    assert(got.toSeq == Seq((1L, 2L, 3L, 3L, 8L, 1.0)))
    assert(TextDedup.ngramJaccardPairs(docsDf, "doc_id", "text",
      w = 3, threshold = 0.5).count() == 0)
  }

  test("ngramContainmentPairs maxDf cap drops boilerplate-only candidates") {
    // the shared shingle "p q r" appears in 3 docs → df 3 > cap 2:
    // candidate generation skips it, so no pair survives
    val docsDf = Seq(
      (1L, "p q r a b"), (2L, "p q r c d"), (3L, "p q r e f")
    ).toDF("doc_id", "text")
    assert(TextDedup.ngramContainmentPairs(docsDf, "doc_id", "text",
      w = 3, threshold = 0.3, maxDf = Some(2L)).count() == 0)
  }

  // ── z-order layout ──────────────────────────────────────────────────────

  test("zValue interleaves bits: a at even positions, b at odd") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("a", "b")
    val got = df.select(Layout.zValue(col("a"), col("b"), bits = 4).as("z"))
      .as[Long].collect()
    // (3,5): a=0011→bits 0,2 set→z 0b00000101=5; b=0101→bits 1,5 set→
    // z 0b00100010=34; total 39
    assert(got.toSeq == Seq(0L, 1L, 2L, 3L, 39L))
  }

  test("rank is an exact integer quantization, stable past 2^53") {
    val df = Seq((0L, 0L, 1L << 45), (1L << 44, 0L, 1L << 45),
      (1L << 45, 0L, 1L << 45)).toDF("v", "mn", "mx")
    val got = df.select(
      Layout.rank(col("v"), col("mn"), col("mx"), bits = 16).as("r"))
      .as[Long].collect()
    // (2^44 · 65535) / 2^45 = 32767.5 → 32767; the numerator (≈1.2e18)
    // is past double's 2^53 mantissa, so a floor(/) formulation would
    // mis-rank — `div` is exact int64
    assert(got.toSeq == Seq(0L, 32767L, 65535L))
  }

  test("clusterByZOrder bounds BOTH dimensions per output file") {
    // 64×64 grid — under a lexicographic sort by a, every file's b-range
    // would span the whole domain; z-order bounds both.
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a, b))
      .toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.clusterByZOrder(grid, "a", "b", bits = 6, numPartitions = 16)
      .write.mode("overwrite").parquet(dir)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max("a") - min("a")).as("aSpan"), (max("b") - min("b")).as("bSpan"),
        count(lit(1)).as("n"))
      .as[(String, Int, Int, Long)].collect()
    assert(perFile.length >= 8)
    // every file covers ≤ half the domain in EACH dimension (z-order
    // guarantees √(n/files)-ish rectangles; 64/√16-per-dim ⇒ span ≤ 32)
    perFile.foreach { case (f, aSpan, bSpan, n) =>
      assert(aSpan <= 32 && bSpan <= 32,
        s"file $f: aSpan=$aSpan bSpan=$bSpan over $n rows")
    }
  }

  test("withZValue rejects a domain too wide for the int64 rank multiply") {
    // span 2^50 at bits=16: (mx−mn)·65535 ≈ 7.4e19 > Long.MaxValue — with
    // ANSI off the multiply would wrap silently, so the guard must throw
    val wide = Seq((0L, 0L), (1L << 50, 1L)).toDF("a", "b")
    val err = intercept[IllegalArgumentException] {
      Layout.withZValue(wide, "a", "b", bits = 16)
    }
    assert(err.getMessage.contains("overflows int64"))
    // the same span pre-scaled (micros → millis style) passes
    val ok = Layout.withZValue(
      Seq((0L, 0L), ((1L << 50) / 1000L, 1L)).toDF("a", "b"), "a", "b", 16)
    assert(ok.count() == 2)
  }

  // ── SemDeDup ────────────────────────────────────────────────────────────

  test("semDedup marks smaller-id same-cluster neighbors above threshold") {
    // cluster 10: vecs 1,2,3 — v1∥v2 (cos 1), v3 orthogonal.
    // cluster 20: vecs 4,5 — parallel.
    val assigned = Seq(
      (1L, 10L, Seq(1.0f, 0.0f)),
      (2L, 10L, Seq(2.0f, 0.0f)),
      (3L, 10L, Seq(0.0f, 1.0f)),
      (4L, 20L, Seq(1.0f, 1.0f)),
      (5L, 20L, Seq(3.0f, 3.0f))
    ).toDF("vec_id", "cluster", "embedding")
    val got = VectorAggs.semDedup(assigned, "vec_id", "cluster", "embedding",
        threshold = 0.9)
      .orderBy("vec_id")
      .as[(Long, Long, Option[Long])].collect()
    assert(got.toSeq == Seq(
      (1L, 10L, None),       // survivor (no smaller id)
      (2L, 10L, Some(1L)),   // dup of 1
      (3L, 10L, None),       // orthogonal — kept
      (4L, 20L, None),
      (5L, 20L, Some(4L))))
  }

  test("semDedup never pairs across clusters") {
    // identical vectors in different clusters stay independent survivors
    val assigned = Seq(
      (1L, 10L, Seq(1.0f, 0.0f)),
      (2L, 20L, Seq(1.0f, 0.0f))
    ).toDF("vec_id", "cluster", "embedding")
    val got = VectorAggs.semDedup(assigned, "vec_id", "cluster", "embedding",
        threshold = 0.5)
      .filter(col("dup_of").isNotNull).count()
    assert(got == 0)
  }

  // ── funnel ──────────────────────────────────────────────────────────────

  test("funnel requires strict timestamp order across steps") {
    import graft.operators.Funnel
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // user 1 completes A→B→C in order
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "B", ts("2024-01-01 11:00:00")),
      (1L, "C", ts("2024-01-01 12:00:00")),
      // user 2 has all three but C precedes B → no completion
      (2L, "A", ts("2024-01-01 10:00:00")),
      (2L, "C", ts("2024-01-01 10:30:00")),
      (2L, "B", ts("2024-01-01 11:00:00")),
      // user 3: B-then-A first, but a SECOND B after A saves the funnel
      (3L, "B", ts("2024-01-01 09:00:00")),
      (3L, "A", ts("2024-01-01 10:00:00")),
      (3L, "B", ts("2024-01-01 10:30:00")),
      (3L, "C", ts("2024-01-01 10:45:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.earliestCompletion(events, "user_id", "event_type",
        "ts", Seq("A", "B", "C"))
      .orderBy("user_id")
      .select("user_id", "t1", "t2", "t3")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, java.sql.Timestamp)]
      .collect()
    assert(got.map(_._1).toSeq == Seq(1L, 3L))
    assert(got(1) == ((3L, ts("2024-01-01 10:00:00"),
      ts("2024-01-01 10:30:00"), ts("2024-01-01 10:45:00"))))
    val counts = Funnel.stepCounts(events, "user_id", "event_type", "ts",
        Seq("A", "B", "C")).orderBy("step_idx")
      .as[(Int, String, Long)].collect()
    // user 2 reaches A→B (B at 11:00 follows A) but not C (C precedes t2)
    assert(counts.toSeq == Seq((1, "A", 3L), (2, "B", 3L), (3, "C", 2L)))
  }

  // ── weighted sampling ───────────────────────────────────────────────────

  test("weightedSample keeps score-1 rows always and score-0 rows never") {
    val df = ((1L to 50L).map(i => (i, 1.0)) ++
      (51L to 100L).map(i => (i, 0.0)) ++
      (101L to 400L).map(i => (i, 0.5))).toDF("id", "score")
    val kept = Sampling.weightedSample(df, "id", "score", "ws")
      .select("id").as[Long].collect().toSet
    assert((1L to 50L).forall(kept.contains), "score 1.0 must always keep")
    assert((51L to 100L).forall(!kept.contains(_)), "score 0.0 never keeps")
    val mid = (101L to 400L).count(kept.contains)
    assert(mid > 100 && mid < 200, s"score 0.5 kept $mid of 300, ≈150")
    // deterministic under repartitioning
    val again = Sampling.weightedSample(df.repartition(7), "id", "score", "ws")
      .select("id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("weightedSample raises on NULL scores instead of dropping silently") {
    val df = Seq((1L, Some(0.5)), (2L, None)).toDF("id", "score")
    val err = intercept[Exception] {
      Sampling.weightedSample(df, "id", "score", "ws").count()
    }
    val messages = Iterator.iterate[Throwable](err)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
    assert(messages.exists(_.contains("non-null score")),
      s"expected the NULL-score raise, got: ${err.getMessage}")
  }

  // ── constant folding ────────────────────────────────────────────────────

  test("literal-argument vector expressions constant-fold at optimization") {
    import graft.functions.VectorFunctions
    val lit3 = array(lit(1.0), lit(2.0))
    val df = spark.range(1).select(
      VectorFunctions.dotProduct(lit3, lit3).as("d"))
    // folded: the optimized plan carries the literal 5.0, no function call
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("5.0") && !optimized.contains("dot_product"),
      s"expected constant-folded literal in:\n$optimized")
    assert(df.as[Double].head() == 5.0)
  }

  // ── normalization ───────────────────────────────────────────────────────

  test("withNormalized: case/punct variants share one dedup key") {
    import graft.operators.TextAnalysis
    val docsDf = Seq(
      (1L, "Hello,  World!"), (2L, "hello world"), (3L, "different text")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.withNormalized(docsDf, "text")
      .select("doc_id", "norm_md5", "n_chars_norm")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(got(0)._2 == got(1)._2, "variants must share the key")
    assert(got(0)._3 == 11 && got(1)._3 == 11)
    assert(got(2)._2 != got(0)._2)
  }

  // ── transition matrix ───────────────────────────────────────────────────

  test("transitionMatrix counts consecutive per-user type pairs") {
    import graft.operators.Funnel
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, 10L, "A", ts("2024-01-01 10:00:00")),
      (1L, 11L, "B", ts("2024-01-01 11:00:00")),
      (1L, 12L, "A", ts("2024-01-01 12:00:00")),
      (2L, 20L, "A", ts("2024-01-01 10:00:00")),
      (2L, 21L, "B", ts("2024-01-01 11:00:00")),
      // equal timestamps → event_id tiebreak: C before D
      (3L, 30L, "C", ts("2024-01-01 09:00:00")),
      (3L, 31L, "D", ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Funnel.transitionMatrix(events, "user_id", "event_type",
        "ts", "event_id")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long)].collect()
    assert(got.toSeq == Seq(("A", "B", 2L), ("B", "A", 1L), ("C", "D", 1L)))
  }

  // ── hamming search ──────────────────────────────────────────────────────

  test("hammingPairs: pigeonhole recall is exact within bands-1 bits") {
    // h2 = h1 with 3 bits flipped in ONE slice; h3 differs in all slices
    val h1 = 0x12345678L
    val h2 = h1 ^ 0x7L          // 3 low bits → slice 0 differs, 1-3 agree
    val h3 = h1 ^ 0x01010101L   // 1 bit per slice → no slice agrees
    val df = Seq((1L, h1), (2L, h2), (3L, h3)).toDF("id", "h")
    val got = TextDedup.hammingPairs(df, "id", "h",
        bits = 32, bands = 4, maxDist = 3)
      .orderBy("d1", "d2").as[(Long, Long, Int)].collect()
    // (1,2) found at distance 3; (1,3) is 4 bits apart (beyond maxDist,
    // AND invisible to banding — consistent); (2,3) is 7 apart
    assert(got.toSeq == Seq((1L, 2L, 3)))
    // sanity: distance 0 (exact dup) always collides on every slice
    val dup = Seq((1L, h1), (2L, h1)).toDF("id", "h")
    assert(TextDedup.hammingPairs(dup, "id", "h", 32, 4, 3)
      .as[(Long, Long, Int)].head() == ((1L, 2L, 0)))
  }

  test("hammingPairs wide slices: 60-bit/15-bit-slice pigeonhole stays exact") {
    // the q371 config: 4 bands × 15-bit slices. h2 flips 3 bits inside
    // slice 1 (bits 15..29) — slices 0, 2, 3 agree; h3 flips one bit in
    // every slice — invisible to banding AND 4 > maxDist.
    val h1 = 0x0ABCDEF012345L    // < 2^60
    val h2 = h1 ^ (0x7L << 16)
    val h3 = h1 ^ ((1L << 3) | (1L << 17) | (1L << 33) | (1L << 48))
    val df = Seq((1L, h1), (2L, h2), (3L, h3)).toDF("id", "h")
    val got = TextDedup.hammingPairs(df, "id", "h",
        bits = 60, bands = 4, maxDist = 3)
      .orderBy("d1", "d2").as[(Long, Long, Int)].collect()
    assert(got.toSeq == Seq((1L, 2L, 3)))
    // simHashWide is sign-free and nibble-mapped like the 32-bit hash:
    // its low 32 bits over the same corpus EQUAL simHash (bit b of the
    // wide hash reads the same md5 nibble)
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta"),
      (3L, "epsilon zeta eta")).toDF("doc_id", "text")
    val wide = TextDedup.simHashWide(docs, "doc_id", "text", 60)
      .select($"doc_id", ($"simhash".bitwiseAND(lit(0xFFFFFFFFL))).as("lo"))
      .as[(Long, Long)].collect().toMap
    val narrow = TextDedup.simHash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(wide == narrow)
  }

  test("hammingPairsDropCap: over-cap buckets dropped, pairs via cool slices survive") {
    // ids 1..5 share an identical hash → every slice bucket holds 5.
    // id 6 is h ^ 7 (slice 0 differs, slices 1-3 shared with the pile).
    // cap = 4: ALL the pile's buckets are over-cap → no pairs survive;
    // cap = 5: slices are exactly at cap → full pair set emitted.
    val h = 0x0F0F0F0F0F0F0L
    val pile = (1L to 5L).map(i => (i, h)) :+ ((6L, h ^ 0x7L))
    val df = pile.toDF("id", "h")
    val at4 = TextDedup.hammingPairsDropCap(df, "id", "h",
        bits = 60, bands = 4, maxDist = 3, maxBucket = 4L)
      .as[(Long, Long, Int)].collect().toSeq
    // slices 1..3 hold all 6 ids (over cap); slice 0 splits 5 vs 1 —
    // the 5-pile is still over cap at 4, so nothing survives
    assert(at4.isEmpty)
    val at5 = TextDedup.hammingPairsDropCap(df, "id", "h",
        bits = 60, bands = 4, maxDist = 3, maxBucket = 5L)
      .orderBy("d1", "d2").as[(Long, Long, Int)].collect().toSeq
    // slice 0's 5-bucket is at cap → the pile's 10 exact-dup pairs
    // survive through slice 0; id 6 only agrees on over-cap slices → out
    assert(at5 == (1L to 5L).combinations(2)
      .map(p => (p(0), p(1), 0)).toSeq)
    // the exclusion report publishes exactly the over-cap buckets
    val excl = TextDedup.hammingExcludedBuckets(df, "id", "h",
        bits = 60, bands = 4, maxBucket = 5L)
      .as[(Int, Long, Long)].collect().toSeq
    assert(excl.map(_._1).sorted == Seq(1, 2, 3) &&
      excl.forall(_._3 == 6L))
    // parity: drop-cap at a cap no bucket exceeds == uncapped
    val unc = TextDedup.hammingPairs(df, "id", "h", 60, 4, 3)
      .orderBy("d1", "d2").as[(Long, Long, Int)].collect().toSeq
    val capped = TextDedup.hammingPairsDropCap(df, "id", "h", 60, 4, 3,
        maxBucket = 100L)
      .orderBy("d1", "d2").as[(Long, Long, Int)].collect().toSeq
    assert(capped == unc)
  }

  test("perceptualHashWide: 32-bit form equals perceptualHash; 60-bit twins collide") {
    import graft.operators.Multimodal
    val df = Seq((1L, "payload one"), (2L, "payload two"),
      (3L, "payload one")).toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val narrow = Multimodal.perceptualHash(df, "doc_id", "payload")
      .as[(Long, Long)].collect().toMap
    val wide32 = Multimodal.perceptualHashWide(df, "doc_id", "payload", 32)
      .as[(Long, Long)].collect().toMap
    assert(narrow == wide32)
    val wide60 = Multimodal.perceptualHashWide(df, "doc_id", "payload", 60)
      .as[(Long, Long)].collect().toMap
    assert(wide60(1L) == wide60(3L) && wide60(1L) != wide60(2L))
    assert(wide60.values.forall(v => v >= 0L && v < (1L << 60)))
    // identical payloads land at hamming 0 through the drop-cap path
    val pairs = TextDedup.hammingPairsDropCap(
        Multimodal.perceptualHashWide(df, "doc_id", "payload", 60),
        "doc_id", "phash", 60, 4, 3, maxBucket = 4L)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs == Seq((1L, 3L, 0)))
  }

  // ── snapshot diff ───────────────────────────────────────────────────────

  test("snapshot diff classifies added/removed/changed/unchanged") {
    import graft.operators.Snapshot
    val a = Seq((1L, "same"), (2L, "old"), (3L, "gone"))
      .toDF("doc_id", "text")
    val b = Seq((1L, "same"), (2L, "new"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val got = Snapshot.diff(a, b, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(got.toSeq == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added")))
    val counts = Snapshot.diffCounts(a, b, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(counts == Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  // ── per-stratum quotas ──────────────────────────────────────────────────

  test("underBudgetPerStratum enforces each stratum's own cap") {
    import graft.operators.Selection
    val df = Seq(
      (1L, "A", 9.0, 3L), (2L, "A", 8.0, 3L), (3L, "A", 7.0, 3L),
      (4L, "B", 9.0, 4L), (5L, "B", 8.0, 4L)
    ).toDF("id", "s", "quality", "w")
    val got = Selection.underBudgetPerStratum(df, "w", "s",
        Seq(col("quality").desc, col("id").asc),
        budgets = Map("A" -> 6L), defaultBudget = 4L)
      .orderBy("id").select("id", "cum_before")
      .as[(Long, Long)].collect()
    // A cap 6: ids 1 (0+3) and 2 (3+3) fit, 3 would reach 9 → out
    // B default 4: id 4 (0+4) fits, 5 would reach 8 → out
    assert(got.toSeq == Seq((1L, 0L), (2L, 3L), (4L, 0L)))
  }

  // ── edit-distance verification ──────────────────────────────────────────

  test("editDistancePairs verifies LSH candidates at character level") {
    // two docs sharing most shingles (collide) but 3 edits apart; one far
    val docsDf = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy cat today"),
      (3L, "completely different content with other words here now")
    ).toDF("doc_id", "text")
    val got = TextDedup.editDistancePairs(docsDf, "doc_id", "text",
        maxDist = 10)
      .as[(Long, Long, Int)].collect()
    // dog → cat is 3 substitutions; doc 3 never collides
    assert(got.toSeq == Seq((1L, 2L, 3)))
  }

  // ── MinHash calibration ─────────────────────────────────────────────────

  test("minHashCalibration: exact duplicates estimate at exactly 1.0") {
    val docsDf = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"),  // identical → J = 1
      (3L, "x y z w v u")                        // disjoint
    ).toDF("doc_id", "text")
    val got = TextDedup.minHashCalibration(docsDf, "doc_id", "text")
      .as[(Long, Long, Double, Long, Double, Double)].collect()
    assert(got.toSeq == Seq((1L, 2L, 1.0, 16L, 1.0, 0.0)))
  }

  // ── degree-capped graph ─────────────────────────────────────────────────

  test("pruneDegree keeps an edge in either endpoint's top-j") {
    import graft.operators.Graph
    val pairs = Seq(
      (1L, 2L, 0.9), (1L, 3L, 0.8), (1L, 4L, 0.7), (2L, 3L, 0.6)
    ).toDF("d1", "d2", "jaccard")
    val kept = Graph.pruneDegree(pairs, "d1", "d2", "jaccard", j = 1)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // node 1's top-1 is (1,2); but (1,3) survives via node 3's top-1 and
    // (1,4) via node 4's — while (2,3) is in NEITHER endpoint's top-1
    assert(kept == Set((1L, 2L), (1L, 3L), (1L, 4L)))
  }

  test("pruneDegree accepts edges in either orientation") {
    import graft.operators.Graph
    // same graph with some rows flipped (src > dst): results must match
    val pairs = Seq(
      (2L, 1L, 0.9), (1L, 3L, 0.8), (4L, 1L, 0.7), (3L, 2L, 0.6)
    ).toDF("d1", "d2", "jaccard")
    val kept = Graph.pruneDegree(pairs, "d1", "d2", "jaccard", j = 1)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(kept == Set((2L, 1L), (1L, 3L), (4L, 1L)))
  }

  // ── budget selection ────────────────────────────────────────────────────

  test("underBudget admits the greedy prefix exactly") {
    import graft.operators.Selection
    val df = Seq(
      (1L, 5.0, 3L), (2L, 4.0, 4L), (3L, 3.0, 5L), (4L, 2.0, 2L)
    ).toDF("id", "quality", "w")
    val got = Selection.underBudget(df, "w",
        Seq(col("quality").desc, col("id").asc), budget = 9L)
      .orderBy("id").select("id", "cum_before")
      .as[(Long, Long)].collect()
    // 3 + 4 = 7 fits; the 5-token doc would reach 12 and everything
    // after it is excluded too (cum_before is monotone over the order)
    assert(got.toSeq == Seq((1L, 0L), (2L, 3L)))
    // stable under repartitioning
    val again = Selection.underBudget(df.repartition(5), "w",
        Seq(col("quality").desc, col("id").asc), 9L)
      .orderBy("id").select("id", "cum_before").as[(Long, Long)].collect()
    assert(again.toSeq == got.toSeq)
  }

  // ── repeated spans ──────────────────────────────────────────────────────

  test("repeatedSpans merges adjacent cross-doc shared grams into one span") {
    val docsDf = Seq(
      (1L, "a b c d e f g h"),   // shares grams at pos 0,1 with doc 2
      (2L, "a b c d e f x y"),
      (3L, "z z z z z z")        // within-doc repeats only → no span
    ).toDF("doc_id", "text")
    val got = TextDedup.repeatedSpans(docsDf, "doc_id", "text", w = 5)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect()
    // spans cover tokens [0, 5] (grams at positions 0 and 1, w=5)
    assert(got.toSeq == Seq((1L, 0L, 5L, 2L), (2L, 0L, 5L, 2L)))
  }

  test("repeatedSpans splits non-adjacent shared regions into spans") {
    // doc 1 shares its head (pos 0) and tail (pos 4) 3-grams with docs
    // 2/3, but the middle is unique → two separate spans
    val docsDf = Seq(
      (1L, "p q r m n o t u v"),
      (2L, "p q r x x x x"),
      (3L, "y y y y t u v")
    ).toDF("doc_id", "text")
    val spans1 = TextDedup.repeatedSpans(docsDf, "doc_id", "text", w = 3)
      .filter(col("doc_id") === 1).orderBy("span_start")
      .as[(Long, Long, Long, Long)].collect()
    assert(spans1.toSeq == Seq((1L, 0L, 2L, 1L), (1L, 6L, 8L, 1L)))
  }

  // ── distribution drift ──────────────────────────────────────────────────

  test("unigramDrift: zero for identical batches, exact KL for disjoint") {
    val a = Seq((1L, "en", "x x x")).toDF("doc_id", "lang", "text")
    val b = Seq((2L, "en", "y y y")).toDF("doc_id", "lang", "text")
    val same = Relevance.unigramDrift(a, a, "lang", "text")
      .select("kl_micro_nats").as[Double].head()
    assert(same == 0.0)
    // V=2, N=3 each side: pa(x)=0.8, pb(x)=0.2, pa(y)=0.2, pb(y)=0.8
    // KL = 0.8·ln4 + 0.2·ln(1/4) = 0.6·ln4 → micro-nats contribs
    // round6(1109035.488896) + round6(-277258.872224) = 831776.616672
    val disj = Relevance.unigramDrift(a, b, "lang", "text")
      .select("n_a", "n_b", "vocab", "kl_micro_nats")
      .as[(Long, Long, Long, Double)].head()
    assert(disj == ((3L, 3L, 2L, 831776.616672)))
  }

  // ── mergeable stats ─────────────────────────────────────────────────────

  test("mergeable stats: merge of arbitrary splits equals direct compute") {
    import graft.operators.MergeableStats
    val docs = (1L to 120L).map(i =>
      (i, s"s${i % 3}", Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val direct = MergeableStats.tokenStats(docs, "lang", "text")
      .orderBy("lang").collect().toSeq
    // three-way split with uneven pieces
    val parts = Seq(
      docs.filter(col("doc_id") % 5 === 0),
      docs.filter(col("doc_id") % 5 === 1),
      docs.filter(col("doc_id") % 5 > 1))
      .map(MergeableStats.tokenStats(_, "lang", "text"))
    val merged = MergeableStats.merge(parts).orderBy("lang").collect().toSeq
    assert(merged == direct)
  }

  // ── exact-N sampling ────────────────────────────────────────────────────

  test("exactNPerStratum returns exactly min(n, |stratum|) rows, stably") {
    val df = ((1L to 40L).map(i => (i, "A")) ++ (41L to 43L).map(i => (i, "B")))
      .toDF("id", "s")
    val got = Sampling.exactNPerStratum(df, "id", "s", "t", n = 5)
      .groupBy("s").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got("A") == 5 && got("B") == 3)
    // deterministic under repartitioning
    val a = Sampling.exactNPerStratum(df, "id", "s", "t", 5)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.exactNPerStratum(df.repartition(7), "id", "s", "t", 5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  // ── retention ───────────────────────────────────────────────────────────

  test("retentionMatrix buckets users by first-seen and offsets activity") {
    import graft.operators.Funnel
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 23:00:00")),
      (1L, ts("2024-01-03 09:00:00")),   // user 1: cohort 1/1, offsets 0, 2
      (2L, ts("2024-01-01 08:00:00")),   // user 2: cohort 1/1, offset 0
      (3L, ts("2024-01-02 12:00:00")),
      (3L, ts("2024-01-03 12:00:00"))    // user 3: cohort 1/2, offsets 0, 1
    ).toDF("user_id", "ts")
    val got = Funnel.retentionMatrix(events, "user_id", "ts")
      .orderBy("cohort", "day_offset")
      .select(col("cohort").cast("string"), col("day_offset"), col("n_users"))
      .as[(String, Int, Long)].collect()
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L),
      ("2024-01-02", 0, 1L), ("2024-01-02", 1, 1L)))
  }

  // ── sliding-window chunking ─────────────────────────────────────────────

  test("slidingChunks: overlapping windows with exact boundaries") {
    import graft.operators.Chunking
    // 10 tokens, chunkLen 4, stride 3 → chunks [0,4) [3,7) [6,10)
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "a b"))
      .toDF("doc_id", "text")
    val got = Chunking.slidingChunks(docs, "doc_id", "text",
        chunkLen = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "start_tok", "n_chunk_tokens")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 4L),
      (2L, 0L, 0L, 2L)))
    // chunk content md5 matches the hand-sliced text
    val md5s = Chunking.slidingChunks(docs, "doc_id", "text", 4, 3)
      .filter(col("doc_id") === 1 && col("chunk_idx") === 1)
      .select("chunk_md5").as[String].head()
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("t3 t4 t5 t6".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md5s == expected)
  }

  test("slidingChunks: a short trailing window is emitted, never dropped") {
    import graft.operators.Chunking
    // 5 tokens, len 2, stride 2 → [0,2) [2,4) [4,5)
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val got = Chunking.slidingChunks(docs, "doc_id", "text", 2, 2)
      .orderBy("chunk_idx").select("start_tok", "n_chunk_tokens")
      .as[(Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 2L), (2L, 2L), (4L, 1L)))
  }

  // ── whitening ───────────────────────────────────────────────────────────

  test("whiten z-scores per dimension; constant dims map to zero") {
    // dim0: {1,3} → mean 2, msq 5, sd 1 → whitened {-1, 1}
    // dim1: {2,2} → sd 0 → whitened 0
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val got = VectorAggs.whiten(df, "vec_id", "embedding")
      .orderBy("vec_id").select("whitened")
      .as[Seq[Double]].collect()
    assert(got(0) == Seq(-1.0, 0.0) && got(1) == Seq(1.0, 0.0))
  }

  test("whiten stats are partitioning-independent (exact decimal sums)") {
    val df = (1L to 300L).map(i =>
      (i, Seq.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat / 3)))
      .toDF("vec_id", "embedding")
    val a = VectorAggs.whiten(df, "vec_id", "embedding")
      .orderBy("vec_id").select("whitened").collect()
    val b = VectorAggs.whiten(df.repartition(17), "vec_id", "embedding")
      .orderBy("vec_id").select("whitened").collect()
    assert(a.toSeq == b.toSeq)
  }

  // ── matryoshka stats ────────────────────────────────────────────────────

  test("matryoshkaStats: norm and truncation cosine are exact") {
    val df = Seq(
      (1L, Seq(3.0f, 4.0f, 0.0f, 0.0f)),   // norm 5, prefix-2 norm 5 → cos 1
      (2L, Seq(0.0f, 0.0f, 3.0f, 4.0f)),   // prefix-2 norm 0 → cos 0
      (3L, Seq(1.0f, 1.0f, 1.0f, 1.0f)),   // cos = sqrt(2)/2
      (4L, Seq(0.0f, 0.0f, 0.0f, 0.0f))    // zero vector → cos 0 (guard)
    ).toDF("vec_id", "embedding")
    val got = Similarity.matryoshkaStats(df, "vec_id", "embedding", dims = 2)
      .orderBy("vec_id").as[(Long, Int, Double, Double)].collect()
    assert(got(0) == ((1L, 4, 5.0, 1.0)))
    assert(got(1) == ((2L, 4, 5.0, 0.0)))
    assert(got(2) == ((3L, 4, 2.0, 0.707107)))
    assert(got(3) == ((4L, 4, 0.0, 0.0)))
  }
}
