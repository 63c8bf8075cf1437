package graft

import org.apache.spark.sql.functions._
import graft.operators.{Decay, Funnel, Histogram, Profiling, Sampling, Selection, Similarity, Snapshot, Standardize, TextAnalysis, TextDedup, VectorAggs}

/** Targeted specs for the round-6 diagnostics/selection operators
  * (table profiling, quantized percentiles, Pareto frontier, half-life
  * decay, word entropy, hard negatives) — hand-computed expectations on
  * crafted inputs, independent of the DuckDB gate. */
class Round6OperatorsSpec extends SparkSpec {
  import spark.implicits._

  // ── table profiling ─────────────────────────────────────────────────────

  test("profile counts rows/nulls/distincts and renders min/max canonically") {
    val df = Seq(
      (1L, Some(1.25), Some("b")),
      (2L, Some(1.25), Some("a")),
      (3L, None, Some("c")),
      (10L, Some(-0.5), None)
    ).toDF("id", "score", "tag")
    val got = Profiling.profile(df, Seq("id", "score", "tag"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect()
    assert(got.toSeq == Seq(
      // int64 min/max render verbatim (NOT lexicographic "10" < "9")
      ("id", 4L, 0L, 4L, "1", "10"),
      // doubles render as 6-dp decimals; NULL excluded from distinct
      ("score", 4L, 1L, 2L, "-0.500000", "1.250000"),
      ("tag", 4L, 1L, 3L, "a", "c")))
  }

  test("profile melts once: a single scan of the input, not one per column") {
    val df = Seq((1L, 2.0), (3L, 4.0)).toDF("a", "b")
    val profiled = Profiling.profile(df, Seq("a", "b"))
    val scans = profiled.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.length == 1, s"expected 1 scan, got ${scans.length}")
  }

  // ── quantized percentiles ───────────────────────────────────────────────

  test("quantizedPercentiles finds the exact crossing bucket per stratum") {
    // values 1..100 in one stratum: with bits high enough each value is
    // its own bucket, so pct p lands exactly on value p
    val df = (1L to 100L).map(v => ("s", v)).toDF("g", "v")
    val got = Histogram.quantizedPercentiles(df, "v", "g", bits = 12,
        pcts = Seq(50, 90, 99))
      .orderBy("pct")
      .select("g", "pct", "lo", "hi", "n_le", "n")
      .as[(String, Int, Long, Long, Long, Long)].collect()
    // bucket of v: ((v-1)*4095) div 99 — injective at this domain size,
    // so the crossing bucket holds exactly value p and n_le counts v ≤ p;
    // the dequantized [lo, hi) bounds bracket it within one bucket width
    assert(got.map(_._2).toSeq == Seq(50, 90, 99))
    got.foreach { case (_, p, lo, hi, nLe, n) =>
      assert(n == 100L)
      assert(nLe == p.toLong, s"pct $p: n_le $nLe")
      assert(lo <= p.toLong && p.toLong <= hi, s"pct $p: [$lo, $hi)")
    }
  }

  test("quantizedPercentiles rejects an int64-overflowing domain") {
    val wide = Seq(("s", 0L), ("s", 1L << 52)).toDF("g", "v")
    val err = intercept[IllegalArgumentException] {
      Histogram.quantizedPercentiles(wide, "v", "g", bits = 12)
    }
    assert(err.getMessage.contains("overflows int64"))
  }

  // ── Pareto frontier ─────────────────────────────────────────────────────

  test("paretoFrontier keeps exactly the undominated points") {
    val pts = Seq(
      (1L, 1.0, 100L), // frontier: nothing has both higher x and >= y
      (2L, 2.0, 90L),  // frontier
      (3L, 3.0, 50L),  // frontier
      (4L, 2.5, 50L),  // dominated by (3.0, 50): x strictly higher, y equal
      (5L, 1.5, 90L),  // dominated by (2.0, 90)
      (6L, 3.0, 40L),  // dominated by same-level (3.0, 50)
      (7L, 2.0, 90L)   // tie of (2.0, 90): both kept (neither dominates)
    ).toDF("id", "x", "y")
    val got = Selection.paretoFrontier(pts, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 7L))
  }

  // ── half-life decay ─────────────────────────────────────────────────────

  test("halfLifeSum weights exact half-lives as powers of two") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-08 00:00:00"), 8.0),  // newest: weight 1
      (1L, ts("2024-01-01 00:00:00"), 8.0),  // 7 days = 1 half-life: 0.5
      (2L, ts("2023-12-25 00:00:00"), 8.0)   // 14 days = 2 half-lives: 0.25
    ).toDF("user_id", "ts", "value")
    val got = Decay.halfLifeSum(events, "ts", "value", Seq("user_id"),
        halfLifeDays = 7.0)
      .orderBy("user_id")
      .select(col("user_id"), col("n_events"),
        col("decayed_sum").cast("double"))
      .as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 2L, 12.0), (2L, 1L, 2.0)))
  }

  test("halfLifeSum rejects a non-positive half-life") {
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      .toDF("user_id", "ts", "value")
    intercept[IllegalArgumentException] {
      Decay.halfLifeSum(df, "ts", "value", Seq("user_id"), halfLifeDays = 0.0)
    }
  }

  // ── word entropy ────────────────────────────────────────────────────────

  test("wordEntropy: uniform two-word doc is ln 2, constant doc is 0") {
    val docs = Seq(
      (1L, "a b a b"),     // p = (1/2, 1/2) → H = ln 2
      (2L, "x x x x x"),   // single type → H = 0
      (3L, "a b c d")      // uniform over 4 → H = ln 4
    ).toDF("doc_id", "text")
    val got = TextAnalysis.wordEntropy(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        col("entropy_nats").cast("double"))
      .as[(Long, Long, Long, Double)].collect()
    // terms are 6-dp-rounded BEFORE the decimal sum, so the expectation
    // is k · round(term, 6), not round(k · term, 6)
    def term(p: Double) = BigDecimal(p * math.log(1.0 / p))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(got(0) == ((1L, 4L, 2L, (term(0.5) * 2).toDouble)))
    assert(got(1) == ((2L, 5L, 1L, 0.0)))
    assert(got(2) == ((3L, 4L, 4L, (term(0.25) * 4).toDouble)))
  }

  // ── mergeable histograms ────────────────────────────────────────────────

  test("bucketCounts merge over any batch split equals the direct histogram") {
    val vals = (1L to 200L).map(v => Tuple1(v * 7 % 97)).toDF("v")
    val direct = Histogram.bucketCounts(vals, "v", bits = 4, mn = 0L,
        mx = 100L)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    val parts = Seq(
      vals.filter(col("v") % 3 === 0), vals.filter(col("v") % 3 === 1),
      vals.filter(col("v") % 3 === 2))
      .map(Histogram.bucketCounts(_, "v", bits = 4, mn = 0L, mx = 100L))
    val merged = Histogram.mergeBucketCounts(parts)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(merged == direct)
  }

  test("bucketCounts clamps out-of-domain values to the edge buckets") {
    val df = Seq(-50L, 0L, 50L, 100L, 999L).toDF("v")
    val got = Histogram.bucketCounts(df, "v", bits = 2, mn = 0L, mx = 100L)
      .orderBy("bucket").as[(Long, Long)].collect()
    // -50 clamps to bucket 0; 999 clamps to bucket 3 (= 2^2 − 1)
    assert(got.toSeq == Seq((0L, 2L), (1L, 1L), (3L, 2L)))
  }

  // ── prefix clusters ─────────────────────────────────────────────────────

  test("prefixClusters groups docs by first-k tokens only") {
    val docs = Seq(
      (1L, "a b c d e suffix one"),
      (2L, "a b c d e totally different tail"),
      (3L, "a b c d e"),            // exactly k tokens — same group
      (4L, "a b c d X e"),          // 5th token differs — own group
      (5L, "unrelated words entirely here now")
    ).toDF("doc_id", "text")
    val got = TextDedup.prefixClusters(docs, "doc_id", "text", k = 5)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == 1)
    assert(got(0)._2 == 3L && got(0)._3 == 1L && got(0)._4 == 3L)
  }

  // ── z-scores ────────────────────────────────────────────────────────────

  test("zScores standardizes within stratum with population moments") {
    val df = Seq(
      ("a", 0.0), ("a", 10.0),           // mean 5, pop std 5 → z = ∓1
      ("b", 2.0), ("b", 2.0), ("b", 2.0) // constant: var 0 → z NaN
    ).toDF("g", "v")
    val got = Standardize.zScores(df, "v", "g", sigma = 1.0)
      .filter(col("g") === "a").orderBy(col("v"))
      .select(col("mean"), col("std"), col("z"), col("is_outlier"))
      .as[(Double, Double, Double, Boolean)].collect()
    assert(got.toSeq == Seq((5.0, 5.0, -1.0, true), (5.0, 5.0, 1.0, true)))
  }

  // ── proportional quota ──────────────────────────────────────────────────

  test("proportionalQuota allocates largest remainders to an exact total") {
    // strata 50/30/21 of 101, N=10: bases 4/2/2, remainders 96/98/8 →
    // the two extra slots go to s30 (98) then s50 (96): quotas 5/3/2
    val rows = (1L to 50L).map(i => (i, "s50")) ++
      (51L to 80L).map(i => (i, "s30")) ++ (81L to 101L).map(i => (i, "s21"))
    val df = rows.toDF("id", "g")
    val got = Sampling.proportionalQuota(df, "id", "g", "pq", totalN = 10L)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(got == Map("s50" -> 5L, "s30" -> 3L, "s21" -> 2L))
    // deterministic under repartitioning
    val again = Sampling.proportionalQuota(df.repartition(7), "id", "g",
        "pq", totalN = 10L)
      .select("id").as[Long].collect().toSet
    val first = Sampling.proportionalQuota(df, "id", "g", "pq", totalN = 10L)
      .select("id").as[Long].collect().toSet
    assert(again == first)
  }

  // ── last-touch attribution ──────────────────────────────────────────────

  test("lastTouch credits the most recent in-window source or nothing") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // user 1: click 10:00, click 10:30, purchase 10:40 → credit 2nd click
      (1L, 1L, "click", ts("2024-01-01 10:00:00")),
      (2L, 1L, "click", ts("2024-01-01 10:30:00")),
      (3L, 1L, "purchase", ts("2024-01-01 10:40:00")),
      // user 2: click 08:00, purchase 10:00 → 2 h gap, out of window
      (4L, 2L, "click", ts("2024-01-01 08:00:00")),
      (5L, 2L, "purchase", ts("2024-01-01 10:00:00")),
      // user 3: purchase with no click at all
      (6L, 3L, "purchase", ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Funnel.lastTouch(events, "user_id", "event_type", "ts",
        "event_id", "click", "purchase", windowSec = 3600L)
      .orderBy("event_id")
      .as[(Long, Long, Option[Long], Option[Long])].collect()
    assert(got.toSeq == Seq(
      (3L, 1L, Some(2L), Some(600L)),
      (5L, 2L, None, None),
      (6L, 3L, None, None)))
  }

  // ── sign codes ──────────────────────────────────────────────────────────

  test("signCodes packs sign bits incl. the int64 sign bit, and feeds " +
      "Hamming search") {
    val vecs = Seq(
      (1L, (0 until 64).map(i => if (i == 0 || i == 63) 1.0f else -1.0f)),
      (2L, (0 until 64).map(i => if (i == 0) 1.0f else -1.0f)),
      (3L, (0 until 64).map(_ => -1.0f))
    ).toDF("vec_id", "embedding")
    val codes = VectorAggs.signCodes(vecs, "vec_id", "embedding", dims = 64)
    val byId = codes.as[(Long, Long)].collect().toMap
    assert(byId(1L) == (1L | Long.MinValue))
    assert(byId(2L) == 1L)
    assert(byId(3L) == 0L)
    // dims slices the vector: dimensions past dims never set bits
    val truncated = VectorAggs.signCodes(vecs, "vec_id", "embedding",
        dims = 32).as[(Long, Long)].collect().toMap
    assert(truncated(1L) == 1L, "bit 63 must be dropped at dims=32")
    // composition: pigeonhole Hamming search runs unchanged over codes
    val pairs = TextDedup.hammingPairs(codes, "vec_id", "code",
        bits = 64, bands = 8, maxDist = 2)
      .orderBy("d1", "d2").as[(Long, Long, Int)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 1), (1L, 3L, 2), (2L, 3L, 1)))
  }

  // ── SCD type-2 intervalization ──────────────────────────────────────────

  test("scd2 collapses repeats and chains validity intervals per key") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val log = Seq(
      // user 1: A, A (repeat collapses), B, A again (new interval)
      (1L, 1L, "A", ts("2024-01-01 10:00:00")),
      (2L, 1L, "A", ts("2024-01-01 11:00:00")),
      (3L, 1L, "B", ts("2024-01-01 12:00:00")),
      (4L, 1L, "A", ts("2024-01-01 13:00:00")),
      // user 2: single value → one open interval
      (5L, 2L, "X", ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "attr", "ts")
    def us(s: String) = java.sql.Timestamp.valueOf(s).getTime * 1000L
    val got = graft.operators.Snapshot.scd2(log, "user_id", "attr", "ts",
        "event_id")
      .orderBy("user_id", "valid_from_us")
      .as[(Long, Long, String, Long, Option[Long], Boolean)].collect()
    assert(got.toSeq == Seq(
      (1L, 1L, "A", us("2024-01-01 10:00:00"),
        Some(us("2024-01-01 12:00:00")), false),
      (1L, 3L, "B", us("2024-01-01 12:00:00"),
        Some(us("2024-01-01 13:00:00")), false),
      (1L, 4L, "A", us("2024-01-01 13:00:00"), None, true),
      (2L, 5L, "X", us("2024-01-01 09:00:00"), None, true)))
  }

  // ── skip-gram co-occurrence ─────────────────────────────────────────────

  test("skipgramPairs counts unordered pairs within the window only") {
    val docs = Seq(Tuple1("a b c d")).toDF("text")
    val got = graft.operators.Relevance.skipgramPairs(docs, "text",
        window = 2, k = 100)
      .orderBy("x", "y").as[(String, String, Long)].collect()
    // distance 1: (a,b)(b,c)(c,d); distance 2: (a,c)(b,d); never (a,d)
    assert(got.toSeq == Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L),
      ("b", "d", 1L), ("c", "d", 1L)))
  }

  test("skipgramPairs canonicalizes pair order and merges both directions") {
    // "b a" and "a b" are the same unordered pair → count 2
    val docs = Seq(Tuple1("b a"), Tuple1("a b")).toDF("text")
    val got = graft.operators.Relevance.skipgramPairs(docs, "text",
        window = 2, k = 10)
      .as[(String, String, Long)].collect()
    assert(got.toSeq == Seq(("a", "b", 2L)))
  }

  // ── novelty scores ──────────────────────────────────────────────────────

  test("noveltyScores: exact dup scores 0, unrelated doc scores 1") {
    val docs = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight"), // exact dup of 1
      (3L, "alpha beta gamma delta epsilon zeta eta")  // no shared shingle
    ).toDF("doc_id", "text")
    val got = TextDedup.noveltyScores(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Double, Long)].collect()
    assert(got.toSeq == Seq((1L, 0.0, 1L), (2L, 0.0, 1L), (3L, 1.0, 0L)))
  }

  // ── KMV distinct sketch ─────────────────────────────────────────────────

  test("kmv sketches merge exactly and estimate within the k-bound error") {
    import graft.operators.Sketches
    val keys = (1L to 2000L).map(i => ("s", s"key_$i")).toDF("g", "key")
    val direct = Sketches.kmvSketch(keys, "key", "g", 64)
    // merge law: sketches of 3 disjoint parts re-cut to the direct sketch
    val parts = Seq(0, 1, 2).map(r =>
      Sketches.kmvSketch(keys.filter(length(col("key")) % 3 === r),
        "key", "g", 64))
    val merged = graft.operators.Sketches.kmvMerge(parts, "g", 64)
    assert(merged.orderBy("h").collect().toSeq ==
      direct.orderBy("h").collect().toSeq)
    // estimator sanity: k=64 → relative error ~1/√k ≈ 12%; allow 3σ
    val est = Sketches.kmvEstimate(direct, "g", 64)
      .select("est_distinct").as[Double].head()
    assert(math.abs(est - 2000.0) / 2000.0 < 0.4, s"estimate $est vs 2000")
  }

  test("kmv reports exact counts (no estimate) below k distinct") {
    import graft.operators.Sketches
    val keys = (1L to 5L).map(i => ("s", s"k$i")).toDF("g", "key")
    val got = Sketches.kmvEstimate(Sketches.kmvSketch(keys, "key", "g", 16),
        "g", 16)
      .as[(String, Long, Option[Long], Option[Double])].collect()
    assert(got.toSeq == Seq(("s", 5L, None, None)))
  }

  // ── dedup-graph triangles ───────────────────────────────────────────────

  test("triangleCounts finds oriented triangles and coefficients") {
    // triangle 1-2-3 plus a chain 3-4-5 (no triangle)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("d1", "d2")
    val got = graft.operators.Graph.triangleCounts(edges, "d1", "d2")
      .orderBy("node")
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, Some(1.0)),       // deg 2, 1 triangle → coeff 1
      (2L, 2L, 1L, Some(1.0)),
      (3L, 3L, 1L, Some(0.333333)),  // deg 3: 1 of 3 possible pairs (6 dp)
      (4L, 2L, 0L, Some(0.0)),
      (5L, 1L, 0L, None)))           // degree 1: coefficient undefined
  }

  // ── Otsu threshold ──────────────────────────────────────────────────────

  test("otsuThreshold cuts a bimodal distribution between the modes") {
    // modes at 10 and 90 on [0, 100]: the maximizing cut separates them
    val vals = (Seq.fill(50)(10L) ++ Seq.fill(50)(90L)).map(Tuple1(_))
      .toDF("v")
    val got = Histogram.otsuThreshold(vals, "v", bits = 4, mn = 0L,
        mx = 100L)
      .select("threshold_value", "w0", "w1")
      .as[(Long, Long, Long)].collect()
    assert(got.length == 1)
    val (cut, w0, w1) = got(0)
    assert(w0 == 50L && w1 == 50L, s"classes must split at the modes: $got")
    assert(cut > 10L && cut <= 90L, s"cut $cut must separate 10 from 90")
  }

  // ── entity-resolution blocking ──────────────────────────────────────────

  test("sharedFingerprintPairs counts distinct shared prints, caps df") {
    val df = Seq(
      (1L, "fa"), (1L, "fb"), (1L, "fa"),   // duplicate posting collapses
      (2L, "fa"), (2L, "fb"),               // shares fa+fb with 1 → pair
      (3L, "fa"),                           // shares only fa → below min 2
      (1L, "hot"), (2L, "hot"), (3L, "hot"), (4L, "hot") // df 4 > cap 3
    ).toDF("e", "fp")
    val got = graft.operators.EntityResolution
      .sharedFingerprintPairs(df, "e", "fp", minShared = 2, maxDf = 3)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, 2L)))
  }

  // ── incremental aggregate maintenance ───────────────────────────────────

  test("maintainAgg over add/remove/change/migrate equals direct agg") {
    val a = Seq(
      (1L, "en", 10L), (2L, "en", 20L), (3L, "fr", 30L), (4L, "de", 40L))
      .toDF("id", "lang", "w")
    val b = Seq(
      (1L, "en", 10L),  // unchanged
      // 2 removed
      (3L, "fr", 35L),  // weight changed
      (4L, "fr", 40L),  // migrated de → fr (de drops to zero and is gone)
      (5L, "en", 50L))  // added
      .toDF("id", "lang", "w")
    def key(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("ck", concat_ws("|", col("lang"), col("w")))
    val base = a.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("w_sum"))
    val got = Snapshot.maintainAgg(base, key(a), key(b), "id", "ck",
        "lang", "w")
      .orderBy("lang").as[(String, Long, Long)].collect()
    assert(got.toSeq == Seq(("en", 2L, 60L), ("fr", 2L, 75L)))
  }

  // ── grouped OLS ─────────────────────────────────────────────────────────

  test("groupOls recovers an exact line per stratum") {
    // stratum a: y = 2x + 1 exactly; stratum b: y = -0.5x + 3
    val pts = (1 to 10).map(x => ("a", x.toDouble, 2.0 * x + 1)) ++
      (1 to 10).map(x => ("b", x.toDouble, -0.5 * x + 3))
    val got = Standardize.groupOls(pts.toDF("g", "x", "y"), "x", "y", "g")
      .orderBy("g").as[(String, Long, Double, Double)].collect()
    assert(got.toSeq == Seq(("a", 10L, 2.0, 1.0), ("b", 10L, -0.5, 3.0)))
  }

  // ── weighted percentiles ────────────────────────────────────────────────

  test("weightedQuantizedPercentiles crosses on cumulative weight") {
    // values 1..9 weight 1 each, value 10 weight 91: the median unit of
    // weight sits in value 10's bucket even though the median VALUE is 5
    val rows = (1L to 9L).map(v => ("s", v, 1L)) :+ (("s", 10L, 91L))
    val df = rows.toDF("g", "v", "w")
    val got = Histogram.weightedQuantizedPercentiles(df, "v", "w", "g",
        bits = 8, pcts = Seq(50))
      .select("lo", "hi", "n_le", "n").as[(Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (lo, hi, nLe, n) = got(0)
    assert(n == 100L && nLe == 100L)
    assert(lo <= 10L && 10L <= hi, s"crossing bucket [$lo,$hi) must hold 10")
    // unweighted for contrast: the median row is value 5
    val un = Histogram.quantizedPercentiles(df, "v", "g", bits = 8,
        pcts = Seq(50)).select("lo", "hi").as[(Long, Long)].collect()(0)
    assert(un._1 <= 5L && 5L <= un._2)
  }

  // ── reciprocal-rank fusion ──────────────────────────────────────────────

  test("rrfFuse sums reciprocal ranks across lists, missing ranks add 0") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (10L, 2)).toDF("id", "rank")
    val got = graft.operators.Relevance.rrfFuse(Seq(a, b), "id", "rank",
        kRrf = 60, topN = 10)
      .as[(Long, Double, Long)].collect()
    def r(k: Int) = BigDecimal(1.0 / (60 + k))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // 10: 1/61 + 1/62; 20: 1/62 + 1/61 (tie, id breaks); 30: 1/63 alone
    assert(got.map(_._1).toSeq == Seq(10L, 20L, 30L))
    assert(got(0)._2 == (r(1) + r(2)).toDouble && got(0)._3 == 2L)
    assert(got(2)._2 == r(3).toDouble && got(2)._3 == 1L)
  }

  // ── bigram language model ───────────────────────────────────────────────

  test("bigramLogProb computes add-one-smoothed corpus probabilities") {
    // corpus: "a b" x2 and "a c": c(a,b)=2, c(a,c)=1, c_a=3, V=3
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = graft.operators.Relevance
      .bigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    def lp(cxy: Long, cx: Long) = (BigDecimal(
      math.log((cxy + 1).toDouble / (cx + 3).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP) * 1000000).toLong
    assert(got.toSeq == Seq(
      (1L, 1L, lp(2, 3)), (2L, 1L, lp(2, 3)), (3L, 1L, lp(1, 3))))
  }

  // ── kNN label propagation ───────────────────────────────────────────────

  test("knnPredict votes among the k nearest labeled neighbors only") {
    // query (0) is closest to three label-7 vectors; two label-8 vectors
    // are nearer than nothing but outvoted 3-2 at k=5; the far label-9
    // vector is outside k
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f), 99),    // query; its stored label is "true"
      (1L, Seq(1.0f, 0.01f), 7),
      (2L, Seq(1.0f, 0.02f), 7),
      (3L, Seq(1.0f, 0.03f), 7),
      (4L, Seq(1.0f, 0.5f), 8),
      (5L, Seq(1.0f, 0.6f), 8),
      (6L, Seq(0.0f, 1.0f), 9)
    ).toDF("vec_id", "embedding", "label")
    val got = VectorAggs.knnPredict(vecs, "vec_id", "embedding", "label",
        col("vec_id") === 0, k = 5)
      .as[(Long, Int, Long, Int)].collect()
    assert(got.toSeq == Seq((0L, 7, 3L, 99)))
  }

  // ── hard negatives ──────────────────────────────────────────────────────

  test("hardNegatives excludes same-label vectors and ranks by cosine") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f), 1),   // anchor, label 1
      (1L, Seq(1.0f, 0.0f), 1),   // same label — never a negative
      (2L, Seq(1.0f, 0.1f), 2),   // closest different-label
      (3L, Seq(1.0f, 1.0f), 2),   // second
      (4L, Seq(0.0f, 1.0f), 3),   // orthogonal — third
      (5L, Seq(-1.0f, 0.0f), 2)   // opposite — beyond k=3
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(vecs, "vec_id", "embedding", "label",
        col("vec_id") === 0, k = 3)
      .orderBy(col("cosine").desc, col("neg_id"))
      .select("anchor_id", "neg_id", "neg_label")
      .as[(Long, Long, Int)].collect()
    assert(got.toSeq == Seq((0L, 2L, 2), (0L, 3L, 2), (0L, 4L, 3)))
  }
}
