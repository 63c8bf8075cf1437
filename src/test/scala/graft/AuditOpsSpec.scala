package graft

import org.apache.spark.sql.functions._
import graft.operators.{Profiling, Sampling, Standardize, TextDedup,
  TextAnalysis}

/** Hand-computed examples for the round-12 statistical-audit operators
  * (Chao1, Gini–Simpson, n-gram decontamination, Poisson bootstrap,
  * Mann–Whitney, Kolmogorov–Smirnov). */
class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  // ── Chao1 richness ──────────────────────────────────────────────────────

  test("chao1Richness: hand-computed singleton/doubleton cases") {
    // stratum A: "a a b" → V=2, N=3, f1=1, f2=1 → chao1 = V + 0 = 2
    // stratum B: "x y"   → V=2, N=2, f1=2, f2=0 → chao1 = 2 + 2·1/2 = 3
    val docs = Seq(("A", "a a b"), ("B", "x y")).toDF("lang", "text")
    val got = TextAnalysis.chao1Richness(docs, "text", "lang")
      .orderBy("lang")
      .select("lang", "n_tokens", "n_types", "f1", "f2", "chao1_micro")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", 3L, 2L, 1L, 1L, 2000000L),
      ("B", 2L, 2L, 2L, 0L, 3000000L)))
  }

  test("chao1Richness: no singletons collapses to the observed count") {
    val docs = Seq(("A", "a a b b c c")).toDF("lang", "text")
    val got = TextAnalysis.chao1Richness(docs, "text", "lang")
      .select("n_types", "f1", "f2", "chao1_micro")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((3L, 0L, 3L, 3000000L)))
  }

  // ── Gini–Simpson diversity ──────────────────────────────────────────────

  test("giniSimpson: even two-category split gives 2/3 without replacement") {
    // {a,a,b,b}: 1 − (2·1 + 2·1)/(4·3) = 1 − 4/12 = 2/3
    val df = Seq(("S", "a"), ("S", "a"), ("S", "b"), ("S", "b"))
      .toDF("source", "lang")
    val got = Profiling.giniSimpson(df, "source", "lang")
      .select("n_rows", "n_categories", "gini_simpson_micro")
      .as[(Long, Long, Long)].head()
    assert(got == ((4L, 2L, 666667L)))
  }

  test("giniSimpson: monoculture is 0; a single row is NULL, not 0/0") {
    val df = Seq(("M", "a"), ("M", "a"), ("M", "a"), ("1", "z"))
      .toDF("source", "lang")
    val got = Profiling.giniSimpson(df, "source", "lang")
      .orderBy("source")
      .select(col("source"), col("gini_simpson_micro"))
      .as[(String, Option[Long])].collect().toSeq
    assert(got == Seq(("1", None), ("M", Some(0L))))
  }

  // ── n-gram decontamination ──────────────────────────────────────────────

  test("ngramDecontamination flags shared n-grams, keeps short docs") {
    // bench doc: "the quick brown fox"; corpus doc 1 shares the 3-gram
    // "quick brown fox"; doc 2 shares nothing; doc 3 is too short (2
    // words < n=3) and must still emit with n_grams = 0
    val bench = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a quick brown fox ran"),
      (2L, "entirely different words here"),
      (3L, "too short")).toDF("doc_id", "text")
    val got = TextDedup.ngramDecontamination(corpus, bench,
        "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "n_contaminated", "is_contaminated")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, 3L, 1L, true), (2L, 2L, 0L, false),
      (3L, 0L, 0L, false)))
  }

  // ── cross-stratum n-gram leakage matrix ─────────────────────────────────

  test("ngramLeakageMatrix: shared shingles counted once per source pair") {
    // s1 and s2 share "a b c" (via two s1 docs — still ONE distinct
    // shingle); s3 shares nothing with anyone
    val docs = Seq(
      (1L, "a b c d", "s1"), (2L, "x a b c", "s1"),
      (3L, "a b c", "s2"), (4L, "q r s", "s3"))
      .toDF("doc_id", "text", "source")
    val got = TextDedup.ngramLeakageMatrix(docs, "doc_id", "text",
        "source", n = 3)
      .orderBy("src_a", "src_b")
      .select("src_a", "src_b", "n_shared_grams", "n_grams_a",
        "n_grams_b", "contain_a_ppm", "contain_b_ppm")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    // s1 shingles: {abc, bcd, xab} (3 distinct); s2: {abc} (1)
    assert(got == Seq(("s1", "s2", 1L, 3L, 1L, 333333L, 1000000L)))
  }

  // ── deterministic hash split ────────────────────────────────────────────

  test("hashSplit: percents partition, assignment is key-deterministic") {
    val df = (1L to 200L).map(i => (i, "L")).toDF("doc_id", "lang")
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val a = Sampling.hashSplit(df, "doc_id", "s12", splits)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(a.values.sum == 200L && a.keySet.subsetOf(
      Set("train", "val", "test")))
    // same keys → same assignment regardless of partitioning
    val b = Sampling.hashSplit(df.repartition(7), "doc_id", "s12", splits)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(a == b)
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "doc_id", "s", Seq("a" -> 50, "b" -> 40))
    }
  }

  test("hashSplitAudit: empty cells emit with zero count and -target dev") {
    // 1-row stratum: two of the three splits MUST be empty cells
    val df = Seq((1L, "tiny")).toDF("doc_id", "lang")
    val got = Sampling.hashSplitAudit(df, "doc_id", "lang", "s12",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .orderBy("split")
      .select("split", "n_rows", "share_ppm", "target_ppm", "dev_ppm")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.length == 3)
    assert(got.map(_._2).sum == 1L)
    got.filter(_._2 == 0L).foreach { r =>
      assert(r._3 == 0L && r._5 == -r._4)
    }
    got.filter(_._2 == 1L).foreach { r =>
      assert(r._3 == 1000000L && r._5 == 1000000L - r._4)
    }
  }

  // ── Poisson bootstrap ───────────────────────────────────────────────────

  test("poissonBootstrapMean: exact point mean, ordered CI, deterministic") {
    val df = (1L to 40L).map(i => (i, "L", 10L + (i % 5)))
      .toDF("doc_id", "lang", "n_chars")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.poissonBootstrapMean(d, "doc_id", "lang", "n_chars",
          salt = "t", reps = 20)
        .select("n_rows", "mean_micro", "n_reps", "boot_lo_micro",
          "boot_hi_micro")
        .as[(Long, Long, Long, Long, Long)].head()
    val got = run(df)
    // point estimate is the exact mean: Σ(10 + i%5)/40 = 12·10⁶ exactly
    assert(got._1 == 40L && got._2 == 12000000L)
    assert(got._3 <= 20L && got._4 <= got._5)
    // the replicate band brackets the point estimate for a stable mean
    assert(got._4 <= got._2 && got._2 <= got._5)
    // hash draws are seedless: partitioning cannot move the interval
    assert(run(df.repartition(7)) == got)
  }

  // ── Mann–Whitney U / AUC ────────────────────────────────────────────────

  test("mannWhitneyU: hand-computed pairs with and without ties") {
    // A={1,3}, B={2}: pairs (1<2)=0, (3>2)=1 → U_A=1 → u2=2, AUC=1/2
    val df = Seq((1L, "A"), (3L, "A"), (2L, "B")).toDF("v", "g")
    val got = Standardize.mannWhitneyU(df, "v", "g", "A", "B")
      .select("n_a", "n_b", "u2_a", "auc_micro")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((2L, 1L, 2L, 500000L)))
    // pure tie: A={2}, B={2} → u2 = 1 (half a pair), AUC = 1/2
    val tie = Seq((2L, "A"), (2L, "B")).toDF("v", "g")
    val got2 = Standardize.mannWhitneyU(tie, "v", "g", "A", "B")
      .select("u2_a", "auc_micro").as[(Long, Long)].head()
    assert(got2 == ((1L, 500000L)))
    // complete dominance: A all above B → AUC = 1
    val dom = Seq((10L, "A"), (11L, "A"), (1L, "B")).toDF("v", "g")
    val got3 = Standardize.mannWhitneyU(dom, "v", "g", "A", "B")
      .select("u2_a", "auc_micro").as[(Long, Long)].head()
    assert(got3 == ((4L, 1000000L)))
  }

  test("mannWhitneyU ignores rows outside the two groups") {
    val df = Seq((1L, "A"), (100L, "C"), (2L, "B")).toDF("v", "g")
    val got = Standardize.mannWhitneyU(df, "v", "g", "A", "B")
      .select("n_a", "n_b").as[(Long, Long)].head()
    assert(got == ((1L, 1L)))
  }

  // ── Neyman allocation ───────────────────────────────────────────────────

  test("neymanAllocation: variable stratum outweighs an equal-size flat one") {
    // A: {0, 10} twice → varNum = 4·200 − 400 = 400 → weight 20
    // B: {5,5,5,5}     → varNum = 0              → weight 0
    val df = Seq(("A", 0L), ("A", 10L), ("A", 0L), ("A", 10L),
      ("B", 5L), ("B", 5L), ("B", 5L), ("B", 5L)).toDF("g", "v")
    val got = Sampling.neymanAllocation(df, "g", "v", totalN = 10L)
      .orderBy("g").select("g", "n_rows", "weight", "alloc")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", 4L, 20L, 10L), ("B", 4L, 0L, 0L)))
  }

  test("neymanAllocation: all-flat corpus falls back to equal split") {
    val df = Seq(("A", 5L), ("A", 5L), ("B", 7L), ("B", 7L))
      .toDF("g", "v")
    val got = Sampling.neymanAllocation(df, "g", "v", totalN = 9L)
      .orderBy("g").select("g", "alloc")
      .as[(String, Long)].collect().toSeq
    // weights fall back to 1 each; largest-remainder gives 5/4 (tie →
    // lexicographic: A gets the extra slot)
    assert(got.map(_._2).sum == 9L && got == Seq(("A", 5L), ("B", 4L)))
  }

  // ── McNemar paired filters ──────────────────────────────────────────────

  test("mcnemarFilters: hand-computed discordant cells") {
    import graft.operators.Classify
    // rows: (a,b) = (T,T), (T,F), (T,F), (F,T), (F,F)
    // n11=1 n10=2 n01=1 n00=1 → (b−c)²/(b+c) = 1/3 → 333333 micro
    val df = Seq((1L, true, true), (2L, true, false), (3L, true, false),
      (4L, false, true), (5L, false, false))
      .toDF("id", "fa", "fb").withColumn("g", lit("s"))
    val got = Classify.mcnemarFilters(df, "g", col("fa"), col("fb"))
      .select("n11", "n10", "n01", "n00", "mcnemar_micro")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((1L, 2L, 1L, 1L, 333333L)))
  }

  test("mcnemarFilters: perfect agreement reports NULL, not 0/0") {
    import graft.operators.Classify
    val df = Seq((1L, true, true), (2L, false, false))
      .toDF("id", "fa", "fb").withColumn("g", lit("s"))
    val got = Classify.mcnemarFilters(df, "g", col("fa"), col("fb"))
      .select(col("mcnemar_micro")).as[Option[Long]].head()
    assert(got.isEmpty)
  }

  test("mcnemarFilters: NULL flags count as rejections, cells stay a partition") {
    import graft.operators.Classify
    // NULL fa on id 3: without the coalesce it would fall into NO cell
    // (NULL AND x → otherwise-0 everywhere) and the stratum would
    // undercount; the contract is NULL = rejection → cell n01 (fb true)
    val df = Seq((1L, Some(true), true), (2L, Some(false), false),
        (3L, None: Option[Boolean], true))
      .toDF("id", "fa", "fb").withColumn("g", lit("s"))
    val got = Classify.mcnemarFilters(df, "g", col("fa"), col("fb"))
      .select("n11", "n10", "n01", "n00")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((1L, 0L, 1L, 1L)))
    assert(got._1 + got._2 + got._3 + got._4 == 3L)
  }

  // ── snapshot diff ───────────────────────────────────────────────────────

  test("snapshotDiff: added/removed/changed/unchanged partition the keys") {
    import graft.operators.Profiling
    val oldS = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "t")
    val newS = Seq((2L, "b"), (3L, "C!"), (4L, "d")).toDF("id", "t")
    val got = Profiling.snapshotDiff(oldS, newS, "id", Seq("t"))
      .select("n_keys", "n_added", "n_removed", "n_changed", "n_unchanged")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((4L, 1L, 1L, 1L, 1L)))
  }

  test("snapshotDiff: duplicate keys in a snapshot throw, never miscount") {
    import graft.operators.Profiling
    val dup = Seq((1L, "a"), (1L, "a2")).toDF("id", "t")
    val clean = Seq((1L, "a")).toDF("id", "t")
    val e = intercept[Exception] {
      Profiling.snapshotDiff(dup, clean, "id", Seq("t")).collect()
    }
    assert(e.getMessage != null)
  }

  test("snapshotDiff: a NULL key throws its own error, never trips the dup guard") {
    import graft.operators.Profiling
    // one NULL-keyed row: it would never join (count(*) > countDistinct)
    // and spuriously read as duplicate keys — the operator must name the
    // real contract violation instead
    val withNull = Seq((Some(1L), "a"), (None: Option[Long], "b"))
      .toDF("id", "t")
    val clean = Seq((1L, "a")).toDF("id", "t")
    val e = intercept[Exception] {
      Profiling.snapshotDiff(withNull, clean, "id", Seq("t")).collect()
    }
    assert(e.getMessage.contains("NULL key"), e.getMessage)
  }

  // ── SCD2 intervals ──────────────────────────────────────────────────────

  test("scd2Intervals: runs collapse, intervals chain, last stays open") {
    import graft.operators.History
    val ev = Seq(
      (1L, "x", 10L, 1L), (1L, "x", 20L, 2L), (1L, "y", 30L, 3L),
      (1L, "x", 40L, 4L), (2L, "z", 5L, 5L))
      .toDF("u", "attr", "ts", "eid")
    val got = History.scd2Intervals(ev, "u", "attr", "ts", "eid")
      .orderBy("u", "version")
      .select(col("u"), col("version"), col("attr"), col("valid_from"),
        col("valid_to"), col("n_events"))
      .as[(Long, Long, String, Long, Option[Long], Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, "x", 10L, Some(30L), 2L),
      (1L, 2L, "y", 30L, Some(40L), 1L),
      (1L, 3L, "x", 40L, None, 1L),
      (2L, 1L, "z", 5L, None, 1L)))
  }

  // ── Kolmogorov–Smirnov ──────────────────────────────────────────────────

  test("ksTwoSample: disjoint supports give D = 1 exactly") {
    val df = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B")).toDF("v", "g")
    val got = Standardize.ksTwoSample(df, "v", "g", "A", "B")
      .select("n_a", "n_b", "d_num", "d_den", "d_micro")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((2L, 2L, 4L, 4L, 1000000L)))
  }

  test("ksTwoSample: identical samples give D = 0; shift gives exact D") {
    val same = Seq((1L, "A"), (2L, "A"), (1L, "B"), (2L, "B")).toDF("v", "g")
    val g0 = Standardize.ksTwoSample(same, "v", "g", "A", "B")
      .select("d_num", "d_micro").as[(Long, Long)].head()
    assert(g0 == ((0L, 0L)))
    // A={1,2}, B={2,3}: at v=1 |1·2−0·2|=2, at v=2 |2·2−1·2|=2 → D=1/2
    val shift = Seq((1L, "A"), (2L, "A"), (2L, "B"), (3L, "B"))
      .toDF("v", "g")
    val g1 = Standardize.ksTwoSample(shift, "v", "g", "A", "B")
      .select("d_num", "d_den", "d_micro")
      .as[(Long, Long, Long)].head()
    assert(g1 == ((2L, 4L, 500000L)))
  }
}
