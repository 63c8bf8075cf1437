package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sketches, TextDedup}

/** Targeted specs for the round-6 matching/sketching operators
  * (prefix-filtered set-similarity join, sorted-neighborhood dedup,
  * Count-Min sketch) — hand-computed expectations and law checks on
  * crafted inputs, independent of the DuckDB gate. */
class MatchOpsSpec extends SparkSpec {
  import spark.implicits._

  // ── prefix-filtered set-similarity join ─────────────────────────────────

  test("prefixJaccardPairs equals the unfiltered all-pairs join (lossless)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy cat today"),
      (3L, "a completely different document about spark engines"),
      (4L, "a completely different document about spark planes"),
      (5L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")
    val exact = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
        w = 3, threshold = 0.5)
      .orderBy("d1", "d2").collect().toSeq
    val viaPrefix = TextDedup.prefixJaccardPairs(docs, "doc_id", "text",
        w = 3, tNum = 1, tDen = 2)
      .orderBy("d1", "d2").collect().toSeq
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    assert(viaPrefix == exact)
  }

  test("prefixCandidates never indexes shingles outside the df-order prefix") {
    // 4 docs of 8 shingles each, sharing ONLY one ultra-common shingle
    // (df=4); at t=1/2, prefix length = 8 - 4 + 1 = 5 and the common
    // shingle sorts LAST (rarest-first order, position 8) → no candidates
    // at all, where a naive inverted-index join would emit all 6 pairs
    def doc(i: Int) = s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g SHARED COMMON TOKEN"
    val docs = (1 to 4).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val sh = TextDedup.shingles(docs, "doc_id", "text", w = 3)
    val cand = TextDedup.prefixCandidates(sh, "doc_id", 1, 2)
    assert(cand.count() == 0)
    // sanity: the naive join does see the boilerplate collisions
    assert(TextDedup.pairIntersections(sh, "doc_id").count() == 6)
  }

  // ── sorted-neighborhood dedup ───────────────────────────────────────────

  test("sortedNeighborhoodPairs compares only within the window") {
    // keys sort as d10, d20, d30, d40 (doc_id tiebreak); texts identical
    // → every in-window pair verifies at distance 0. window=2 → only
    // adjacent-in-order pairs
    val docs = Seq(
      (10L, "alpha alpha alpha"), (20L, "alpha alpha alpha"),
      (30L, "alpha alpha alpha"), (40L, "alpha alpha alpha")
    ).toDF("doc_id", "text")
    val got = TextDedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
        window = 2, maxDist = 5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 20L), (20L, 30L), (30L, 40L)))
  }

  test("sortedNeighborhoodPairs verifies with the edit-distance budget") {
    val docs = Seq(
      (1L, "same prefix key here ends with aaaa"),
      (2L, "same prefix key here ends with aaab"), // dist 1 from doc 1
      (3L, "same prefix key here but then totally different tail xyz")
    ).toDF("doc_id", "text")
    val got = TextDedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
        window = 3, maxDist = 2)
      .select("d1", "d2", "edit_dist").as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 2L, 1)))
  }

  // ── Count-Min sketch ────────────────────────────────────────────────────

  test("cmsEstimate never undercounts and is exact absent collisions") {
    val keys = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val df = keys.toDF("k")
    val sketch = Sketches.cmsSketch(df, "k", d = 4, width = 256)
    val probes = Seq("a", "b", "c").toDF("k")
    val est = Sketches.cmsEstimate(sketch, probes, "k", d = 4, width = 256)
      .as[(String, Long)].collect().toMap
    val exact = Map("a" -> 7L, "b" -> 3L, "c" -> 1L)
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k: CMS undercounted ${est(k)} < $n")
    }
    // 3 distinct keys into 4×256 counters: some row is collision-free
    // with near-certainty under md5 — and deterministically so for THIS
    // fixed input, which is what the equality pins down
    assert(est == exact)
  }

  // ── boolean AND retrieval ───────────────────────────────────────────────

  test("booleanRetrieve returns docs containing every term exactly once") {
    val docs = Seq(
      (1L, "a b c a"), (2L, "a c"), (3L, "c b a"), (4L, "b b b")
    ).toDF("doc_id", "text")
    val got = graft.operators.Relevance
      .booleanRetrieve(docs, "doc_id", "text", Seq("a", "b"))
      .as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  // ── distribution-matching resample ──────────────────────────────────────

  test("matchDistribution keeps the binding stratum whole, others at rate") {
    val df = ((1L to 100L).map(i => (i, "x")) ++
      (101L to 150L).map(i => (i, "y"))).toDF("k", "g")
    val kept = graft.operators.Sampling.matchDistribution(df, "k", "g",
        "t6", Seq("x" -> 1L, "y" -> 1L))
      .groupBy("g").count().as[(String, Long)].collect().toMap
    // y (50 rows) binds a 1:1 target → kept whole; x downsamples to ~50
    assert(kept("y") == 50L, s"binding stratum lost rows: $kept")
    assert(kept("x") > 25L && kept("x") < 75L, s"x rate off: $kept")
    // deterministic: same input → same kept set
    val again = graft.operators.Sampling.matchDistribution(df, "k", "g",
        "t6", Seq("x" -> 1L, "y" -> 1L))
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(again == kept)
  }

  test("matchDistribution rejects empty strata and bad weights") {
    val df = Seq((1L, "x")).toDF("k", "g")
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.matchDistribution(df, "k", "g", "s",
        Seq("x" -> 1L, "missing" -> 1L))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.matchDistribution(df, "k", "g", "s",
        Seq("x" -> 0L))
    }
  }

  test("cmsMerge of partition sketches equals the whole-corpus sketch") {
    val part1 = Seq("a", "a", "b").toDF("k")
    val part2 = Seq("a", "c", "c").toDF("k")
    val whole = part1.unionByName(part2)
    val merged = Sketches.cmsMerge(Seq(
        Sketches.cmsSketch(part1, "k", d = 4, width = 64),
        Sketches.cmsSketch(part2, "k", d = 4, width = 64)))
      .orderBy("r", "bucket")
      .as[(Int, Long, Long)].collect().toSeq
    val direct = Sketches.cmsSketch(whole, "k", d = 4, width = 64)
      .orderBy("r", "bucket")
      .as[(Int, Long, Long)].collect().toSeq
    assert(merged == direct)
  }
}
