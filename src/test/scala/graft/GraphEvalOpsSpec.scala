package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Sketches, Standardize}

/** Targeted specs for the round-6 graph/eval/join-pruning operators
  * (PageRank, KS drift, Bloom pruning, grouped AUC) — hand-computed
  * expectations on crafted inputs, independent of the DuckDB gate. */
class GraphEvalOpsSpec extends SparkSpec {
  import spark.implicits._

  // ── PageRank ────────────────────────────────────────────────────────────

  test("pageRank: one hand-computed iteration on the path graph 1—2—3") {
    // S=10^12, N=3: pr0 = 333333333333 each; deg = (1,2,1)
    // in(1) = in(3) = pr0 div 2 = 166666666666; in(2) = 2·pr0
    // base = 3·S div 60 = 50000000000
    // pr1(1) = base + (17·166666666666) div 20 = 191666666666
    // pr1(2) = base + (17·666666666666) div 20 = 616666666666
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2")
    val got = Graph.pageRank(pairs, "d1", "d2", iters = 1)
      .orderBy("node").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 191666666666L),
      (2L, 2L, 616666666666L),
      (3L, 1L, 191666666666L)))
  }

  test("pageRank conserves mass up to flooring and keeps symmetry") {
    // 4-clique: symmetric, so all ranks equal and sum ≈ S
    val pairs = (for (i <- 1 to 4; j <- i + 1 to 4) yield (i.toLong, j.toLong))
      .toDF("d1", "d2")
    val got = Graph.pageRank(pairs, "d1", "d2", iters = 3)
      .select("pr_scaled").as[Long].collect().toSeq
    assert(got.distinct.size == 1, s"clique ranks should be equal: $got")
    val total = got.sum
    assert(total <= 1000000000000L && total > 999999999000L,
      s"mass $total drifted from 10^12")
  }

  test("clusterMedoids picks the highest-summed-similarity member, min-id ties") {
    // triangle: node 2 has incident 0.9+0.8 = 1.7 → medoid;
    // isolated pair 10—11 ties at 0.6 → min id 10
    val pairs = Seq(
      (1L, 2L, 0.9), (2L, 3L, 0.8), (1L, 3L, 0.5),
      (10L, 11L, 0.6)
    ).toDF("d1", "d2", "jaccard")
    val got = Graph.clusterMedoids(pairs, "d1", "d2", "jaccard")
      .orderBy("component")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L, 1.7), (10L, 10L, 2L, 0.6)))
  }

  // ── KS drift ────────────────────────────────────────────────────────────

  test("ksDrift computes the exact D and its crossing value") {
    // a: {1,2}; baseline b: {2,4} → |cg·nb − cb·ng| is 2 at v=1 and v=2,
    // 0 at v=4; tie breaks to the larger value → D = 2/4 = 0.5 at v=2
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 4L)).toDF("g", "v")
    val got = Standardize.ksDrift(df, "v", "g", "b", Seq("a"))
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 2L, 2L, 2L, 0.5)))
  }

  test("ksDrift is 0 for identical distributions and rejects bad values") {
    val same = Seq(("a", 5L), ("a", 9L), ("b", 5L), ("b", 9L)).toDF("g", "v")
    val d = Standardize.ksDrift(same, "v", "g", "b", Seq("a"))
      .select("ks_stat").as[Double].head()
    assert(d == 0.0)
    val bad = Seq(("a", -1L), ("b", 1L)).toDF("g", "v")
    val err = intercept[Exception] {
      Standardize.ksDrift(bad, "v", "g", "b", Seq("a")).collect()
    }
    assert(err.getMessage.contains("out of"))
  }

  // ── Bloom pruning ───────────────────────────────────────────────────────

  test("bloomPrune admits every true key (no false negatives)") {
    val dim = (1L to 50L).toDF("k")
    val fact = (1L to 500L).toDF("k")
    val bits = Sketches.bloomBits(dim, "k", k = 3, mBits = 1024)
    val kept = Sketches.bloomPrune(fact, "k", bits, k = 3, mBits = 1024)
      .as[Long].collect().toSet
    (1L to 50L).foreach(k => assert(kept(k), s"true key $k was dropped"))
    // 150 of 1024 bits set → most of the 450 non-keys must die in the scan
    assert(kept.size < 200, s"bloom pruned nothing: ${kept.size} kept")
  }

  test("bloomPrune is a narrow filter — no join, no shuffle") {
    val dim = (1L to 10L).toDF("k")
    val fact = (1L to 100L).toDF("k")
    val bits = Sketches.bloomBits(dim, "k", k = 3, mBits = 256)
    val plan = Sketches.bloomPrune(fact, "k", bits, k = 3, mBits = 256)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"bloom probe planned a join:\n$plan")
    assert(!plan.contains("Exchange"), s"bloom probe shuffled:\n$plan")
  }

  // ── profile drift ───────────────────────────────────────────────────────

  test("profileDiff reports integer deltas per column") {
    val oldDf = Seq((1L, Some("a")), (2L, Some("b")), (3L, None))
      .toDF("id", "tag")
    val newDf = Seq((4L, Some("a")), (5L, None), (6L, None), (7L, Some("c")))
      .toDF("id", "tag")
    val got = graft.operators.Profiling.profileDiff(oldDf, newDf, Seq("tag"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // tag: rows 3→4 (+1), nulls 1→2 (+1), distinct 2→2 (0)
    assert(got == Seq(("tag", 3L, 4L, 1L, 1L, 2L, 1L, 2L, 2L, 0L)))
  }

  test("mutualInformation: dependence is ln2 per x, independence is 0") {
    // perfect dependence: knowing x pins y → H(Y|x) = 0 and each x
    // contributes (1/2)·ln 2 = 0.346574 of MI
    val dep = Seq(("a", 0), ("a", 0), ("b", 1), ("b", 1)).toDF("x", "y")
    val gotDep = graft.operators.Profiling.mutualInformation(dep, "x", "y")
      .orderBy("x").as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(gotDep == Seq(
      ("a", 2L, 1L, 0.0, 0.346574), ("b", 2L, 1L, 0.0, 0.346574)))
    // independence: H(Y|x) = ln 2 (two per-term-rounded halves), MI = 0
    val ind = Seq(("a", 0), ("a", 1), ("b", 0), ("b", 1)).toDF("x", "y")
    val gotInd = graft.operators.Profiling.mutualInformation(ind, "x", "y")
      .orderBy("x").as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(gotInd == Seq(
      ("a", 2L, 2L, 0.693148, 0.0), ("b", 2L, 2L, 0.693148, 0.0)))
  }

  // ── centroid drift ──────────────────────────────────────────────────────

  test("centroidDrift: identical halves cos 1, orthogonal halves cos 0") {
    val vecs = Seq(
      // label "s": both halves centroid (1, 0) → cos 1
      (0L, 0, "s", Seq(1.0f, 0.0f)), (1L, 1, "s", Seq(1.0f, 0.0f)),
      // label "o": half0 → (1, 0), half1 → (0, 1) → cos 0
      (2L, 0, "o", Seq(1.0f, 0.0f)), (3L, 1, "o", Seq(0.0f, 1.0f))
    ).toDF("vec_id", "half", "label", "embedding")
    val got = graft.operators.VectorAggs
      .centroidDrift(vecs, "label", "embedding", "half")
      .orderBy("label")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("o", 2L, 0.0), ("s", 2L, 1.0)))
  }

  // ── grouped AUC ─────────────────────────────────────────────────────────

  test("groupAuc matches the hand-computed Mann–Whitney value with ties") {
    // pos scores {2,3}, neg {1,2}: pairwise wins 3 + tie 0.5 → 3.5/4
    val df = Seq(("s", 2L, 1L), ("s", 3L, 1L), ("s", 1L, 0L), ("s", 2L, 0L))
      .toDF("g", "q", "pos")
    val got = Standardize.groupAuc(df, "q", "pos", "g")
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(("s", 4L, 2L, Some(0.875))))
  }

  test("groupAuc: perfect separation is 1.0, single-class is NULL") {
    val df = Seq(
      ("p", 10L, 1L), ("p", 11L, 1L), ("p", 1L, 0L), ("p", 2L, 0L),
      ("q", 5L, 1L), ("q", 6L, 1L)
    ).toDF("g", "q", "pos")
    val got = Standardize.groupAuc(df, "q", "pos", "g")
      .orderBy("g").as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(("p", 4L, 2L, Some(1.0)), ("q", 2L, 2L, None)))
  }
}
