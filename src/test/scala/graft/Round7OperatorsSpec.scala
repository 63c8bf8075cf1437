package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JaroWinkler
import graft.operators.{Graph, Histogram}

/** Round-7 hardening specs: the two-phase (large-star/small-star)
  * connected-components variant, degree-oriented triangle counting,
  * code-point Jaro–Winkler, and the strengthened histogram/weight
  * guards — hand-computed expectations, independent of the DuckDB gate. */
class Round7OperatorsSpec extends SparkSpec {
  import spark.implicits._

  // ── two-phase connected components ──────────────────────────────────────

  test("two-phase CC matches hashmin on chains, islands, and self-loops") {
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), // chain 1-2-3-4
      (10L, 11L),                   // island pair
      (7L, 7L)                      // self-loop-only node
    ).toDF("d1", "d2")
    val hm = Graph.connectedComponents(edges, "d1", "d2")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val tp = Graph.connectedComponents(edges, "d1", "d2",
        algorithm = "two-phase")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(hm == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (7L, 7L), (10L, 10L), (11L, 10L)))
    assert(tp == hm)
  }

  test("two-phase CC closes a 10^4-node path in ~log rounds, not diameter") {
    // the adversarial case for HashMin: diameter 9999 — its 25-round
    // default budget throws, while the alternating algorithm closes the
    // whole path well inside the Kiveris O(log² n) bound
    val n = 10000
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("d1", "d2")
    assertThrows[IllegalStateException] {
      Graph.connectedComponents(edges, "d1", "d2") // HashMin, 25 rounds
    }
    val bound = { // ⌈log₂ n⌉²
      val l = math.ceil(math.log(n.toDouble) / math.log(2.0)).toInt
      l * l
    }
    val (labels, rounds) = Graph.connectedComponentsWithRounds(
      edges, "d1", "d2", maxIters = bound, algorithm = "two-phase")
    assert(rounds <= bound, s"took $rounds rounds, bound $bound")
    assert(rounds < 30, s"expected ~log₂(10⁴)≈14 rounds, got $rounds")
    val comps = labels.select("component").distinct().as[Long].collect()
    assert(comps.toSeq == Seq(1L), s"one component expected: ${comps.toSeq}")
    assert(labels.count() == n.toLong)
  }

  test("two-phase CC of an empty edge list is empty; unknown algorithm rejected") {
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Graph.connectedComponents(empty, "d1", "d2",
      algorithm = "two-phase").count() == 0)
    assertThrows[IllegalArgumentException] {
      Graph.connectedComponents(empty, "d1", "d2", algorithm = "nope")
    }
  }

  // ── degree-oriented triangle counting ───────────────────────────────────

  test("triangleCounts: degree orientation returns identical counts on a wheel") {
    // wheel: hub 0 (the LOW id, worst case for id orientation) + rim
    // cycle 1..8 — every rim edge closes a triangle with the hub
    val hub = (1 to 8).map(i => (0L, i.toLong))
    val rim = (1 to 8).map(i => (i.toLong, if (i == 8) 0L else i + 1L))
      .filter { case (a, b) => a != b && b != 0L } :+ (1L, 8L)
    // rim edges oriented src<dst per the dedup-pair convention
    val edges = (hub ++ rim.map { case (a, b) =>
      (math.min(a, b), math.max(a, b)) }).distinct.toDF("d1", "d2")
    val byId = Graph.triangleCounts(edges, "d1", "d2")
      .orderBy("node").as[(Long, Long, Long, Option[Double])].collect().toSeq
    val byDeg = Graph.triangleCounts(edges, "d1", "d2",
        orientByDegree = true)
      .orderBy("node").as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(byId == byDeg, "orientation must not change counts")
    val hubRow = byId.find(_._1 == 0L).get
    assert(hubRow._2 == 8L && hubRow._3 == 8L,
      s"hub: degree 8, 8 triangles, got $hubRow")
  }

  test("triangleCounts degree orientation bounds the hub's 2-path fan-out") {
    // star K(1,40), center id 0: no triangles either way, but the 2-path
    // candidate volume differs — id orientation fans the low-id hub out
    // to C(40,2) candidate 2-paths, degree orientation to ZERO (every
    // edge points leaf→hub, so no node has out-degree ≥ 2). Candidates
    // are re-derived here with the operator's documented orientation
    // rule; the operator itself must return all-zero triangle counts.
    val n = 40
    val edges = (1 to n).map(i => (0L, i.toLong)).toDF("d1", "d2")
    val got = Graph.triangleCounts(edges, "d1", "d2", orientByDegree = true)
    assert(got.filter(col("n_triangles") =!= 0L).count() == 0)
    assert(got.count() == (n + 1).toLong)
    def candidates(e: Seq[(Long, Long)]): Long = {
      val out = e.groupBy(_._1).map { case (_, es) => es.size.toLong }
      out.map(d => d * (d - 1) / 2).sum
    }
    val idOriented = (1 to n).map(i => (0L, i.toLong))
    // degree rule: degree(0)=n, degree(leaf)=1 → every edge leaf→hub
    val degOriented = (1 to n).map(i => (i.toLong, 0L))
    assert(candidates(idOriented) == n.toLong * (n - 1) / 2)
    assert(candidates(degOriented) == 0L)
  }

  // ── code-point Jaro–Winkler ─────────────────────────────────────────────

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro-winkler counts astral characters as one symbol") {
    // code points: |ab😀| = 3 → window 0, only the emoji matches in
    // place → jaro = (1/3 + 1/3 + 1)/3. (A UTF-16 code-unit
    // implementation sees length 4, window 1, and scores the a/b
    // transposition — a different number entirely.)
    assert(math.abs(jw("ab😀", "ba😀")
      - (1.0 / 3 + 1.0 / 3 + 1.0) / 3) < 1e-12)
    // prefix bonus counts the emoji once: |😀abc| = 4 code points,
    // m = 3, prefix ℓ = 3 → 5/6 + 3·0.1·(1 − 5/6)
    assert(math.abs(jw("😀abc", "😀abd")
      - (5.0 / 6 + 0.3 * (1.0 / 6))) < 1e-12)
    // identical astral strings are still exactly 1
    assert(jw("😀😁", "😀😁") == 1.0)
  }

  // ── strengthened guards ─────────────────────────────────────────────────

  test("quantizedPercentiles guards the TOP bucket's upper-edge dequantization") {
    // bits=1: top=1, so (mx−mn)·top fits int64 but the upper edge of the
    // top bucket computes (top+1)·(mx−mn) = 2·(mx−mn), which would wrap
    val big = Long.MaxValue / 2 + 1
    val df = Seq(0L, big).toDF("v").withColumn("s", lit("x"))
    val err = intercept[IllegalArgumentException] {
      Histogram.quantizedPercentiles(df, "v", "s", bits = 1, pcts = Seq(50))
    }
    assert(err.getMessage.contains("overflows int64"))
  }

  test("weightedQuantizedPercentiles raises on NULL and non-positive weights") {
    val nullW = Seq((1L, Some(2L)), (2L, None))
      .toDF("v", "w").withColumn("s", lit("x"))
    val e1 = intercept[Exception] {
      Histogram.weightedQuantizedPercentiles(nullW, "v", "w", "s",
        bits = 4, pcts = Seq(50)).collect()
    }
    assert(e1.getMessage.contains("integral"))
    val zeroW = Seq((1L, 2L), (2L, 0L)).toDF("v", "w")
      .withColumn("s", lit("x"))
    val e2 = intercept[Exception] {
      Histogram.weightedQuantizedPercentiles(zeroW, "v", "w", "s",
        bits = 4, pcts = Seq(50)).collect()
    }
    assert(e2.getMessage.contains("integral"))
    // a fractional weight in (0, 1) passes `> 0` but truncates to 0 in
    // the Long-cast sum — the guard must reject it, not let it recreate
    // the non-monotone hazard
    val fracW = Seq((1L, 0.4), (2L, 1.0)).toDF("v", "w")
      .withColumn("s", lit("x"))
    val e3 = intercept[Exception] {
      Histogram.weightedQuantizedPercentiles(fracW, "v", "w", "s",
        bits = 4, pcts = Seq(50)).collect()
    }
    assert(e3.getMessage.contains("integral"))
    // and 1.5 would silently count as 1 — rejected too
    val mixW = Seq((1L, 1.5), (2L, 1.0)).toDF("v", "w")
      .withColumn("s", lit("x"))
    val e4 = intercept[Exception] {
      Histogram.weightedQuantizedPercentiles(mixW, "v", "w", "s",
        bits = 4, pcts = Seq(50)).collect()
    }
    assert(e4.getMessage.contains("integral"))
    // integral DOUBLE weights are fine (the contract is integral, not
    // integer-typed)
    val dblOk = Seq((1L, 3.0), (9L, 1.0)).toDF("v", "w")
      .withColumn("s", lit("x"))
    assert(Histogram.weightedQuantizedPercentiles(dblOk, "v", "w", "s",
      bits = 4, pcts = Seq(50)).count() == 1)
    // valid weights still work: weight-3 value 1 vs weight-1 value 9
    // → median is value 1's bucket
    val ok = Seq((1L, 3L), (9L, 1L)).toDF("v", "w")
      .withColumn("s", lit("x"))
    val got = Histogram.weightedQuantizedPercentiles(ok, "v", "w", "s",
      bits = 4, pcts = Seq(50))
    assert(got.count() == 1 && got.head().getAs[Long]("lo") <= 1L)
  }
}
