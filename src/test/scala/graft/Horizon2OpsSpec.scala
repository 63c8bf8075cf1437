package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextAnalysis, VectorAggs}

class Horizon2OpsSpec extends SparkSpec {
  import spark.implicits._

  // ── BPE merge training ──────────────────────────────────────────────────

  test("learnBpeMerges: frequency-weighted argmax, then exhaustion") {
    // words: "aa"×2, "ab"×1 → pair (a,a) count 2 wins, then (a,b);
    // after both merges no adjacent pairs remain → only 2 rules emitted
    val docs = Seq((1L, "aa ab"), (2L, "aa")).toDF("doc_id", "text")
    val got = TextAnalysis.learnBpeMerges(docs, "text", nMerges = 5)
      .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", "a", 2L), (2L, "a", "b", 1L)))
  }

  test("learnBpeMerges: left-to-right non-overlapping merge application") {
    // "aaaa" → pairs (a,a)×3 → merge (a,a) → "aa aa" → next round the
    // top pair is (aa,aa) with count 1
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = TextAnalysis.learnBpeMerges(docs, "text", nMerges = 2)
      .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)))
  }

  // ── priority sampling ───────────────────────────────────────────────────

  test("prioritySample: n <= k keeps everything at its own weight") {
    val df = (1L to 5L).map(i => (i, i * 100L)).toDF("id", "wt")
    val got = Sampling.prioritySample(df, "id", "wt", "s", k = 10)
      .select("id", "w", "ht_num", "ht_den", "ht_micro")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == 5)
    got.foreach { case (_, w, hn, hd, hm) =>
      assert(hn == w && hd == 1L && hm == w * 1000000L)
    }
  }

  test("prioritySample: HT weight is max(w, tau) — never below w") {
    val df = (1L to 200L).map(i => (i, 1L + i % 7)).toDF("id", "wt")
    val got = Sampling.prioritySample(df, "id", "wt", "salt", k = 20)
      .select("rn", "w", "ht_num", "ht_den")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 20)
    assert(got.map(_._1).sorted.toSeq == (1L to 20L))
    got.foreach { case (_, w, hn, hd) =>
      // ht = hn/hd >= w, exact cross-multiplied
      assert(BigInt(hn) >= BigInt(w) * hd)
      // and if ht > w it must equal tau (same rational for all such rows)
    }
    val taus = got.filter { case (_, w, hn, hd) =>
      BigInt(hn) != BigInt(w) * hd
    }.map { case (_, _, hn, hd) => (hn, hd) }.distinct
    assert(taus.length <= 1)
  }

  // ── facility-location greedy ────────────────────────────────────────────

  test("facilityLocationGreedy: hand-computed 2-candidate coverage") {
    // candidates v0=(1,0), v1=(0,1); corpus adds v2=(0.6,0.8), v3=(1,0)
    // round 1: gain(v0)=1+0+0.6+1=2.6 beats gain(v1)=1.8 → pick v0
    // round 2: gain(v1)=0+1+0.2+0=1.2 → pick v1
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.6f, 0.8f)), (3L, Seq(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = VectorAggs.facilityLocationGreedy(df, "vec_id", "embedding",
        col("vec_id") < 2, k = 2)
      .orderBy("sel_rank")
      .select(col("sel_rank"), col("vec_id"), col("gain_micro"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 2600000L), (2L, 1L, 1200000L)))
  }

  test("facilityLocationGreedy: second pick ignores already-covered mass") {
    // one candidate dominates; picking it twice is impossible (anti-join)
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = VectorAggs.facilityLocationGreedy(df, "vec_id", "embedding",
        col("vec_id") < 2, k = 2)
      .orderBy("sel_rank").select("sel_rank", "vec_id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 1L)))
  }

  // ── confident-learning joint ────────────────────────────────────────────

  test("confidentJoint: mislabeled doc lands in the off-diagonal cell") {
    import graft.operators.Classify
    // two clean A docs, two clean B docs, one B-looking doc labeled A:
    // t_A = mean(2e12, 2e12, 1e12); t_B = 3e12 → the mislabeled doc
    // qualifies only for B → C[A][B] = 1
    val docs = Seq(
      (1L, "x x x", "A"), (2L, "x x x", "A"), (3L, "y y y", "A"),
      (4L, "y y y", "B"), (5L, "y y y", "B")
    ).toDF("doc_id", "text", "lang")
    val got = Classify.confidentJoint(docs, "doc_id", "text", "lang",
        Seq("A", "B"))
      .orderBy("lang", "predicted")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("A", "A", 2L, 3L), ("A", "B", 1L, 3L),
      ("B", "B", 2L, 2L)))
  }

  // ── BPE fertility ───────────────────────────────────────────────────────

  test("bpeFertility: unserved language segments into more pieces") {
    import graft.operators.TextAnalysis
    // merge budget 1: (a,b) count 3 wins; lang bb's "cd" stays split
    val docs = Seq(
      (1L, "ab ab ab", "aa"), (2L, "cd", "bb")
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.bpeFertility(docs, "text", "lang", nMerges = 1)
      .orderBy("lang")
      .select("lang", "n_words", "n_subwords", "fertility_micro")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("aa", 3L, 3L, 1000000L), ("bb", 1L, 2L, 2000000L)))
  }

  // ── IPF raking ──────────────────────────────────────────────────────────

  test("ipfRake: hand-computed 2x2 fixed-point sweep") {
    // counts [[2,2],[3,1]]: rows already balanced (mass 4e6 each), so
    // sweep 1's row step is identity; col step: c1 mass 5e6 -> 800000,
    // c2 mass 3e6 -> 1333333 (half-away)
    val rows =
      Seq.fill(2)(("r1", "c1")) ++ Seq.fill(2)(("r1", "c2")) ++
      Seq.fill(3)(("r2", "c1")) ++ Seq.fill(1)(("r2", "c2"))
    val df = rows.toDF("lang", "source")
    val got = Sampling.ipfRake(df, "lang", "source", sweeps = 1)
      .select("lang", "source", "n_docs", "w_ppm")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("r1", "c1", 2L, 800000L), ("r1", "c2", 2L, 1333333L),
      ("r2", "c1", 3L, 800000L), ("r2", "c2", 1L, 1333333L)))
  }

  test("ipfRake converges both marginals toward the uniform target") {
    val rows = (1 to 240).map { i =>
      (s"r${i % 3}", s"c${(i * 7) % 4}")
    }
    val df = rows.toDF("lang", "source")
    val out = Sampling.ipfRake(df, "lang", "source", sweeps = 4)
      .select("lang", "source", "n_docs", "w_ppm")
      .as[(String, String, Long, Long)].collect()
    val n = out.map(_._3).sum
    def masses(key: ((String, String, Long, Long)) => String) =
      out.groupBy(key).values.map(_.map(r => r._3 * r._4).sum).toSeq
    val rowTarget = n.toDouble / 3 * 1e6
    val colTarget = n.toDouble / 4 * 1e6
    masses(_._1).foreach(m =>
      assert(math.abs(m - rowTarget) / rowTarget < 0.001, s"row mass $m"))
    masses(_._2).foreach(m =>
      assert(math.abs(m - colTarget) / colTarget < 0.001, s"col mass $m"))
  }

  // ── AMS F2 sketch ───────────────────────────────────────────────────────

  test("amsF2: single-key stratum is estimated exactly; counts exact") {
    import graft.operators.Sketches
    // stratum A: one key repeated 7 times -> Z_j = ±7, Z² = 49 = F2
    // stratum B: keys {1,2,3} once each -> F2 = 3
    val df = (Seq.fill(7)(("A", 1L)) ++
      Seq(("B", 1L), ("B", 2L), ("B", 3L))).toDF("stratum", "user_id")
    val got = Sketches.amsF2(df, "stratum", "user_id", k = 8)
      .orderBy("stratum")
      .select(col("stratum"), col("n_rows"),
        col("f2_exact").cast("long"), col("n_sketches"),
        col("f2_est_micro"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val a = got.head
    assert(a == (("A", 7L, 49L, 8L, 49000000L)))
    val b = got(1)
    assert(b._2 == 3L && b._3 == 3L && b._4 == 8L && b._5 >= 0L)
  }
}
