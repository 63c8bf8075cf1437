package graft

import org.apache.spark.sql.functions._
import graft.operators.{Packing, Sampling, TextAnalysis, TextDedup}

/** Round-8 operator specs: the greedy subword tokenizer (vocabulary
  * learning + longest-match walk), the DSIR importance-weight model,
  * the packing plan's tokenizer seam, pairwise aligned shared runs, and
  * the curriculum interleave — hand-computed expectations, independent
  * of the DuckDB gate. */
class Round8OperatorsSpec extends SparkSpec {
  import spark.implicits._

  // ── greedy subword tokenization ─────────────────────────────────────────

  test("greedyTokenCountCol walks longest-match with single-char fallback") {
    val vocab = Seq("ab", "abc", "cd")
    val cases = Seq(
      ("abcd", 2),  // abc (longest at pos 1) + d (fallback)
      ("abab", 2),  // ab + ab
      ("cdab", 2),  // cd + ab
      ("x", 1),     // pure fallback
      ("xyz", 3),   // three fallbacks
      ("abcab", 2), // abc + ab
      ("aabc", 2)   // a (fallback) + abc
    )
    val got = cases.map(_._1).toDF("w")
      .select(col("w"),
        TextAnalysis.greedyTokenCountCol(col("w"), vocab).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    cases.foreach { case (w, n) =>
      assert(got(w) == n, s"'$w': expected $n tokens, got ${got(w)}")
    }
  }

  test("greedyTokenCountCol prefers the longest match, not vocab order") {
    // both "ab" and "abc" match at position 1 — maximal munch must take
    // "abc" regardless of the order the vocab list presents them in
    Seq(Seq("ab", "abc"), Seq("abc", "ab")).foreach { vocab =>
      val n = Seq("abcx").toDF("w")
        .select(TextAnalysis.greedyTokenCountCol(col("w"), vocab))
        .head().getInt(0)
      assert(n == 2, s"vocab $vocab: expected [abc][x], got $n tokens")
    }
  }

  test("greedyTokenCountCol: empty word counts 0, bad vocab rejected") {
    val n = Seq("ok").toDF("w")
      .select(TextAnalysis.greedyTokenCountCol(lit(""), Seq("ab")))
      .head().getInt(0)
    assert(n == 0)
    assertThrows[IllegalArgumentException] {
      TextAnalysis.greedyTokenCountCol(col("w"), Seq("a")) // 1-char entry
    }
    assertThrows[IllegalArgumentException] {
      TextAnalysis.greedyTokenCountCol(col("w"), Seq.empty)
    }
  }

  test("learnCharNgramVocab ranks by weighted frequency, ties by text") {
    // words: aaa (wc 2), bb (wc 1) → 2-grams: aa appears 2/word × wc 2
    // = 4, bb = 1; 3-gram aaa = 2. top-2 = [aa, aaa]
    val docs = Seq("aaa bb", "aaa").toDF("text")
    val vocab = TextAnalysis.learnCharNgramVocab(docs, "text", k = 2)
    assert(vocab == Seq("aa", "aaa"), s"got $vocab")
  }

  // ── DSIR importance weights ─────────────────────────────────────────────

  test("dsirLogWeights: target == raw corpus gives logw 0 everywhere") {
    // when the target IS the raw distribution, every bucket's ratio is
    // exactly 1 and ln(1) = 0 — the calibration identity
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "zeta eta theta iota")).toDF("doc_id", "text")
    val lw = Sampling.dsirLogWeights(docs, "doc_id", "text", lit(true))
      .collect()
    assert(lw.length == 3)
    lw.foreach { r =>
      assert(r.getDecimal(2).compareTo(java.math.BigDecimal.ZERO) == 0,
        s"doc ${r.getLong(0)}: expected logw 0, got ${r.getDecimal(2)}")
    }
  }

  test("dsirLogWeights scores target-like documents above raw-only ones") {
    val docs = (1L to 8L).map(i => (i, "tt uu vv")) ++
      (9L to 16L).map(i => (i, "rr ss qq"))
    val df = docs.toDF("doc_id", "text")
    val lw = Sampling.dsirLogWeights(df, "doc_id", "text",
        col("doc_id") <= 8L)
      .collect().map(r => r.getLong(0) -> r.getDecimal(2)).toMap
    // all target docs share one text, all raw-only docs another; every
    // target doc must outscore every raw-only doc
    val tgtMin = (1L to 8L).map(lw).min
    val rawMax = (9L to 16L).map(lw).max
    assert(tgtMin.compareTo(rawMax) > 0,
      s"target min $tgtMin must exceed raw-only max $rawMax")
  }

  test("dsirLogWeights counts words and skips wordless docs") {
    val docs = Seq((1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    val lw = Sampling.dsirLogWeights(docs, "doc_id", "text", lit(true))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lw == Map(1L -> 3L), s"got $lw")
  }

  // ── packing tokenizer seam ──────────────────────────────────────────────

  test("packPlan tokenCount override rescales the packed stream") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f")).toDF("doc_id", "text")
    val ws = Packing.packPlan(docs, "doc_id", "text", ctxLen = 4)
      .orderBy("doc_id")
      .select("n_tokens", "start_tok").as[(Long, Long)].collect().toSeq
    assert(ws == Seq((3L, 0L), (2L, 3L), (1L, 5L)))
    // a tokenizer that doubles every count shifts starts and chunk cuts
    val dbl = Packing.packPlan(docs, "doc_id", "text", ctxLen = 4,
        tokenCount = Some(size(split(col("text"), " ")) * 2))
      .orderBy("doc_id")
      .select("n_tokens", "start_tok", "n_chunks")
      .as[(Long, Long, Long)].collect().toSeq
    assert(dbl == Seq((6L, 0L, 2L), (4L, 6L, 2L), (2L, 10L, 1L)))
  }

  // ── aligned shared runs ─────────────────────────────────────────────────

  test("alignedSharedRuns finds the maximal run at the right offsets") {
    // docs 1 and 2 share "c d e f g h i j" (8 tokens) at offsets 2 / 0;
    // doc 3 shares nothing 8 tokens long
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "c d e f g h i j x y"),
      (3L, "c d e f g z z z z z")).toDF("doc_id", "text")
    val runs = TextDedup.alignedSharedRuns(docs, "doc_id", "text",
        w = 3, gramCap = 64, minTokens = 8)
      .select("d1", "d2", "start1", "start2", "n_tokens", "n_grams")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(runs == Seq((1L, 2L, 2L, 0L, 8L, 6L)), s"got $runs")
  }

  test("alignedSharedRuns reports every alignment of a repeated block") {
    // the shared block appears TWICE in doc 2 → two diagonals, two runs
    val docs = Seq(
      (1L, "p q r s t u"),
      (2L, "p q r s t u z p q r s t u")).toDF("doc_id", "text")
    val runs = TextDedup.alignedSharedRuns(docs, "doc_id", "text",
        w = 3, gramCap = 64, minTokens = 6)
      .select("start1", "start2", "n_tokens")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(runs == Seq((0L, 0L, 6L), (0L, 7L, 6L)), s"got $runs")
  }

  test("alignedSharedRuns: hot grams past gramCap are excluded by rule") {
    // the same 4-token text in 9 docs → every gram occurs 9 times; with
    // gramCap = 8 all grams are excluded and no runs survive, with
    // gramCap = 9 all C(9,2) pairs report the full 4-token run
    val docs = (1L to 9L).map(i => (i, "m n o p")).toDF("doc_id", "text")
    def n(cap: Int) = TextDedup.alignedSharedRuns(docs, "doc_id", "text",
      w = 3, gramCap = cap, minTokens = 4).count()
    assert(n(8) == 0L)
    assert(n(9) == 36L)
  }

  // ── curriculum interleave ───────────────────────────────────────────────

  test("curriculumInterleave is best-first within group, round-robin across") {
    // src a: ids 1,2,3 scores 30,20,10; src b: ids 4,5 scores 25,5 →
    // order: rank1 (a:1, b:4), rank2 (a:2, b:5), rank3 (a:3)
    val docs = Seq(
      (1L, "a", 30L), (2L, "a", 20L), (3L, "a", 10L),
      (4L, "b", 25L), (5L, "b", 5L)).toDF("doc_id", "src", "score")
    val got = Packing.curriculumInterleave(docs, "doc_id", "src", col("score"))
      .orderBy("global_pos")
      .select("doc_id", "rank_in_group", "global_pos")
      .as[(Long, Int, Long)].collect().toSeq
    assert(got == Seq((1L, 1, 1L), (4L, 1, 2L), (2L, 2, 3L),
      (5L, 2, 4L), (3L, 3, 5L)), s"got $got")
  }

  test("curriculumInterleave breaks score ties by id, groups by name") {
    val docs = Seq(
      (2L, "b", 10L), (1L, "b", 10L), (3L, "a", 10L)).toDF("doc_id", "src", "score")
    val got = Packing.curriculumInterleave(docs, "doc_id", "src", col("score"))
      .orderBy("global_pos")
      .select("doc_id").as[Long].collect().toSeq
    // rank1: a:3 then b:1 (id-asc tie), rank2: b:2
    assert(got == Seq(3L, 1L, 2L), s"got $got")
  }
}
