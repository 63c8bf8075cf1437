package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunking, Graph, Relevance, Sampling, TextAnalysis, VectorAggs}

/** Targeted specs for the round-4 operators (dup clusters, TF-IDF, BM25,
  * repetition quality, stratified sampling) — hand-computed expectations
  * on crafted inputs, independent of the DuckDB gate. */
class Round4OperatorsSpec extends SparkSpec {
  import spark.implicits._

  // ── connected components ────────────────────────────────────────────────

  test("connectedComponents closes a chain and keeps islands apart") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("d1", "d2")
    val got = Graph.connectedComponents(edges, "d1", "d2")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents is direction-agnostic (min label via either end)") {
    // edges point away from the min node: labels must still flow back
    val edges = Seq((5L, 1L), (5L, 9L), (9L, 7L)).toDF("a", "b")
    val got = Graph.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 5L -> 1L, 7L -> 1L, 9L -> 1L))
  }

  test("connectedComponents of an empty edge list is empty") {
    val edges = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Graph.connectedComponents(edges, "d1", "d2").count() == 0)
  }

  test("connectedComponents with reliable checkpointing matches local mode") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    try {
      spark.sparkContext.setCheckpointDir(dir.toString)
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
        .toDF("d1", "d2")
      val got = Graph.connectedComponents(edges, "d1", "d2",
          reliable = true, checkpointInterval = 1)
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }

  test("connectedComponents refuses reliable mode without a checkpoint dir") {
    // fresh session context may have a dir set by the previous test; only
    // meaningful when unset — guard so suite order can't flake this.
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      val edges = Seq((1L, 2L)).toDF("d1", "d2")
      intercept[IllegalArgumentException] {
        Graph.connectedComponents(edges, "d1", "d2", reliable = true)
      }
    }
  }

  test("connectedComponents throws instead of returning unconverged labels") {
    // a 5-chain needs >1 round; maxIters=1 must fail loudly, not ship
    // a partially-propagated labeling
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("d1", "d2")
    intercept[IllegalStateException] {
      Graph.connectedComponents(edges, "d1", "d2", maxIters = 1)
    }
  }

  // ── repetition quality ──────────────────────────────────────────────────

  test("repetitionStats computes hand-checked signals") {
    val docs = Seq(
      (1L, "a a b c"),          // 4 words, 3 distinct, top a(2), no dup bigram
      (2L, "x y x y x y")       // 6 words, 2 distinct, tie x/y(3) -> x
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Int, Double, String, Double, Double)].collect()
    assert(got(0) == ((1L, 4, 0.75, "a", 0.5, 0.0)))
    // bigrams of doc 2: xy yx xy yx xy -> 5 total, 2 distinct -> 0.6 dup
    assert(got(1) == ((2L, 6, 0.333333, "x", 0.5, 0.6)))
  }

  // ── TF-IDF ──────────────────────────────────────────────────────────────

  test("tfidfTopK matches a hand-computed corpus") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = Relevance.tfidfTopK(docs, "doc_id", "text", k = 3)
      .orderBy(col("doc_id"), col("tfidf").desc, col("term"))
      .as[(Long, String, Long, Long, Double)].collect()
    val lnHalf3 = BigDecimal(2.0 * math.log(3.0 / 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln3over2 = BigDecimal(math.log(3.0 / 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // df(a)=1, df(b)=2, df(c)=1; N=2 -> idf(b)=ln(3/3)=0
    assert(got.toSeq == Seq(
      (1L, "a", 2L, 1L, lnHalf3),
      (1L, "b", 1L, 2L, 0.0),
      (2L, "c", 1L, 1L, ln3over2),
      (2L, "b", 1L, 2L, 0.0)))
  }

  // ── BM25 ────────────────────────────────────────────────────────────────

  test("bm25TopK ranks matching docs and drops non-matching ones") {
    val docs = Seq(
      (1L, "spark join vector spark"), // all three terms, spark twice
      (2L, "spark row column value"),  // one term
      (3L, "row column value table")   // no query terms
    ).toDF("doc_id", "text")
    val got = Relevance.bm25TopK(docs, "doc_id", "text",
        Seq("vector", "join", "spark"), k = 10)
      .as[(Long, Double, Long)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L)) // 3 absent, 1 above 2
    assert(got(0)._3 == 3L && got(1)._3 == 1L) // matched-term counts
    assert(got(0)._2 > got(1)._2)
  }

  // ── stratified sampling ─────────────────────────────────────────────────

  test("stratifiedSample applies per-stratum bounds and is repartition-stable") {
    val rows = (0L until 512L).map(i =>
      (i, if (i % 2 == 0) "en" else "zh")).toDF("id", "lang")
    val kept = Sampling.stratifiedSample(rows, "id", "lang", "s4",
      Seq("en" -> 0, "zh" -> 256), defaultBound = 128)
    // en bound 0 -> nothing; zh bound 256 -> everything
    assert(kept.filter($"lang" === "en").count() == 0)
    assert(kept.filter($"lang" === "zh").count() == 256)
    val ids1 = kept.select("id").as[Long].collect().sorted.toSeq
    val ids2 = Sampling.stratifiedSample(rows.repartition(7), "id", "lang",
        "s4", Seq("en" -> 0, "zh" -> 256), defaultBound = 128)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }

  // ── content-defined chunking ────────────────────────────────────────────

  test("chunks splits after boundary words and is content-defined") {
    // find a word whose md5 starts with '0' to use as a boundary
    val boundary = Iterator.from(0).map(i => s"w$i").find { s =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(1).exists(b => (b & 0xf0) == 0)
    }.get
    val docs = Seq(
      (1L, s"aa bb $boundary cc dd"),      // 2 chunks: [aa bb B], [cc dd]
      (2L, s"zz aa bb $boundary cc dd")    // prefix insertion: 2nd chunk same
    ).toDF("doc_id", "text")
    val ch = Chunking.chunks(docs, "doc_id", "text")
    val byDoc = ch.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(byDoc == Map(1L -> 2L, 2L -> 2L))
    // the post-boundary chunk hash is identical across both docs (CDC
    // robustness: a fixed-width window would have shifted)
    val shared = ch.groupBy("chunk_md5")
      .agg(countDistinct($"doc_id").as("nd"))
      .filter($"nd" === 2).count()
    assert(shared == 1)
    val stats = Chunking.sharedChunkStats(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(stats.toSeq == Seq((1L, 2L, 1L), (2L, 2L, 1L)))
  }

  // ── SQ8 scalar quantization ─────────────────────────────────────────────

  test("sq8Codes maps corpus min/max to 0/255 and constant dims to 0") {
    val vecs = Seq(
      (1L, Array(0.0f, 2.0f, 7.0f)),
      (2L, Array(1.0f, 2.0f, 3.0f)),
      (3L, Array(0.5f, 2.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val got = VectorAggs.sq8Codes(vecs, "vec_id", "embedding")
      .orderBy("vec_id").as[(Long, Seq[Long])].collect()
    // dim0 range [0,1]: 0->0, 1->255, 0.5->127 (floor); dim1 constant -> 0
    // dim2 range [3,7]: 7->255, 3->0, 5->floor(127.5)=127
    assert(got.toSeq == Seq(
      (1L, Seq(0L, 0L, 255L)),
      (2L, Seq(255L, 0L, 0L)),
      (3L, Seq(127L, 0L, 127L))))
  }

  test("stratifiedSample default bound covers unlisted strata at ≈rate") {
    val rows = (0L until 1024L).map(i => (i, "fr")).toDF("id", "lang")
    val n = Sampling.stratifiedSample(rows, "id", "lang", "s4",
      Seq("en" -> 0), defaultBound = 128).count()
    assert(n > 400 && n < 624, s"expected ≈512 kept, got $n") // 128/256 = 50%
  }
}
