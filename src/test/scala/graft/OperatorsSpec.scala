package graft

import org.apache.spark.sql.functions._
import graft.operators._

class LatestSnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("keeps exactly the latest row per key") {
    val df = Seq(
      ("a", 1, "old"), ("a", 3, "new"), ("a", 2, "mid"),
      ("b", 5, "only")).toDF("id", "v", "tag")
    val out = LatestSnapshot(df, Seq("id"), col("v")).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out === Map("a" -> "new", "b" -> "only"))
  }

  test("tiebreak makes equal-order winners deterministic") {
    val df = Seq(("a", 1, 10), ("a", 1, 20)).toDF("id", "v", "tb")
    val out = LatestSnapshot(df, Seq("id"), col("v"), Seq(col("tb")))
    assert(out.head().getInt(2) === 20)
  }

  test("topK keeps k rows per key in order") {
    val df = Seq(("a", 5), ("a", 3), ("a", 9), ("a", 1), ("b", 2))
      .toDF("id", "v")
    val out = LatestSnapshot.topK(df, Seq("id"), col("v").desc,
      Seq(col("v")), 2)
    assert(out.filter(col("id") === "a").collect().map(_.getInt(1)).sorted
      === Array(5, 9))
    assert(out.filter(col("id") === "b").count() === 1)
  }
}

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy cat today"), // near-dup of 1
    (3L, "completely different words appear within this unrelated document body"),
    (4L, "the quick brown fox jumps over the lazy dog today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("shingles: w-word windows, distinct") {
    val sh = TextDedup.shingles(docs.filter($"doc_id" === 1), "doc_id", "text")
    assert(sh.count() === 8) // 10 words → 8 trigrams, all distinct
    assert(sh.filter($"s" === "the quick brown").count() === 1)
  }

  test("short documents produce no shingles") {
    val short = Seq((9L, "two words")).toDF("doc_id", "text")
    assert(TextDedup.shingles(short, "doc_id", "text").count() === 0)
  }

  test("exact dedup keeps smallest id and counts copies") {
    val d = docs.withColumn("h", md5($"text"))
    val out = TextDedup.exactDedup(d, "doc_id", Seq("h"))
    assert(out.count() === 3)
    val dupRow = out.filter($"n_copies" === 2).head()
    assert(dupRow.getAs[Long]("doc_id") === 1L)
  }

  test("minhash LSH finds exact and near duplicates, with exact jaccard") {
    val pairs = TextDedup.minHashLshPairs(docs, "doc_id", "text",
      k = 16, r = 2, threshold = 0.3)
    val m = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((1L, 4L)) === 1.0)               // exact dup: jaccard 1
    assert(m.contains((1L, 2L)))              // near dup found
    assert(m((1L, 2L)) > 0.3 && m((1L, 2L)) < 1.0)
    assert(!m.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("text salt-split: hot exact-dup band buckets keep every pair") {
    // 6 verbatim copies + the near-dup + the unrelated doc: every band
    // bucket the copies share has 6 members, so maxBucket = 2 splits
    // each into m = 3 sub-buckets and the 3×3 block join must still
    // produce all C(6,2) = 15 exact-dup pairs plus the near-dup pairs —
    // identical to the uncapped path (ids AND jaccard)
    val many = docs.union(Seq(
      (5L, "the quick brown fox jumps over the lazy dog today"),
      (6L, "the quick brown fox jumps over the lazy dog today"),
      (7L, "the quick brown fox jumps over the lazy dog today"),
      (8L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text"))
    val uncapped = TextDedup.minHashLshPairs(many, "doc_id", "text",
        k = 16, r = 2, threshold = 0.3)
      .orderBy("d1", "d2").collect().toSeq
    val split = TextDedup.minHashLshPairs(many, "doc_id", "text",
        k = 16, r = 2, threshold = 0.3, maxBucket = Some(2L))
      .orderBy("d1", "d2").collect().toSeq
    assert(uncapped.count(r => r.getDouble(2) == 1.0) == 15)
    assert(split == uncapped)
  }

  test("text salt-split: inactive cap rides the plain path unchanged") {
    val uncapped = TextDedup.minHashLshPairs(docs, "doc_id", "text",
        k = 16, r = 2, threshold = 0.3)
      .orderBy("d1", "d2").collect().toSeq
    val split = TextDedup.minHashLshPairs(docs, "doc_id", "text",
        k = 16, r = 2, threshold = 0.3, maxBucket = Some(1000L))
      .orderBy("d1", "d2").collect().toSeq
    assert(split == uncapped && uncapped.nonEmpty)
  }

  test("hamming salt-split: dense pigeonhole buckets keep every pair") {
    import spark.implicits._
    // 12 identical hashes (every slice bucket holds all 12; cap = 3
    // splits each into m = 4) + near hashes + a far one: capped pairs
    // must equal uncapped exactly, including the hamming values
    val hashes = ((0L until 12L).map(i => (i, 0x0F0F0F0FL)) ++ Seq(
      (20L, 0x0F0F0F0EL), (21L, 0x0F0F0F1FL), (30L, 0x70F0F0F0L)))
      .toDF("doc_id", "h")
    val uncapped = TextDedup.hammingPairs(hashes, "doc_id", "h",
        bits = 32, bands = 4, maxDist = 3)
      .orderBy("d1", "d2").collect().toSeq
    val capped = TextDedup.hammingPairs(hashes, "doc_id", "h",
        bits = 32, bands = 4, maxDist = 3, maxBucket = Some(3L))
      .orderBy("d1", "d2").collect().toSeq
    // 12 identical → C(12,2)=66 zero-distance pairs, plus each of the
    // two near hashes pairs with all 12 and with each other
    assert(uncapped.count(_.get(2) == 0) == 66)
    assert(uncapped.size == 66 + 12 + 12 + 1)
    assert(capped == uncapped)
  }

  test("cap-split index: incremental dedup equals the uncapped index exactly") {
    // 4 verbatim copies indexed (every shared band bucket has 4 members;
    // cap = 1 splits each into m = 4) + the unrelated doc; the incoming
    // batch holds another copy and an unrelated doc — the block join
    // must find all 4 (new, old) pairs, identical to the uncapped index
    import spark.implicits._
    val indexed = Seq(
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (4L, "the quick brown fox jumps over the lazy dog today"),
      (6L, "the quick brown fox jumps over the lazy dog today"),
      (8L, "the quick brown fox jumps over the lazy dog today"),
      (10L, "completely different words appear within this unrelated document body")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "nothing here collides with anything stored in that index at all")
    ).toDF("doc_id", "text")
    val (b0, s0) = TextDedup.lshIndex(indexed, "doc_id", "text")
    val uncapped = TextDedup.dedupAgainstIndex(batch, "doc_id", "text",
        b0, s0, threshold = 0.5)
      .orderBy("d_new", "d_old").collect().toSeq
    val (b1, s1) = TextDedup.lshIndex(indexed, "doc_id", "text",
      maxBucket = Some(1L))
    val capped = TextDedup.dedupAgainstIndex(batch, "doc_id", "text",
        b1, s1, threshold = 0.5)
      .orderBy("d_new", "d_old").collect().toSeq
    assert(uncapped.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((1L, 2L), (1L, 4L), (1L, 6L), (1L, 8L)))
    assert(capped == uncapped)
  }

  test("ngram jaccard ground truth matches hand computation") {
    // doc1/doc2 differ in word 9 of 10 → trigram sets: 8 each, 6 shared
    // jaccard = 6 / (8 + 8 - 6) = 0.6
    val pairs = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
      threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) === 0.6)
  }

  test("simhash: identical docs equal, near-dups hamming-close, unrelated far") {
    val sigs = TextDedup.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sigs(1L) === sigs(4L))
    assert(hamming(sigs(1L), sigs(2L)) < hamming(sigs(1L), sigs(3L)))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)),  // opposite of 0
    (4L, Array(1.0f, 0.0f, 0.0f))    // identical to 0
  ).toDF("vec_id", "embedding")

  test("cosine: identical → 1, orthogonal → 0, opposite → -1") {
    val out = vecs.select($"vec_id",
      Similarity.cosine($"embedding",
        array(lit(1.0), lit(0.0), lit(0.0))).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(4L) - 1.0) < 1e-12)
    assert(math.abs(out(2L)) < 1e-12)
    assert(math.abs(out(3L) + 1.0) < 1e-12)
  }

  test("brute-force top-k ranks by similarity") {
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0), k = 3).collect().map(_.getLong(0))
    assert(top.take(2).toSet === Set(0L, 4L)) // both cosine 1.0
    assert(top(2) === 1L)
  }

  test("ANN LSH buckets colinear vectors together and finds them") {
    val out = Similarity.annTopK(vecs, "vec_id", "embedding",
      $"vec_id" === 0, k = 5, nPlanes = 4, dims = 3)
    val hits = out.collect().map(_.getAs[Long]("c_id")).toSet
    assert(hits.contains(4L)) // identical vector always shares the bucket
    assert(!hits.contains(3L)) // opposite vector flips every plane bit
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("language id picks the dominant stopword profile") {
    val docs = Seq(
      (1L, "the cat and the dog of to in house"),
      (2L, "el perro la casa de que los gatos"),
      (3L, "zzz qqq www")).toDF("doc_id", "text")
    val out = TextAnalysis.languageId(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "en", 2L -> "es", 3L -> "und"))
  }

  test("quality metrics compute exact ratios") {
    val docs = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(docs, "doc_id", "text").head()
    assert(r.getAs[Int]("n_chars") === 11)
    assert(r.getAs[Int]("n_words") === 3)
    assert(r.getAs[Double]("stopword_ratio") === 1.0 / 3)
    assert(r.getAs[Double]("alpha_ratio") === 9.0 / 11)
  }

  test("token counts: ws vs regex tokenization") {
    val docs = Seq((1L, "ab12 cd, x!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(docs, "doc_id", "text").head()
    assert(r.getAs[Int]("n_ws_tokens") === 3)
    // ab | 12 | cd | , | x | ! → 6
    assert(r.getAs[Int]("n_re_tokens") === 6)
  }

  test("fingerprint: content hash changes, min-shingle survives tail edit") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i CHANGED")).toDF("doc_id", "text")
    val out = TextAnalysis.fingerprint(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L)._1 !== out(2L)._1)
    // min over shared shingle windows often unchanged — both docs share
    // 6 of their 7 4-gram windows; equality holds iff the min lives there
    val shared = out(1L)._2 == out(2L)._2
    assert(shared || out(1L)._2 < out(2L)._2 || out(1L)._2 > out(2L)._2)
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeStub is deterministic and plumbs through mapPartitions") {
    val df = Seq((1L, "image", "payload-one"), (2L, "audio", "payload-two"))
      .toDF("media_id", "modality", "body")
      .withColumn("payload", col("body").cast("binary"))
    val out = Multimodal.withDecodedMeta(df, "media_id", "payload", "modality")
    val metas = out.collect().map(r => r.media_id -> r.media_meta).toMap
    assert(metas(1L).byte_len === 11L)
    assert(metas(1L).width >= 1 && metas(1L).width <= 256)
    // determinism: same payload → same meta
    assert(metas(1L) === Multimodal.decodeStub("payload-one".getBytes))
  }

  test("column-level decode agrees with the typed stub") {
    val df = Seq((1L, "same-bytes")).toDF("media_id", "body")
      .withColumn("payload", col("body").cast("binary"))
    val row = Multimodal.decodeMetaColumns(df, "payload").head()
    val stub = Multimodal.decodeStub("same-bytes".getBytes)
    assert(row.getAs[Long]("byte_len") === stub.byte_len)
    assert(row.getAs[Int]("width") === stub.width)
    assert(row.getAs[Int]("height") === stub.height)
    assert(row.getAs[Int]("n_frames") === stub.n_frames)
  }

  test("frame sampling explodes stride-spaced indices") {
    val meta = Seq((1L, 7)).toDF("media_id", "n_frames")
    val frames = Multimodal.sampleFrames(meta, "media_id", stride = 2)
      .collect().map(_.getAs[Int]("frame_idx"))
    assert(frames.sorted === Array(0, 2, 4, 6))
  }

  test("resize plan fits the box, keeps aspect, never upscales") {
    val meta = Seq(
      (1L, 1000, 500),  // downscale: limited by width
      (2L, 100, 400),   // downscale: limited by height
      (3L, 50, 60),     // already fits: unchanged
      (4L, 10000, 1)    // extreme aspect: height clamps to 1
    ).toDF("media_id", "width", "height")
    val out = Multimodal.resizePlan(meta, maxW = 200, maxH = 200)
      .select("media_id", "out_width", "out_height").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out(1L) === ((200, 100)))
    assert(out(2L) === ((50, 200)))
    assert(out(3L) === ((50, 60)))
    assert(out(4L) === ((200, 1)))
  }
}
