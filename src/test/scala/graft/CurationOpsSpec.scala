package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, VectorAggs}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val df = (1L to 2000L).toDF("id")

  test("split is exhaustive, labeled correctly, and ~80/10/10") {
    val counts = Sampling.deterministicSplit(df, "id", "s",
        Seq(("train", 204), ("val", 230), ("test", 256)))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === 2000L)
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") > 1400 && counts("train") < 1800)
    assert(counts("val") > 100 && counts("val") < 320)
  }

  test("assignment is stable under repartitioning (seedless md5)") {
    val a = Sampling.deterministicSplit(df.repartition(17), "id", "s",
      Seq(("a", 128), ("b", 256))).select("id", "split")
      .as[(Long, String)].collect().toMap
    val b = Sampling.deterministicSplit(df.coalesce(1), "id", "s",
      Seq(("a", 128), ("b", 256))).select("id", "split")
      .as[(Long, String)].collect().toMap
    assert(a === b)
  }

  test("different salts decorrelate the buckets") {
    val a = Sampling.deterministicSplit(df, "id", "x", Seq(("in", 26), ("out", 256)))
      .filter(col("split") === "in").select("id").as[Long].collect().toSet
    val b = Sampling.deterministicSplit(df, "id", "y", Seq(("in", 26), ("out", 256)))
      .filter(col("split") === "in").select("id").as[Long].collect().toSet
    // ~10% each; independent salts should overlap on ~1% only
    assert((a intersect b).size < (a.size min b.size) / 2)
  }

  test("last cut must cover the full bucket range") {
    intercept[IllegalArgumentException] {
      Sampling.deterministicSplit(df, "id", "s", Seq(("a", 100)))
    }
  }
}

class NormalizeAndRedactSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Similarity, TextAnalysis}

  test("withL2Normalized produces unit vectors; zero vector passes through") {
    val df = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(0.0f, 0.0f)))
      .toDF("id", "v")
    val out = Similarity.withL2Normalized(df, "v", "u")
      .select("id", "u").as[(Long, Seq[Double])].collect().toMap
    assert(out(1L) === Seq(0.6, 0.8))
    assert(out(2L) === Seq(0.0, 0.0))
  }

  test("normalized corpus: cosine equals plain dot product") {
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f)), (2L, Seq(-2.0f, 0.5f, 1.0f)))
      .toDF("id", "v")
    val u = Similarity.withL2Normalized(df, "v", "u")
    val a = u.filter($"id" === 1L).select($"u".as("u1"))
    val b = u.filter($"id" === 2L).select($"u".as("u2"))
    val row = a.crossJoin(b).select(
      round(Similarity.cosine($"u1", $"u2"), 9).as("cos"),
      round(Similarity.dotHof($"u1", $"u2"), 9).as("dot")).head()
    assert(row.getDouble(0) === row.getDouble(1))
  }

  test("redact replaces in rule order and counts against the original") {
    val df = Seq((1L, "mail me at bob@example.com or call 555 1234")).toDF("doc_id", "text")
    val out = TextAnalysis.redact(df, "doc_id", "text",
      Seq("[a-z]+@[a-z]+\\.[a-z]+" -> "<EMAIL>", "[0-9]+" -> "<NUM>")).head()
    assert(out.getString(1) === "mail me at <EMAIL> or call <NUM> <NUM>")
    assert(out.getInt(2) === 3)
  }
}

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around orthogonal directions + the seeds inside them
  private def emb = Seq(
    (0L, Seq(1.0f, 0.05f)), (1L, Seq(0.05f, 1.0f)),
    (2L, Seq(1.0f, 0.1f)), (3L, Seq(0.9f, 0.0f)),
    (4L, Seq(0.0f, 0.9f)), (5L, Seq(0.1f, 1.1f))
  ).toDF("vec_id", "embedding")

  test("k-means separates orthogonal clusters; labels are seed ids") {
    val out = VectorAggs.kMeans(emb, "vec_id", "embedding", k = 2, iters = 2)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(out.keySet === (0L to 5L).toSet)
    assert(out(0L) === 0L && out(2L) === 0L && out(3L) === 0L)
    assert(out(1L) === 1L && out(4L) === 1L && out(5L) === 1L)
  }

  test("assignments are partitioning-invariant") {
    val a = VectorAggs.kMeans(emb.repartition(5), "vec_id", "embedding", 2, 2)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toSet
    val b = VectorAggs.kMeans(emb.coalesce(1), "vec_id", "embedding", 2, 2)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("k = 1 assigns everything to the single seed") {
    val out = VectorAggs.kMeans(emb, "vec_id", "embedding", 1, 2)
      .select("cluster").as[Long].collect()
    assert(out.length === 6 && out.forall(_ === 0L))
  }
}
