package graft

import org.apache.spark.sql.functions._
import graft.operators.{LatestSnapshot, TopK}

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("kSmallest matches the window top-k row-for-row, ties broken alike") {
    // 40 groups × 50 candidates with engineered score ties
    val df = (1 to 2000).map { i =>
      (i % 40, (i * 37) % 13, i)
    }.toDF("g", "score", "id").repartition(7)
    for (k <- Seq(1, 3, 7)) {
      val viaAgg = TopK.kSmallest(df, Seq(col("g")),
          Seq("score" -> col("score"), "id" -> col("id")), k)
        .select("g", "score", "id").as[(Int, Int, Int)]
        .collect().toSet
      val viaWindow = LatestSnapshot.topK(df, Seq("g"),
          col("score").asc, Seq(col("id").asc), k)
        .select("g", "score", "id").as[(Int, Int, Int)]
        .collect().toSet
      assert(viaAgg === viaWindow, s"k=$k")
    }
  }

  test("kSmallest keeps descending order via negated keys") {
    val df = Seq((1, 5, 10L), (1, 9, 11L), (1, 9, 12L), (1, 2, 13L))
      .toDF("g", "score", "id")
    // top-2 by score desc, id asc → (9, 11), (9, 12)
    val got = TopK.kSmallest(df, Seq(col("g")),
        Seq("ns" -> (-col("score")), "id" -> col("id")), 2)
      .select("ns", "id").as[(Int, Long)].collect().toSet
    assert(got === Set((-9, 11L), (-9, 12L)))
  }

  test("kSmallest is exact when a group has fewer than k rows") {
    val df = Seq((1, 3), (1, 1), (2, 7)).toDF("g", "v")
    val got = TopK.kSmallest(df, Seq(col("g")), Seq("v" -> col("v")), 5)
      .select("g", "v").as[(Int, Int)].collect().toSet
    assert(got === Set((1, 3), (1, 1), (2, 7)))
  }
}
