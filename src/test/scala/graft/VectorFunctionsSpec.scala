package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Sources

/** Native vector expressions: bit-parity with the HOF reference
  * implementation, SQL registration, and codegen participation. */
class VectorFunctionsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("native cosine_sim is bit-identical to the HOF fold on real embeddings") {
    val e = Sources.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 0).select(col("embedding"))
      .head.getSeq[Float](0).map(_.toDouble)
    val lits = array(q.map(lit): _*)
    val mismatches = e.select(
        Similarity.cosine(col("embedding"), lits).as("native"),
        Similarity.cosineHof(col("embedding"), lits).as("hof"))
      .filter(col("native") =!= col("hof")) // exact, not epsilon
      .count()
    assert(mismatches === 0)
  }

  test("functions are callable from SQL text via session extensions") {
    Sources.embeddings(spark, sf).createOrReplaceTempView("emb")
    val out = spark.sql(
      """SELECT vec_id, cosine_sim(embedding, embedding) AS self,
        |       dot_product(embedding, embedding) AS norm2
        |FROM emb ORDER BY vec_id LIMIT 3""".stripMargin).collect()
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("self") - 1.0) < 1e-9)
      assert(r.getAs[Double]("norm2") > 0)
    }
  }

  test("native expression participates in whole-stage codegen") {
    val e = Sources.embeddings(spark, sf)
    val df = e.select(Similarity.cosine(col("embedding"), col("embedding")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
  }

  test("null inputs propagate null") {
    Sources.embeddings(spark, sf).createOrReplaceTempView("emb2")
    val r = spark.sql(
      """SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), embedding) AS c
        |FROM emb2 LIMIT 1""".stripMargin).head
    assert(r.isNullAt(0))
  }
}
