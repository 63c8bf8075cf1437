package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Two paths, per the standard ANN playbook:
 *  - `bruteForceTopK`: exact cosine against a literal query vector —
 *    a narrow map + `TakeOrderedAndProject` (per-partition top-k heap +
 *    driver merge, no global sort). The correctness baseline; linear scan,
 *    embarrassingly parallel, fine up to billions of rows when the query
 *    count is small.
 *  - `lshSignatures` / `annTopK`: random-hyperplane LSH — each vector maps
 *    to a compact bit signature; candidate generation is an equi-join on
 *    the signature (or banded sub-signatures), then exact cosine re-ranks
 *    candidates. Turns all-pairs O(n²) into hash-bucket joins; the scale
 *    path for vector-vs-corpus workloads.
 *
 * All arithmetic is done in DOUBLE with a strict left-to-right fold
 * (`aggregate` over the array), so results are bit-reproducible and
 * oracle-comparable. Hyperplanes are derived from md5 — portable and
 * seedless, same trick as TextDedup.
 */
object Similarity {

  /** Σ x_i·y_i as a strict sequential double fold (deterministic bits). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k most-similar vectors to a literal query vector.
    * `orderBy(desc).limit(k)` compiles to TakeOrderedAndProject. */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    embeddings
      .select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** ±1 hyperplane coefficient for (plane p, dimension d), derived from
    * md5 — the parity of the first hex nibble of md5("p_d"). Built from
    * Column ops (not an expr string) so it composes with lambda variables. */
  private def planeCoef(p: Column, d: Column): Column =
    (conv(substring(md5(concat(p.cast(StringType), lit("_"), d.cast(StringType))),
      1, 1), 16, 10).cast(IntegerType) % 2) * 2 - 1

  /**
   * Random-hyperplane LSH signature (`nPlanes`-bit int): bit p = 1 iff the
   * projection of the vector onto hyperplane p is positive. Computed as a
   * strict fold per plane — narrow, codegen-friendly, no shuffle.
   */
  def lshSignatures(embeddings: DataFrame, idCol: String, vecCol: String,
                    nPlanes: Int = 12): DataFrame = {
    // sig = Σ_p (proj_p > 0) << p, where proj_p = Σ_d v[d] * coef(p, d)
    val planes = embeddings.select(col(idCol), col(vecCol),
        explode(sequence(lit(0), lit(nPlanes - 1))).as("p"))
      .withColumn("d_idx", sequence(lit(0), size(col(vecCol)) - 1))
      .withColumn("proj",
        aggregate(
          zip_with(col(vecCol), col("d_idx"),
            (v, d) => v.cast(DoubleType) * planeCoef(col("p"), d)),
          lit(0.0), (acc, x) => acc + x))
    planes.groupBy(col(idCol))
      .agg(sum(when(col("proj") > 0, expr("cast(shiftleft(1L, p) as bigint)"))
        .otherwise(lit(0L))).as("lsh_sig"))
  }

  /**
   * ANN top-k: for each query vector (a subset of the corpus given by
   * `queryPred`), candidates = corpus vectors sharing the LSH signature
   * bucket, re-ranked by exact cosine. Bucket join scales as the collision
   * rate; recall is tunable via nPlanes (fewer planes → bigger buckets).
   */
  def annTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, k: Int, nPlanes: Int = 12): DataFrame = {
    val sigs = lshSignatures(embeddings, idCol, vecCol, nPlanes)
    val withSig = embeddings.join(sigs, idCol)
    val queries = withSig.filter(queryPred)
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"), col("lsh_sig"))
    val cands = queries.join(
        withSig.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"), col("lsh_sig")),
        "lsh_sig")
      .filter(col("q_id") =!= col("c_id"))
      // rank on the 6-dp-rounded score (with id tiebreak): makes the top-k
      // cut reproducible across engines/partitionings at last-ulp noise
      .withColumn("cosine", round(cosine(col("q_vec"), col("c_vec")), 6))
    // top-k per query: rank-limit window → WindowGroupLimit at scale
    LatestSnapshot.topK(cands, Seq("q_id"),
        col("cosine").desc, Seq(col("c_id").asc), k)
      .select(col("q_id"), col("c_id"), col("cosine"))
  }
}
