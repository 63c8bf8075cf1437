package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: find training documents that share word
 * n-grams with an evaluation/benchmark set, so they can be dropped before
 * training (the standard n-gram-overlap decontamination used for LLM
 * training corpora — e.g. the 13-gram filter described in the GPT-3 paper,
 * Brown et al. 2020, appendix C).
 *
 * Scale shape: the eval set is benchmark-sized (thousands of docs — tiny
 * next to a 100 TB corpus), so its n-gram table is BROADCAST and the train
 * corpus is processed in one narrow pass: shingle-explode → broadcast hash
 * join → per-doc aggregation. The corpus never shuffles on n-gram; the
 * per-doc aggregation shuffles only matching (train, eval) n-gram rows,
 * which are collision-bounded. A corpus-side inverted index (shuffle on
 * n-gram) would cost a full-corpus exchange for no benefit at this eval:
 * corpus size ratio.
 */
object Decontamination {

  /**
   * Training docs sharing at least one `w`-word shingle with any eval doc:
   * (trainId, n_shared_ngrams, n_eval_docs_hit). Docs shorter than `w`
   * words cannot collide (no shingles). `n_shared_ngrams` counts DISTINCT
   * shared shingles; `n_eval_docs_hit` counts distinct eval docs reached.
   * Anti-join the result against the corpus to get the clean survivors.
   */
  def contaminated(train: DataFrame, evalDocs: DataFrame, idCol: String,
                   textCol: String, w: Int = 5): DataFrame = {
    val tsh = TextDedup.shingles(train, idCol, textCol, w)
    val esh = TextDedup.shingles(evalDocs, idCol, textCol, w)
      .select(col("s"), col(idCol).as("graft_eval_id"))
    tsh.join(broadcast(esh), "s")
      .groupBy(col(idCol))
      .agg(
        countDistinct(col("s")).as("n_shared_ngrams"),
        countDistinct(col("graft_eval_id")).as("n_eval_docs_hit"))
  }

  /**
   * Semantic (embedding-space) decontamination: training vectors whose
   * cosine similarity to ANY eval/benchmark vector reaches `tau` —
   * the paraphrase-robust complement to [[contaminated]]'s verbatim
   * n-gram filter (surface rewrites defeat n-grams but not embeddings;
   * the eval-overlap analyses of Brown et al. 2020 app. C and the
   * SemDeDup embedding-similarity criterion, Abbas et al. 2023, applied
   * train→eval instead of train→train). Output per contaminated train
   * id: `n_eval_hits` (eval vectors at/above tau) and `max_cosine`
   * (rounded to 6 dp). Anti-join against the corpus for the survivors.
   *
   * Scale shape: the eval set is benchmark-sized, so it rides as ONE
   * BROADCAST and the corpus is scanned in a single narrow pass —
   * broadcast nested-loop with a codegen'd cosine, then a train-id
   * hash-agg (map-side combinable; at most |eval| rows per train id
   * pre-combine). The corpus never shuffles on vector contents. Per-row
   * cost is |eval|·dims multiply-adds — the same budget [[Similarity
   * .bruteForceTopK]] spends per query; if eval outgrows broadcast
   * range, prefilter candidates with [[Similarity
   * .cosineNearDupPairsBucketed]]'s LSH banding and verify only bucket
   * collisions.
   */
  def semanticContaminated(train: DataFrame, evalVecs: DataFrame,
                           idCol: String, vecCol: String,
                           tau: Double): DataFrame = {
    val ev = evalVecs.select(col(idCol).as("graft_eval_id"),
      col(vecCol).as("graft_ev"))
    train.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(ev))
      .withColumn("graft_cos",
        round(Similarity.cosine(col(vecCol), col("graft_ev")), 6))
      .filter(col("graft_cos") >= tau)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_eval_hits"),
        max(col("graft_cos")).as("max_cosine"))
  }
}
