package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Frequent-itemset mining at level 2 (Agrawal & Srikant 1994, the
 * Apriori pruning step): which word PAIRS co-occur in at least a
 * `supNum/supDen` fraction of documents, and with what lift over
 * independence — the market-basket view of a corpus that surfaces
 * collocations, boilerplate signatures, and topic pairs that unigram
 * counts can't see.
 *
 * The Apriori property does the scaling work: a pair can only be
 * frequent if BOTH its words are, so the per-document pair fan-out runs
 * over each document's FREQUENT words only — candidate volume is
 * (frequent words per doc)², not vocabulary², and the frequent-word set
 * is broadcast (it is ≤ vocabulary, metadata-scale by definition at any
 * useful support).
 *
 * Shape: one narrow explode of per-doc DISTINCT words (array_distinct
 * before the explode — presence, not multiplicity, and no distinct
 * shuffle), one word-count hash-agg, a broadcast semi-reduction to
 * frequent words, a doc-keyed self-join for pairs, and one
 * map-side-combinable pair-count agg whose key space is bounded by
 * (frequent vocab)². Support compares are integer cross-products
 * (n·supDen vs sup·supNum — no float thresholds); lift is a single
 * int64-products ratio rounded to 6 dp.
 */
object Itemsets {

  /** Frequent co-occurring word pairs: (w1 < w2, n_both, lift) for pairs
    * present together in ≥ supNum/supDen of all documents. */
  def frequentPairs(docs: DataFrame, idCol: String, textCol: String,
                    supNum: Int, supDen: Int): DataFrame = {
    require(supNum > 0 && supDen > 0 && supNum <= supDen,
      s"support $supNum/$supDen outside (0, 1]")
    val dw = docs.select(col(idCol),
      explode(array_distinct(split(col(textCol), " "))).as("graft_w"))
    val nDocs = docs.agg(count(lit(1)).as("graft_n"))
    val wordCounts = dw.groupBy(col("graft_w"))
      .agg(count(lit(1)).as("graft_wn"))
    val frequent = wordCounts.join(broadcast(nDocs))
      .filter(col("graft_wn") * supDen >= col("graft_n") * supNum)
    val fdw = dw.join(broadcast(frequent.select(col("graft_w"))), "graft_w")
    val pairs = fdw.select(col(idCol), col("graft_w").as("w1"))
      .join(fdw.select(col(idCol), col("graft_w").as("w2")), idCol)
      .filter(col("w1") < col("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(frequent.select(col("graft_w").as("w1"),
        col("graft_wn").as("graft_n1"))), "w1")
      .join(broadcast(frequent.select(col("graft_w").as("w2"),
        col("graft_wn").as("graft_n2"))), "w2")
      .join(broadcast(nDocs))
      .filter(col("n_both") * supDen >= col("graft_n") * supNum)
      .select(col("w1"), col("w2"), col("n_both").cast(LongType).as("n_both"),
        round((col("n_both") * col("graft_n")).cast(DoubleType) /
          (col("graft_n1") * col("graft_n2")).cast(DoubleType), 6)
          .as("lift"))
  }
}
