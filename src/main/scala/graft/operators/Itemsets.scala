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

  /**
   * PMI-ranked collocation extraction (Church & Hanks 1990): the top-k
   * ADJACENT word pairs by pointwise mutual information, the classic
   * collocation detector ("New York", "machine learning") that
   * frequency alone misses. PMI = log p(x,y)/(p(x)p(y)) — but log is
   * monotone, so ranking by the EXACT probability ratio
   * c_xy·Nu²/(Nb·c_x·c_y) is the PMI ranking with zero libm: the gate
   * hashes `ratio_q` = ⌊10⁶·ratio⌋ computed in DECIMAL(38,0) integral
   * division (the q200 discipline applied to an association score).
   * A `minCount` floor on c_xy applies the standard low-frequency
   * guard (PMI is noise-dominated at c_xy = 1).
   *
   * Scale shape: bigrams from ONE zip_with projection (no position
   * self-join); c_xy / c_x are map-side-combinable hash-aggs; Nu and Nb
   * ride a 1-row broadcast; the k-cut is TakeOrderedAndProject over the
   * minCount-filtered pair table — never a global sort.
   */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
                      minCount: Long = 3L, k: Int = 20): DataFrame = {
    require(minCount >= 1, s"minCount=$minCount out of range")
    require(k >= 1, s"k=$k out of range")
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val ws = col("graft_ws")
    val pairs = docs.select(split(col(textCol), " ").as("graft_ws"))
      .select(explode(when(size(ws) >= 2,
        zip_with(slice(ws, lit(1), size(ws) - 1),
          slice(ws, lit(2), size(ws) - 1),
          (a, b) => struct(a.as("x"), b.as("y"))))
        .otherwise(array().cast("array<struct<x:string,y:string>>")))
        .as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
    val cxy = pairs.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    val uni = docs.select(explode(split(col(textCol), " ")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("graft_cu"))
    val totals = uni.agg(sum(col("graft_cu")).as("graft_nu"))
      .crossJoin(pairs.agg(count(lit(1)).as("graft_nb")))
    cxy
      .join(uni.select(col("t").as("x"), col("graft_cu").as("c_x")), "x")
      .join(uni.select(col("t").as("y"), col("graft_cu").as("c_y")), "y")
      .crossJoin(broadcast(totals))
      .withColumn("graft_num",
        lit(1000000L).cast(big) * col("c_xy").cast(big) *
          col("graft_nu").cast(big) * col("graft_nu").cast(big))
      .withColumn("graft_den",
        col("graft_nb").cast(big) * col("c_x").cast(big) *
          col("c_y").cast(big))
      .withColumn("ratio_q",
        expr("graft_num div graft_den").cast(LongType))
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
        col("ratio_q"))
      .orderBy(col("ratio_q").desc, col("x").asc, col("y").asc)
      .limit(k)
  }

  /**
   * Apriori-pruned frequent trigram mining (Agrawal & Srikant, VLDB'94,
   * applied to adjacent token sequences): find every 3-token sequence
   * occurring ≥ `minSupport` times corpus-wide, generating candidates
   * ONLY from frequent bigrams — the anti-monotone property (a frequent
   * trigram's two constituent bigrams are at least as frequent) prunes
   * the count space before the expensive pass, which is the whole
   * Apriori idea and the template/boilerplate discovery step above
   * [[frequentPairs]]' unordered pairs.
   *
   * Scale shape: bigram counts are ONE map-side-combinable agg; the
   * candidate set is a self-join of the FREQUENT bigrams on the shared
   * middle token (output bounded by Σ_y f_in(y)·f_out(y), frequent side
   * only); corpus trigrams are semi-joined against candidates BEFORE
   * the trigram agg, so aggregation state is candidate-bounded, not
   * vocabulary³. Gate-friendly: exact counts, full set (no sampling).
   */
  def aprioriTrigrams(docs: DataFrame, textCol: String,
                      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport=$minSupport out of range")
    val ws = col("graft_ws")
    val base = docs.select(split(col(textCol), " ").as("graft_ws"))
    val bigrams = base.filter(size(ws) >= 2)
      .select(explode(zip_with(slice(ws, lit(1), size(ws) - 1),
        slice(ws, lit(2), size(ws) - 1),
        (a, b) => struct(a.as("x"), b.as("y")))).as("graft_p"))
      .select(col("graft_p.x").as("x"), col("graft_p.y").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("graft_c"))
    val b2 = bigrams.filter(col("graft_c") >= minSupport)
      .localCheckpoint()
    val cand = b2.select(col("x"), col("y"), col("graft_c").as("c_xy"))
      .join(b2.select(col("x").as("y"), col("y").as("z"),
        col("graft_c").as("c_yz")), Seq("y"))
      .select(concat_ws(" ", col("x"), col("y"), col("z"))
        .as("trigram"), col("c_xy"), col("c_yz"))
    val tri = base.filter(size(ws) >= 3)
      .select(explode(zip_with(
        zip_with(slice(ws, lit(1), size(ws) - 2),
          slice(ws, lit(2), size(ws) - 2),
          (a, b) => concat_ws(" ", a, b)),
        slice(ws, lit(3), size(ws) - 2),
        (ab, c) => concat_ws(" ", ab, c))).as("trigram"))
      .join(cand, Seq("trigram"), "left_semi")
      .groupBy(col("trigram")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
    tri.join(cand, Seq("trigram"))
      .select(col("trigram"), col("n"), col("c_xy"), col("c_yz"))
  }
}
