package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Sequence packing for LLM pretraining: documents are (logically)
 * concatenated in a deterministic order and cut into fixed-length context
 * chunks ("concat-and-chunk", the packing used by GPT-style pretraining
 * pipelines). The plan computes, per document, where its tokens land in
 * the packed token stream — which context chunks it occupies and whether
 * a context boundary splits it — without materializing the stream.
 *
 * The core is an exact GLOBAL prefix sum of token counts under a total
 * order. A bare `Window.orderBy` computes it through ONE task (the
 * single-partition funnel); this uses the same distributed-exact
 * construction as [[GlobalRank]]: range-shuffle on the order key,
 * per-partition running sums in parallel, then per-partition offsets
 * (a metadata-scale table, broadcast) added back. One range shuffle
 * total; every window in the plan is partition-local.
 */
object Packing {

  /**
   * Packing plan: for each doc, `n_tokens` (whitespace tokens),
   * `start_tok` (0-based position of its first token in the concatenated
   * stream, ordered by `idCol`), `first_chunk`/`last_chunk` (0-based
   * `ctxLen`-token context indices of its first/last token), and
   * `n_chunks` spanned. `n_chunks > 1` means a context boundary splits
   * the document — the fraction of such docs is the packing-quality
   * signal that drives ctxLen/ordering choices.
   *
   * `tokenCount` is the tokenizer seam: pass an expression over the
   * text column (e.g. a per-word fold of
   * [[TextAnalysis.greedyTokenCountCol]] against a learned subword
   * vocabulary) to budget in TOKENIZER tokens instead of whitespace
   * tokens — real context windows are counted post-BPE, and whitespace
   * counts mis-size them. Default keeps the whitespace semantics.
   */
  def packPlan(docs: DataFrame, idCol: String, textCol: String,
               ctxLen: Int,
               tokenCount: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(ctxLen > 0, "ctxLen must be positive")
    val toks = docs.select(col(idCol),
      tokenCount.getOrElse(size(split(col(textCol), " ")))
        .cast("long").as("n_tokens"))
    val parted = toks.repartitionByRange(col(idCol))
      .withColumn("graft_pid", spark_partition_id())
    val w = Window.partitionBy(col("graft_pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("graft_lpre",
      coalesce(sum(col("n_tokens")).over(w), lit(0L)))
    // per-partition token totals from the same lineage (last row's prefix
    // + its own count), so AQE can't give the branches different
    // partitionings
    val counts = local.groupBy(col("graft_pid"))
      .agg(max(col("graft_lpre") + col("n_tokens")).as("graft_n"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.graft_pid") < col("a.graft_pid"), "left")
      .groupBy(col("a.graft_pid").as("graft_pid"))
      .agg(coalesce(sum(col("b.graft_n")), lit(0L)).as("graft_off"))
    val startTok = col("graft_lpre") + col("graft_off")
    val endTok = startTok + greatest(col("n_tokens"), lit(1L)) - 1
    // `div` (IntegralDivide), not floor(/): double division would round
    // startTok past 2^53 tokens and mis-chunk — the Layout.rank rule
    local.join(broadcast(offsets), "graft_pid")
      .select(col(idCol), col("n_tokens"),
        startTok.as("start_tok"),
        call_function("div", startTok, lit(ctxLen.toLong)).as("first_chunk"),
        call_function("div", endTok, lit(ctxLen.toLong)).as("last_chunk"))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
  }

  /**
   * Curriculum interleave: the deterministic training order that consumes
   * each group's best documents first while keeping every training window
   * mixed across groups. Rank documents within each group (source,
   * domain, shard) by `score` descending (id-asc tiebreak), then emit the
   * round-robin order: all rank-1 docs (groups in name order), all
   * rank-2 docs, … — the standard interleave for combining
   * curriculum-style best-first ordering (Bengio et al., ICML'09) with
   * cross-source mixing, so no context window sees a single-source run
   * even when group sizes are wildly unequal (exhausted groups simply
   * drop out of later rounds).
   *
   * Scale shape: the per-group rank is a partitioned window (shuffles on
   * `groupCol`); the global position over the total order
   * (rank, group) is [[GlobalRank.globalRowNumber]] — one range shuffle
   * + a metadata-scale offsets broadcast, never a single-partition
   * window.
   *
   * Returns (idCol, groupCol, rank_in_group, global_pos), 1-based ranks.
   */
  def curriculumInterleave(docs: DataFrame, idCol: String,
                           groupCol: String,
                           score: org.apache.spark.sql.Column): DataFrame = {
    val rw = Window.partitionBy(col(groupCol))
      .orderBy(score.desc, col(idCol).asc)
    val ranked = docs
      .withColumn("rank_in_group", row_number().over(rw))
      .select(col(idCol), col(groupCol), col("rank_in_group"))
    GlobalRank.globalRowNumber(ranked,
        Seq(col("rank_in_group").asc, col(groupCol).asc), "global_pos")
      .select(col(idCol), col(groupCol), col("rank_in_group"),
        col("global_pos").cast("long").as("global_pos"))
  }

  /**
   * Length-grouped batch assembly: sort documents by token count
   * (descending, id tiebreak), cut the order into fixed-size batches,
   * and report each batch's padding waste — the "sorted batching" /
   * length-bucketing trick that cuts padded-token throughput loss in
   * training and batch inference (each batch pads to ITS max, and
   * similar lengths land together, so padding ≈ 0 instead of
   * global-max − mean). The output is the efficiency audit: compare
   * Σ padding_tokens against the random-batching baseline
   * (n · global_max − Σ len) to quote the savings.
   *
   * Scale shape: ONE range shuffle ([[GlobalRank.globalRowNumber]] on
   * the total order — no single-partition window), then a |batches|-key
   * hash-agg. Batch ids are assigned from the exact global rank, so the
   * assembly is deterministic and reproducible across runs/engines.
   *
   * Returns one row per batch: (batch_id, n_docs, max_len, total_tokens,
   * padded_tokens, padding_tokens, padding_ppm). The final
   * (smallest-length) batch may be ragged (< batchSize docs).
   * padding_ppm is the waste fraction in exact half-away ppm — the
   * former `round(double, 6)` of this exact rational sat on a half-tie
   * at sf0.1 (r13 audit finding; PORTABILITY rule 1).
   */
  def lengthGroupedBatches(docs: DataFrame, idCol: String,
                           lenCol: org.apache.spark.sql.Column,
                           batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize=$batchSize must be positive")
    val measured = docs.select(col(idCol), lenCol.cast("long").as("graft_len"))
    GlobalRank.globalRowNumber(measured,
        Seq(col("graft_len").desc, col(idCol).asc), "graft_rn")
      .withColumn("batch_id",
        ((col("graft_rn") - 1) / batchSize).cast("long"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("graft_len")).as("max_len"),
        sum(col("graft_len")).as("total_tokens"))
      .withColumn("padded_tokens", col("n_docs") * col("max_len"))
      .withColumn("padding_tokens",
        col("padded_tokens") - col("total_tokens"))
      .withColumn("padding_ppm",
        when(col("padded_tokens") > 0, ExactRound.halfAwayDiv(
          col("padding_tokens")
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
            lit(1000000L),
          col("padded_tokens"))).otherwise(lit(0L)))
  }
}
