package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Exact per-group top-k via Spark's bounded-priority-queue collector
 * (`collect_top_k`, registered by `graft.functions.GraftExtensions`)
 * instead of a `row_number` window.
 *
 * Why: a window top-k must shuffle EVERY candidate row to its group's
 * partition and sort there — for a kNN-style fan-out (|group| candidates
 * per group) that is the dominant cost of the whole job. The aggregate
 * form keeps O(k) state per group and is map-side combinable, so each
 * map task emits at most k rows per group it saw: the shuffle carries
 * ~k·|groups| rows instead of all candidates, and nothing is ever fully
 * sorted. At 100 TB this is the difference between shuffling the
 * candidate fan-out (quadratic in the brute-force case) and shuffling
 * the result.
 *
 * Contract: `keyAndPayload` columns form a struct whose ASCENDING
 * lexicographic order defines priority — the k SMALLEST structs per
 * group are kept (encode "descending" by negating a numeric key).
 * Include a unique tiebreak column so selection is deterministic.
 * Matches `LatestSnapshot.topK(df, groups, key.asc, tiebreaks, k)`
 * row-for-row (asserted by TopKSpec).
 */
object TopK {

  /** Per-group k-smallest structs, exploded back to rows: output columns
    * are the group columns plus one field per `keyAndPayload` entry. */
  def kSmallest(df: DataFrame, groupCols: Seq[Column],
                keyAndPayload: Seq[(String, Column)], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val item = struct(keyAndPayload.map { case (n, c) => c.as(n) }: _*)
    val agged = df.groupBy(groupCols: _*)
      .agg(call_function("collect_top_k", item, lit(k), lit(true))
        .as("graft_topk"))
      .select(groupCols ++ Seq(explode(col("graft_topk")).as("graft_item")): _*)
    keyAndPayload.foldLeft(agged) { case (d, (n, _)) =>
      d.withColumn(n, col(s"graft_item.$n"))
    }.drop("graft_item")
  }
}
