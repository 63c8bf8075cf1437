package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * As-of join — for each left row (keys, t), attach the payload of the
 * latest right row with the same keys and t' ≤ t. Spark has no native
 * as-of operator; this is the scalable composition (SURVEY §7.3 preference
 * (a)): tag both sides, union by name, forward-fill the right payload with
 * `last(ignoreNulls)` over a (keys, time)-sorted window, keep left rows.
 *
 * Scale properties: ONE shuffle (hash by keys) + per-partition sort —
 * cost is a single wide stage regardless of match fan-in, vs. the naive
 * inequality join's quadratic blowup per key. This is the standard
 * time-series pattern (point-in-time correctness for feature lookups:
 * "most recent price/state as of event time").
 *
 * Tie semantics: right rows at t' == t ARE visible to the left row
 * (inclusive, matching DuckDB/standard ASOF `>=`); among right rows with
 * equal (keys, t'), the greatest `rightOrder` wins (deterministic).
 */
object AsOfJoin {

  /**
   * @param left       probe side; all its columns are preserved
   * @param right      reference side: must carry `keys`, `timeCol`, and
   *                   `payload` columns only, with payload names disjoint
   *                   from left's columns
   * @param keys       equi-join keys
   * @param timeCol    event-time column name (same on both sides)
   * @param payload    right columns to attach
   * @param rightOrder tiebreak among right rows with equal (keys, time);
   *                   greatest wins
   * @param inner      true drops unmatched left rows (ASOF inner); false
   *                   keeps them with null payload (ASOF left)
   */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            timeCol: String, payload: Seq[String], rightOrder: Column,
            inner: Boolean = true): DataFrame = {
    val l = left.withColumn("_tag", lit(1))
    val r = right.withColumn("_tag", lit(0))
    // right rows sort before left at equal time (inclusive ≤); among
    // right ties the greatest rightOrder lands last → last() picks it
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("_tag").asc, rightOrder.asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val kept = filled.filter(col("_tag") === 1).drop("_tag")
    if (inner) kept.filter(payload.map(col(_).isNotNull).reduce(_ && _))
    else kept
  }
}
