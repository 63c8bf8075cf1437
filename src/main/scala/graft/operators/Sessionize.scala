package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Gap-based sessionization: assign a per-key session id that increments
 * whenever the time since the previous row (same key) exceeds `gapSeconds`.
 *
 * The classic large-scale shape: ONE shuffle on the session keys, then a
 * single sorted window pass per key — `lag` to flag session starts and a
 * running `sum` over the flags to number sessions. Both window functions
 * share the same (partitionBy, orderBy) spec, so Catalyst evaluates them in
 * one Window operator (one sort, no extra exchange). Linear in rows per
 * key; skewed keys are bounded by per-user event counts, not corpus size.
 *
 * This is the batch equivalent of Structured Streaming's session windows
 * (`session_window(ts, gap)`), which graft.streaming uses for live data —
 * the batch form is replayable and oracle-checkable.
 */
object Sessionize {

  /** Adds `session_id` (1-based per key) to `df`. `tiebreak` columns break
    * equal-timestamp ordering so the numbering is deterministic. */
  def apply(df: DataFrame, keys: Seq[String], tsCol: String, gapSeconds: Long,
            tiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc +: tiebreak.map(_.asc): _*)
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("session_id",
      sum(newSession).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: one row per (keys, session_id) with event count
    * and session bounds. */
  def sessions(df: DataFrame, keys: Seq[String], tsCol: String,
               gapSeconds: Long, tiebreak: Seq[Column] = Nil): DataFrame =
    apply(df, keys, tsCol, gapSeconds, tiebreak)
      .groupBy((keys :+ "session_id").map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
}
