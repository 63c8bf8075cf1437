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

  /**
   * Conversation turn-structure audit — the schema check instruction /
   * chat training data gets before a chat template is applied: per
   * conversation, message and TURN counts (a turn = a maximal run of
   * consecutive same-role messages), the longest run, the
   * first/last roles, and the count of alternation breaks (adjacent
   * same-role pairs — exactly n_messages − n_turns). A corpus where
   * user/assistant strictly alternate has max_run = 1 everywhere;
   * double-posts, merged scrapes, and truncated turns all surface here
   * as max_run > 1 or a conversation not starting with the expected
   * role — found in THIS table, not as a tokenizer error mid-training.
   *
   * Determinism: messages order by (ts, tieCol); all outputs are exact
   * integers or role strings. Scale shape: the [[graft.operators
   * .History.scd2Intervals]] run machinery — lag + running sum over ONE
   * conversation-keyed shuffle, then per-run and per-conversation
   * map-side-combinable aggs; per-conversation state is bounded by the
   * conversation's own length, never corpus size.
   */
  def conversationTurnAudit(events: DataFrame, convCol: String,
                            roleCol: String, tsCol: String,
                            tieCol: String): DataFrame = {
    val wSeq = Window.partitionBy(col(convCol))
      .orderBy(col(tsCol), col(tieCol))
    val marked = events
      .select(col(convCol), col(roleCol), col(tsCol), col(tieCol))
      .withColumn("graft_prev", lag(col(roleCol), 1).over(wSeq))
      .withColumn("graft_new",
        when(col("graft_prev").isNull ||
          col("graft_prev") =!= col(roleCol), 1L).otherwise(0L))
      .withColumn("graft_run", sum(col("graft_new")).over(wSeq))
    val runs = marked.groupBy(col(convCol), col("graft_run"))
      .agg(max(col(roleCol)).as("graft_role"), // constant within a run
        count(lit(1)).as("graft_len"))
    runs.groupBy(col(convCol))
      .agg(sum(col("graft_len")).as("n_messages"),
        max(col("graft_run")).as("n_turns"),
        (sum(col("graft_len")) - max(col("graft_run")))
          .as("n_alternation_breaks"),
        max(col("graft_len")).as("max_run"),
        countDistinct(col("graft_role")).as("n_roles"),
        max(when(col("graft_run") === 1L, col("graft_role")))
          .as("first_role"),
        max_by(col("graft_role"), col("graft_run")).as("last_role"))
  }
}
