package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * History/temporal modeling over append-only event streams — the
 * warehouse-side twin of the reference's history/current dual-write
 * (SURVEY §2 S7–S9): the history sink appends raw snapshots; these
 * operators turn an append-only log into queryable validity intervals.
 */
object History {

  /**
   * SCD Type-2 interval build (Kimball's slowly-changing-dimension
   * type 2, the warehouse-standard history representation): collapse
   * each key's attribute timeline into validity intervals — one row per
   * RUN of consecutive equal attribute values, carrying
   * [valid_from, valid_to) with valid_to NULL on the current (open)
   * interval, a 1-based version number, and the run's event count. The
   * query "what was this user's status at time T" becomes one interval
   * lookup instead of a full log scan — which is the entire point of
   * SCD2 at 100 TB: the interval table is bounded by the number of
   * CHANGES, not the number of events.
   *
   * Determinism: events order by (ts, tieCol) — the tie column makes
   * same-timestamp runs engine-stable; run boundaries and counts are
   * exact integers, interval bounds are the input timestamps verbatim
   * (no arithmetic on them).
   *
   * Scale shape: everything is key-partitioned windows (lag + running
   * sum + lead) over ONE shuffle on the key — no self-join, no global
   * sort. Per-key timelines are the unit of work; skewed keys are
   * bounded by per-user event counts, not corpus size.
   *
   * vs [[Snapshot.scd2]] (the q126 twin): use THIS one when version
   * numbers, per-run event counts, and raw-timestamp bounds matter;
   * use Snapshot.scd2 when the caller wants epoch-micro bounds keyed
   * by a unique row id. Same interval semantics, different surfaced
   * columns and tie contracts — the difference is deliberate, not
   * drift.
   */
  def scd2Intervals(events: DataFrame, keyCol: String, attrCol: String,
                    tsCol: String, tieCol: String): DataFrame = {
    val wSeq = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val marked = events
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("graft_prev", lag(col(attrCol), 1).over(wSeq))
      .withColumn("graft_new",
        when(col("graft_prev").isNull ||
          col("graft_prev") =!= col(attrCol), 1L).otherwise(0L))
      .withColumn("graft_run", sum(col("graft_new")).over(wSeq))
    val runs = marked.groupBy(col(keyCol), col("graft_run"))
      .agg(max(col(attrCol)).as(attrCol), // constant within a run
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
    val wRuns = Window.partitionBy(col(keyCol)).orderBy(col("graft_run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRuns))
      .select(col(keyCol), col("graft_run").cast(LongType).as("version"),
        col(attrCol), col("valid_from"), col("valid_to"), col("n_events"))
  }
}
