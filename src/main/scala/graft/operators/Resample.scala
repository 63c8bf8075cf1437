package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Time-series resampling with forward fill: project an irregular event
 * stream onto a fixed per-entity bucket grid (every `bucketUs` from the
 * entity's first to last event) and carry the last observed value across
 * gaps — the "as-of state at every tick" view feature pipelines join
 * against, without which every consumer re-implements its own
 * last-known-value logic.
 *
 * Determinism: the per-bucket observation is the LAST event by the total
 * (ts, id) order (row_number, not an engine-specific last()); the fill
 * is `last(value, ignoreNulls)` over the bucket order, which both
 * engines define identically; the value itself is carried verbatim — no
 * arithmetic, so no float rules needed. The grid starts at each entity's
 * first observed bucket, so every filled row has a defined value (no
 * leading NULLs).
 *
 * Scale shape: one entity-keyed min/max aggregate, a sequence-explode
 * fan-out of grid rows (span/bucketUs per entity — choose bucketUs so
 * this is bounded), an entity-bucket-keyed left join, and one
 * entity-partitioned window. No global sort; the dense grid never
 * exceeds entities × span ticks BY CONSTRUCTION.
 */
object Resample {

  /** One row per (entity, bucket) tick: `value` = last observation at or
    * before the tick (forward-filled), `is_observed` = whether the tick's
    * own bucket had an event. */
  def forwardFill(events: DataFrame, entityCol: String, idCol: String,
                  tsCol: String, valueCol: String,
                  bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    val bucket = call_function("div", unix_micros(col(tsCol)), lit(bucketUs))
    val wLast = Window.partitionBy(col(entityCol), col("bucket"))
      .orderBy(unix_micros(col(tsCol)).desc, col(idCol).desc)
    val obs = events
      .withColumn("bucket", bucket)
      .withColumn("graft_rn", row_number().over(wLast))
      .filter(col("graft_rn") === 1)
      .select(col(entityCol), col("bucket"),
        col(valueCol).as("graft_obs"))
    val grid = events
      .groupBy(col(entityCol))
      .agg(min(bucket).as("graft_b0"), max(bucket).as("graft_b1"))
      .select(col(entityCol),
        explode(sequence(col("graft_b0"), col("graft_b1"))).as("bucket"))
    val wFill = Window.partitionBy(col(entityCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(entityCol, "bucket"), "left")
      .select(col(entityCol), col("bucket"),
        last(col("graft_obs"), ignoreNulls = true).over(wFill).as("value"),
        col("graft_obs").isNotNull.as("is_observed"))
  }

  /** Linear-interpolation variant of [[forwardFill]]: gap ticks take the
    * straight line between the surrounding observations instead of a step
    * — v = v0 + (v1−v0)·(b−b0)/(b1−b0) — the resampling feature stores
    * and charting layers want for continuous metrics. Observed ticks
    * return their own (last-in-bucket) value. The grid spans first..last
    * observed bucket per entity, so every gap tick has both neighbors by
    * construction.
    *
    * Determinism: v0/v1 are carried verbatim; the interpolation is one
    * fixed association of individually-correctly-rounded IEEE ops over
    * exact int64 bucket deltas, identical in any engine; the result
    * rounds to 6 dp. Shape adds one backward-looking and one
    * forward-looking window over the SAME entity partitioning as the
    * fill — still no self-join, grid fan-out unchanged. */
  def interpolate(events: DataFrame, entityCol: String, idCol: String,
                  tsCol: String, valueCol: String,
                  bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    val bucket = call_function("div", unix_micros(col(tsCol)), lit(bucketUs))
    val wLast = Window.partitionBy(col(entityCol), col("bucket"))
      .orderBy(unix_micros(col(tsCol)).desc, col(idCol).desc)
    val obs = events
      .withColumn("bucket", bucket)
      .withColumn("graft_rn", row_number().over(wLast))
      .filter(col("graft_rn") === 1)
      .select(col(entityCol), col("bucket"), col(valueCol).as("graft_obs"))
    val grid = events
      .groupBy(col(entityCol))
      .agg(min(bucket).as("graft_b0"), max(bucket).as("graft_b1"))
      .select(col(entityCol),
        explode(sequence(col("graft_b0"), col("graft_b1"))).as("bucket"))
    val wBack = Window.partitionBy(col(entityCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(col(entityCol)).orderBy(col("bucket"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBucket = when(col("graft_obs").isNotNull, col("bucket"))
    val joined = grid.join(obs, Seq(entityCol, "bucket"), "left")
      .withColumn("graft_v0", last(col("graft_obs"), ignoreNulls = true).over(wBack))
      .withColumn("graft_b0", last(obsBucket, ignoreNulls = true).over(wBack))
      .withColumn("graft_v1", first(col("graft_obs"), ignoreNulls = true).over(wFwd))
      .withColumn("graft_b1", first(obsBucket, ignoreNulls = true).over(wFwd))
    import org.apache.spark.sql.types.DoubleType
    val frac = (col("bucket") - col("graft_b0")).cast(DoubleType) /
      (col("graft_b1") - col("graft_b0")).cast(DoubleType)
    joined.select(col(entityCol), col("bucket"),
      round(when(col("graft_obs").isNotNull, col("graft_obs"))
        .otherwise(col("graft_v0") +
          (col("graft_v1") - col("graft_v0")) * frac), 6).as("value"),
      col("graft_obs").isNotNull.as("is_observed"))
  }
}
