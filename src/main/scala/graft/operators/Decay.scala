package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame

/**
 * Recency-weighted (exponential half-life) aggregation — the freshness
 * scoring step of corpus/engagement ranking: an event `ageDays` old
 * contributes `value · 2^(−ageDays/halfLife)`, so signals older than a
 * few half-lives decay to noise without any hard cutoff.
 *
 * Age is measured against the corpus max timestamp (not wall-clock), so
 * the result is a pure function of the data — reproducible across runs
 * and engines. Per-term products are rounded to 6 dp and accumulated as
 * DECIMAL(18,6) (the project's order-independent float-sum rule).
 *
 * Shape: one metadata-scale max-ts aggregate broadcast back onto the
 * scan, a narrow weight projection, then one hash-agg on the keys —
 * map-side combinable, no window, no sort.
 */
object Decay {

  /** Per-key decayed sum: (keys…, n_events, decayed_sum). `tsCol` must be
    * a timestamp column; weights use epoch-microsecond ages. */
  def halfLifeSum(df: DataFrame, tsCol: String, valueCol: String,
                  keyCols: Seq[String], halfLifeDays: Double): DataFrame = {
    require(halfLifeDays > 0, s"halfLifeDays must be positive: $halfLifeDays")
    val asOf = df.agg(max(unix_micros(col(tsCol))).as("graft_asof"))
    val ageDays = (col("graft_asof") - unix_micros(col(tsCol)))
      .cast(DoubleType) / 86400000000.0
    df.crossJoin(broadcast(asOf))
      .withColumn("graft_term",
        round(col(valueCol) * pow(lit(2.0), -ageDays / halfLifeDays), 6)
          .cast(DecimalType(18, 6)))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        sum(col("graft_term")).as("decayed_sum"))
  }
}
