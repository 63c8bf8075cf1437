package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Interval (range) join on event time: pairs (l, r) with equal keys and
 * 0 ≤ t_l − t_r ≤ maxDelay. Spark plans a naive time-range predicate as a
 * broadcast-nested-loop or a per-key cross product; this implementation
 * buckets time into maxDelay-wide bins (microsecond precision — millisecond truncation would disagree with exact interval arithmetic at the boundary) so candidates reduce to TWO
 * equi-join probes per left row (its own bin and the previous one) — the
 * standard bucketized range-join, turning O(n²/key) into hash lookups.
 * The exact predicate filters bucket-edge false positives afterwards.
 */
object IntervalJoin {

  /**
   * @param left     later-event side; columns prefixed `l_` in the output
   *                 except the keys
   * @param right    earlier-event side; columns prefixed `r_`
   * @param keys     equi-join keys (same names both sides)
   * @param timeCol  timestamp column name (both sides)
   * @param maxDelayMicros window size: keep pairs with 0 ≤ t_l − t_r ≤ this
   */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            timeCol: String, maxDelayMicros: Long): DataFrame = {
    def prefixed(df: DataFrame, p: String) =
      df.columns.filterNot(keys.contains).foldLeft(df) { (d, c) =>
        d.withColumnRenamed(c, p + c)
      }
    val l = prefixed(left, "l_")
      .withColumn("_lb", (unix_micros(col(s"l_$timeCol")) / maxDelayMicros)
        .cast("bigint"))
      // probe the right row's own bucket and the one before it
      .withColumn("_bucket", explode(array(col("_lb"), col("_lb") - 1)))
      .drop("_lb")
    val r = prefixed(right, "r_")
      .withColumn("_bucket", (unix_micros(col(s"r_$timeCol")) / maxDelayMicros)
        .cast("bigint"))
    val delta = unix_micros(col(s"l_$timeCol")) - unix_micros(col(s"r_$timeCol"))
    l.join(r, keys :+ "_bucket")
      .filter(delta >= 0 && delta <= maxDelayMicros)
      .drop("_bucket")
  }
}
