package graft

import org.apache.spark.sql.SparkSession

/**
 * Session factory with the engine's required configuration. Centralized so
 * Verify, Bench, tests, and user code all run with identical semantics.
 *
 * Scale posture (these matter at 1000 executors, set here so local runs
 * exercise the same plans):
 *  - AQE on: runtime shuffle-partition coalescing + skew-join splitting.
 *  - shuffle.partitions sized to the machine locally; on a real cluster
 *    AQE's coalescing makes the initial number far less sensitive.
 *  - UTC session timezone: timestamp semantics must match the DuckDB
 *    oracle and the reference's UTC-epoch handling.
 *  - nanosAsLong: the testdata events table stores TIMESTAMP(NANOS),
 *    which Spark only reads as a raw long (converted to a real timestamp
 *    in Sources.events).
 */
object GraftSession {

  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // reference parity: the reference ran Spark 3.x (ANSI off) — its
      // string→numeric casts turn malformed input into null, never errors
      // (SURVEY §2.2 P2/P3). Spark 4 defaults ANSI on; pin it off.
      .config("spark.sql.ansi.enabled", "false")
      // shuffle/broadcast scratch on tmpfs: local-mode shuffle volume is
      // small but disk-latency-sensitive; on a shared host, /tmp-on-disk
      // periodically starves the shuffle-heavy pipelines (measured 10-60×
      // inflation). On a real cluster this maps to fast local SSDs.
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // TypedImperativeAggregates (collect_top_k, percentile, …) run in
      // ObjectHashAggregateExec, which falls back to SORT-based
      // aggregation after 128 distinct groups per task by default —
      // silently re-introducing the full sort the aggregate exists to
      // avoid. Group states here are O(k) (bounded priority queues), so
      // a large in-memory group count is safe.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")

  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = builder(cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
