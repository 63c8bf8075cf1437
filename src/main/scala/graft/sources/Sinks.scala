package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Sinks. The reference dual-writes every Gold analysis: Delta append (full
 * history) + BigQuery overwrite ("current" view) —
 * 3-spark_curated_analytics_full.py:80-112. In this zero-egress environment
 * Delta jars are absent, so the append/overwrite contracts are realized as
 * Parquet; the query semantics the engine relies on (append + window-dedup
 * to the latest snapshot) never use Delta-only features.
 */
object Sinks {

  /** S4/S7: append-mode history sink. */
  def appendHistory(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** S8: overwrite-mode "current" sink, registered as a temp view so the
    * dashboard SQL (§2.8 Q5) can address it by name, like BigQuery does. */
  def overwriteCurrent(df: DataFrame, path: String, table: String,
                       spark: SparkSession): Unit = {
    df.write.mode(SaveMode.Overwrite).parquet(path)
    spark.read.parquet(path).createOrReplaceTempView(table)
  }

  /** S9: one analysis → both sinks. Caller is expected to have cached the
    * upstream plan (the reference re-runs the whole lineage per action —
    * SURVEY §4.4 inefficiency #1 — we don't). */
  def writeAnalysis(df: DataFrame, historyPath: String, currentPath: String,
                    table: String, spark: SparkSession): Unit = {
    appendHistory(df, historyPath)
    overwriteCurrent(df, currentPath, table, spark)
  }
}
