package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.GoldAnalytics
import graft.etl.BronzeToSilver
import graft.sources.{Landing, Sinks, Sources}

/**
 * End-to-end medallion pipeline — the Spark-native collapse of the
 * reference's Airflow DAG (4-dag_assats-list-full.py:85-192): the three
 * process boundaries (Pub/Sub → Cloud Run ingestion, two Dataproc batch
 * submits) become sequential method calls on one SparkSession, with the
 * same fail-fast behavior (missing Silver table → exception, reference
 * 3-spark_curated_analytics_full.py:55-57).
 */
final class Pipeline(spark: SparkSession, warehouseDir: String) {

  private def gold(name: String) = s"$warehouseDir/gold/$name"

  /** Bronze→Silver: read pending polls, explode+type, append, mark read
    * (S3, G1, P1–P6, S4, S5). */
  def bronzeToSilver(landingDir: String, processedAt: String): Unit = {
    require(Landing.pendingFiles(landingDir).nonEmpty,
      s"validation failed: no pending coincap_data_*.json in $landingDir")
    val silver = BronzeToSilver(Sources.rawPolls(spark, landingDir), processedAt)
    Sinks.appendHistory(silver, s"$warehouseDir/silver/assats_list")
    Landing.markRead(landingDir)
  }

  /** Silver→Gold: latest-snapshot dedup once (cached), then the four
    * analyses, each dual-written (history append + current overwrite). */
  def silverToGold(analysisTs: String): Unit = {
    val silver = spark.read.parquet(s"$warehouseDir/silver/assats_list")
    silver.count()   // reference's only data-quality check (3-spark…py:54)

    val history = silver.withColumn("data_referencia_dt",
      org.apache.spark.sql.functions.col("data_referencia").cast("timestamp"))
    val latest = GoldAnalytics.latestSnapshot(silver).cache()

    def write(df: DataFrame, name: String): Unit =
      Sinks.writeAnalysis(df, gold(name) + "_history", gold(name), name, spark)

    write(GoldAnalytics.dailyOverview(latest, analysisTs), "daily_overview")
    write(GoldAnalytics.topGainersLosers(latest, history, analysisTs),
      "top_gainers_losers")
    GoldAnalytics.marketDominance(latest, analysisTs)
      .foreach(write(_, "market_dominance"))   // skip guard: total null/≤0
    write(GoldAnalytics.supplyDynamics(latest, analysisTs), "supply_dynamics")
    latest.unpersist()
  }

  /** Full run: ingest fixture polls → validate → Silver → Gold → dashboard. */
  def run(landingDir: String, runTs: String): DataFrame = {
    bronzeToSilver(landingDir, runTs)
    silverToGold(runTs)
    GoldAnalytics.dashboard(spark)
  }
}
