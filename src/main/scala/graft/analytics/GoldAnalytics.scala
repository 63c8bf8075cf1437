package graft.analytics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Schemas
import graft.operators.LatestSnapshot

/**
 * The four Gold analyses + dashboard query — the reference's entire query
 * surface (3-spark_curated_analytics_full.py:114-266;
 * 5-sql_exportacao_de_dados_dashboard.sql). Input: Silver `assats_list`.
 *
 * All transforms share one cached latest-snapshot plan (the reference
 * recomputes the scan+window lineage for every one of ~9 actions — SURVEY
 * §4.4 — caching preserves semantics and removes the 8× recompute).
 */
object GoldAnalytics {

  /** Common prep: typed timestamp + latest snapshot per asset
    * (3-spark…py:62-74). */
  def latestSnapshot(silver: DataFrame): DataFrame = {
    val withTs = silver.withColumn("data_referencia_dt",
      col("data_referencia").cast("timestamp"))
    LatestSnapshot(withTs, Seq("id"), col("data_referencia_dt"))
  }

  /** Q1 `daily_overview` (3-spark…py:114-151): latest snapshot, rounded
    * projection, rank order, audit column. */
  def dailyOverview(latest: DataFrame, analysisTs: String): DataFrame =
    latest.select(
      col("id"), col("name"), col("symbol"), col("rank"),
      round(col("price_usd"), 8).as("price_usd"),
      round(col("market_cap_usd"), 2).as("market_cap_usd"),
      round(col("volume_usd_24hr"), 2).as("volume_usd_24hr"),
      round(col("change_percent_24hr"), 4).as("change_percent_24hr"),
      round(col("vwap_24hr"), 8).as("vwap_24hr"),
      round(col("supply"), 0).as("supply"),
      round(col("max_supply"), 0).as("max_supply"),
      col("explorer"),
      col("data_referencia_dt").as("data_referencia"))
    .orderBy(col("rank").asc)
    .withColumn("data_processamento_analise", lit(analysisTs).cast("timestamp"))

  /**
   * Q2 `top_gainers_losers` (3-spark…py:153-196): top-10 gainers from the
   * LATEST snapshot ∪ top-10 losers from the FULL history — the history
   * source for losers is a reference quirk reproduced on purpose
   * (3-spark…py:168 reads `df_assats_list`, not `df_latest_assats`).
   * `orderBy(...).limit(10)` compiles to `TakeOrderedAndProject` — a
   * per-partition top-K + driver merge, no global sort at any scale.
   */
  def topGainersLosers(latest: DataFrame, history: DataFrame,
                       analysisTs: String): DataFrame = {
    def project(df: DataFrame, movement: String) =
      df.select(
        col("name"), col("symbol"),
        round(col("change_percent_24hr"), 4).as("change_percent_24hr"),
        round(col("price_usd"), 8).as("price_usd"),
        lit(movement).as("tipo_movimento"),
        col("data_referencia_dt").as("data_referencia"))

    val gainers = project(
      latest.filter(col("change_percent_24hr").isNotNull)
        .orderBy(col("change_percent_24hr").desc).limit(10), Schemas.Gainer)
    val losers = project(
      history.filter(col("change_percent_24hr").isNotNull)
        .orderBy(col("change_percent_24hr").asc).limit(10), Schemas.Loser)

    gainers.union(losers)   // positional, duplicates kept (unionAll parity)
      .withColumn("data_processamento_analise", lit(analysisTs).cast("timestamp"))
  }

  /**
   * Q3 `market_dominance` (3-spark…py:199-232): scalar Σ market cap pulled
   * to the driver (the reference's observable collect() round-trip + null/≤0
   * skip guard), then percent-of-total per asset. Returns None when the
   * guard trips — the reference skips the analysis entirely.
   */
  def marketDominance(latest: DataFrame, analysisTs: String): Option[DataFrame] = {
    val total = Option(
      latest.agg(sum("market_cap_usd")).head.getAs[java.lang.Double](0))
      .map(_.doubleValue())
    total.filter(_ > 0).map { t =>
      latest.filter(col("market_cap_usd").isNotNull)
        .withColumn("percent_market_cap",
          round(col("market_cap_usd") / lit(t) * 100, 4))
        .select(
          col("name"), col("symbol"),
          round(col("market_cap_usd"), 2).as("market_cap_usd"),
          col("percent_market_cap"),
          col("data_referencia_dt").as("data_referencia"))
        .orderBy(col("percent_market_cap").desc)
        .withColumn("data_processamento_analise", lit(analysisTs).cast("timestamp"))
    }
  }

  /** Q4 `supply_dynamics` (3-spark…py:234-266): supply filter, mcap/unit
    * ratio, 3-way CASE on max_supply (exact Portuguese labels — the oracle
    * hashes output bytes). */
  def supplyDynamics(latest: DataFrame, analysisTs: String): DataFrame =
    latest
      .filter(col("supply").isNotNull && col("supply") > 0 &&
        col("market_cap_usd").isNotNull)
      .withColumn("market_cap_per_unit_supply",
        round(col("market_cap_usd") / col("supply"), 8))
      .withColumn("status_oferta_maxima",
        when(col("max_supply").isNull, lit(Schemas.StatusUndefined))
          .otherwise(when(col("supply") >= col("max_supply"),
            lit(Schemas.StatusNearLimit))
            .otherwise(lit(Schemas.StatusAvailable))))
      .select(
        col("name"), col("symbol"),
        round(col("supply"), 0).as("supply"),
        round(col("max_supply"), 0).as("max_supply"),
        col("market_cap_per_unit_supply"), col("status_oferta_maxima"),
        col("data_referencia_dt").as("data_referencia"))
      .orderBy(col("market_cap_per_unit_supply").desc)
      .withColumn("data_processamento_analise", lit(analysisTs).cast("timestamp"))

  /**
   * Q5 dashboard master (5-sql_exportacao_de_dados_dashboard.sql:1-50):
   * 3-way LEFT JOIN of the Gold tables on (symbol, data_referencia), filtered
   * to the latest data_referencia via an uncorrelated scalar subquery,
   * ordered by rank. Runs over the registered "current" views. The Gold
   * tables are small (≤ ~100 rows) → Catalyst broadcasts every join side;
   * the fan-out on non-unique `symbol` is reference behavior, kept as-is.
   */
  val dashboardSql: String =
    """SELECT
      |  overview.id, overview.name, overview.symbol, overview.rank,
      |  overview.price_usd, overview.market_cap_usd, overview.volume_usd_24hr,
      |  overview.change_percent_24hr, overview.vwap_24hr, overview.supply,
      |  overview.max_supply, overview.explorer, overview.data_referencia,
      |  supply.market_cap_per_unit_supply, supply.status_oferta_maxima,
      |  dominance.percent_market_cap, movers.tipo_movimento
      |FROM daily_overview AS overview
      |LEFT JOIN supply_dynamics AS supply
      |  ON overview.symbol = supply.symbol
      | AND overview.data_referencia = supply.data_referencia
      |LEFT JOIN market_dominance AS dominance
      |  ON overview.symbol = dominance.symbol
      | AND overview.data_referencia = dominance.data_referencia
      |LEFT JOIN top_gainers_losers AS movers
      |  ON overview.symbol = movers.symbol
      | AND overview.data_referencia = movers.data_referencia
      |WHERE overview.data_referencia =
      |  (SELECT MAX(data_referencia) FROM daily_overview)
      |ORDER BY overview.rank ASC
      |""".stripMargin

  def dashboard(spark: SparkSession): DataFrame = spark.sql(dashboardSql)
}
