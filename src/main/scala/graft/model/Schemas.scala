package graft.model

import org.apache.spark.sql.types._

/**
 * Schemas for the CoinCap-shaped medallion pipeline.
 *
 * The raw (Bronze) document is a two-field struct: `data` — an array of
 * asset structs whose numerics are decimal strings — and `timestamp`, an
 * epoch in milliseconds (reference: 99-extra-exemplo_dados_vindos_api.json:2,
 * 2035). We declare the schema explicitly rather than inferring it so reads
 * are deterministic and the heterogeneous `tokens` object stays a clean
 * `MapType` (reference infers a sparse struct; it drops the column in Silver
 * anyway — 2-spark_processed_assats_list.py:47-62).
 */
object Schemas {

  /** One asset record as served by the API: all numerics are strings. */
  val assetStruct: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("rank", StringType),
    StructField("symbol", StringType),
    StructField("name", StringType),
    StructField("supply", StringType),
    StructField("maxSupply", StringType),          // null = uncapped supply
    StructField("marketCapUsd", StringType),
    StructField("volumeUsd24Hr", StringType),
    StructField("priceUsd", StringType),
    StructField("changePercent24Hr", StringType),  // nullable, signed
    StructField("vwap24Hr", StringType),
    StructField("explorer", StringType),
    StructField("tokens", MapType(StringType, ArrayType(StringType)))
  ))

  /** Top-level raw poll document (Bronze). */
  val rawSchema: StructType = StructType(Seq(
    StructField("data", ArrayType(assetStruct)),
    StructField("timestamp", LongType)
  ))

  /**
   * Silver `assats_list` row — flat, typed, append-only; grain is
   * (asset id × poll timestamp). Doubles by design: the reference casts the
   * API's 28-digit decimal strings to double and accepts the precision loss
   * (2-spark_processed_assats_list.py:52-58); we reproduce that semantic.
   * `dataReferencia` is kept as the formatted STRING the reference stores
   * (cast to timestamp only at the Gold boundary —
   * 3-spark_curated_analytics_full.py:62).
   */
  final case class AssetRecord(
      id: String,
      rank: Option[Int],
      symbol: String,
      name: String,
      supply: Option[Double],
      max_supply: Option[Double],
      market_cap_usd: Option[Double],
      volume_usd_24hr: Option[Double],
      price_usd: Option[Double],
      change_percent_24hr: Option[Double],
      vwap_24hr: Option[Double],
      explorer: Option[String],
      data_referencia: String,
      data_processamento: String
  )

  /** Movement labels used by the top-movers analysis (exact bytes matter —
    * the oracle hashes output values; 3-spark…py:161,171). */
  val Gainer = "Ganhador"
  val Loser  = "Perdedor"

  /** Supply-status labels (3-spark_curated_analytics_full.py:246-248). */
  val StatusUndefined = "Não Definido"
  val StatusNearLimit = "Próximo do Limite"
  val StatusAvailable = "Disponível"
}
