package graft

import org.apache.spark.sql.functions._
import graft.sources.Landing

/**
 * Golden end-to-end over the reference's captured CoinCap response
 * (99-extra-exemplo_dados_vindos_api.json: 100 assets, poll timestamp
 * 1748056129137 = 2025-05-24T03:08:49 UTC). The fixture is read in place
 * from the read-only reference checkout — data, not code — and the test
 * self-cancels if that checkout isn't present.
 */
class GoldenFixtureSpec extends SparkSpec {

  private val fixturePath =
    java.nio.file.Paths.get("/root/reference/99-extra-exemplo_dados_vindos_api.json")

  test("reference API capture flows bronze → silver → gold with exact values") {
    assume(java.nio.file.Files.isReadable(fixturePath), "reference fixture absent")
    val landing = tmpDir("golden-landing")
    val warehouse = tmpDir("golden-warehouse")
    Landing.injectPoll(landing, java.nio.file.Files.readString(fixturePath),
      1748056129137L)

    val pipeline = new Pipeline(spark, warehouse)
    val dashboard = pipeline.run(landing, "2025-05-24 04:00:00")

    val silver = spark.read.parquet(s"$warehouse/silver/assats_list")
    assert(silver.count() === 100)
    // epoch-ms → 'yyyy-MM-dd HH:mm:ss' two-step (P5): seconds truncated
    assert(silver.select("data_referencia").head.getString(0)
      === "2025-05-24 03:08:49")

    val overview = spark.read.parquet(s"$warehouse/gold/daily_overview")
    val btc = overview.filter(col("id") === "bitcoin").head()
    assert(btc.getAs[Int]("rank") === 1)
    // 28-digit decimal string → double → round 8 (SURVEY §7.2 target)
    assert(btc.getAs[Double]("price_usd") === 107980.78815861)
    assert(btc.getAs[Double]("supply") === 19868975.0)
    assert(btc.getAs[Double]("max_supply") === 21000000.0)
    assert(btc.getAs[Double]("change_percent_24hr") === -2.9871)

    // movers: ≤ 20 rows, labels exact
    val movers = spark.read.parquet(s"$warehouse/gold/top_gainers_losers")
    assert(movers.count() <= 20)
    assert(movers.select("tipo_movimento").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(Set("Ganhador", "Perdedor")))

    // dominance sums to ~100%
    val dom = spark.read.parquet(s"$warehouse/gold/market_dominance")
    val pct = dom.agg(sum("percent_market_cap")).head.getDouble(0)
    assert(math.abs(pct - 100.0) < 0.1)

    // dashboard joins hold: bitcoin row is rank 1 with supply status
    val first = dashboard.head()
    assert(first.getAs[String]("id") === "bitcoin")
    assert(first.getAs[String]("status_oferta_maxima") === "Disponível")
  }
}
