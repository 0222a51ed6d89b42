package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S13 exchange-info catalog (reference: api_connector.py:145-164) — the
  * full symbol/status table, as a small static dimension DataFrame. At
  * scale this is the canonical broadcast side of every symbol join. The
  * trading-pair filter is P3 (api_connector.py:178-181). Offline harness:
  * a deterministic catalog stands in for the REST response. */
object ExchangeInfo {

  private val bases = Seq("BTC", "ETH", "SOL", "ADA", "XRP", "DOGE", "DOT",
    "LINK", "LTC", "AVAX")
  private val quotes = Seq("USDT", "USDC", "BTC")

  def catalog(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (for {
      b <- bases; q <- quotes if b != q
    } yield (b + q, b, q,
      // deterministic status: a couple of delisted pairs for filter tests
      if ((b + q).hashCode % 7 == 0) "BREAK" else "TRADING"))
      .toDF("symbol", "base_asset", "quote_asset", "status")
  }

  /** P3: active USDT pairs, lexicographically sorted (api_connector.py:
    * 178-182). */
  def usdtTradingPairs(spark: SparkSession): DataFrame =
    catalog(spark)
      .filter(col("symbol").endsWith("USDT") && col("status") === "TRADING")
      .orderBy("symbol")
}
