package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Schemas

/**
 * Sources for the engine.
 *
 *  - Bronze: multiline JSON poll documents in a landing directory
 *    (reference S3: 2-spark_processed_assats_list.py:37,41). The glob
 *    `coincap_data_*.json` naturally excludes files already marked
 *    `read_` by the processed-file protocol (S5).
 *  - Testdata: the driver-generated star-schema parquet tables.
 *
 * All reads are plain `spark.read` relations so Catalyst gets full column
 * pruning / predicate pushdown into the scan.
 */
object Sources {

  /** Batch Bronze scan: explicit schema (deterministic; see Schemas.rawSchema
    * scaladoc) over every unconsumed poll file in the landing dir. */
  def rawPolls(spark: SparkSession, landingDir: String): DataFrame =
    spark.read
      .option("multiline", "true")
      .schema(Schemas.rawSchema)
      .json(s"$landingDir/coincap_data_*.json")

  /** Schema-inference variant kept for parity with the reference's
    * `spark.read.json` (2-spark_processed_assats_list.py:41). */
  def rawPollsInferred(spark: SparkSession, landingDir: String): DataFrame =
    spark.read
      .option("multiline", "true")
      .json(s"$landingDir/coincap_data_*.json")

  /** A star-schema testdata table: `spark.read.parquet(s"$dir/$name.parquet")`. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  /** The events table's `ts` physical type has varied across testdata
    * generations: TIMESTAMP(NANOS) (Spark reads only as a raw long under
    * spark.sql.legacy.parquet.nanosAsLong=true — set in GraftSession),
    * TIMESTAMP(MICROS) without UTC adjustment (read as TIMESTAMP_NTZ),
    * and UTC-adjusted TIMESTAMP. Normalize ALL of them to TimestampType
    * here so every downstream operator (unix_micros, bigint casts,
    * windows) sees one uniform timestamp column. The session timezone is
    * UTC, so the NTZ→TZ cast is value-preserving. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(table(spark, dir, "events"))

  /** Normalize an events-shaped frame's `ts` to TimestampType whatever
    * the parquet generation produced (raw nanos long / NTZ micros /
    * UTC-adjusted). Public because streaming readers built directly on
    * the parquet file (readStream has no Sources.events path) need the
    * identical normalization — watermarks reject TIMESTAMP_NTZ. */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
