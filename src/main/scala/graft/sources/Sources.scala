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
  /** The events table carries a parquet TIMESTAMP(NANOS) `ts`, which Spark
    * reads only as a raw long (spark.sql.legacy.parquet.nanosAsLong=true —
    * set in GraftSession). Convert to a microsecond timestamp here so every
    * downstream operator sees a real timestamp column (the testdata has no
    * sub-microsecond components). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
