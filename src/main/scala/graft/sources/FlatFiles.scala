package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Flat-file sources/sinks matching the reference's lake layout.
  *
  * Reference: CSV scan feeding producers (`streaming-source/csv_to_orders_topic.py:15`),
  * JSON-lines landed to the lake Hive-partitioned by `date=YYYY-MM-DD`
  * (`ingestion/s3-orders-ingestion.py:42-47`), read back by the DQ job
  * (`curated/data_quality.py:131-132`).
  *
  * Spark-first notes: always pass an explicit schema on read (the reference declares
  * schemas but never uses them, falling back to inference — an extra full pass over the
  * data at 100 TB). Use real `partitionBy` layout + partition discovery instead of the
  * reference's glob paths so Catalyst's PruneFileSourcePartitions can skip date
  * partitions at the source.
  */
object FlatFiles {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Land JSON-lines Hive-partitioned by the given date column (K2 layout). */
  def writePartitionedJson(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).json(path)

  def readPartitionedJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** The landing stamp the consumer applies per flushed batch
    * (`ingestion/s3-orders-ingestion.py:38-40`).
    */
  def stampIngestTime(df: DataFrame): DataFrame =
    df.withColumn("ingest_time",
      date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss"))
}

/** Deterministic synthetic row generator — the Spark-native replacement for the
  * reference's Faker/random producers (`streaming-source/topic_orders_streaming.py:14-21`:
  * ids 1–50, amounts 1–1000, dates within a year).
  *
  * Spark-first notes: `spark.range(n)` partitions the id space across executors; every
  * derived column is pure arithmetic on the id, so generation is embarrassingly parallel,
  * reproducible, and entirely inside whole-stage codegen — no driver-side loops, no RNG
  * state to coordinate.
  */
object Synthetic {

  def orders(spark: SparkSession, n: Long, customers: Long = 50): DataFrame =
    spark.range(n).select(
      (col("id") + 1).as("order_id"),
      (date_add(to_date(lit("2024-01-01")), (col("id") % 365).cast("int")))
        .as("order_date"),
      ((col("id") * 37 % 1000) + 1).cast("double").as("order_amount"),
      (col("id") % customers + 1).as("customer_id"))

  def customers(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      (col("id") + 1).as("customer_id"),
      concat(lit("customer_"), col("id") + 1).as("name"),
      concat(lit("customer_"), col("id") + 1, lit("@example.com")).as("email"),
      element_at(
        array(lit("north"), lit("south"), lit("east"), lit("west")),
        (col("id") % 4 + 1).cast("int")).as("region"),
      (col("id") % 100 + 1).cast("int").as("customer_tenure_days"))
}
