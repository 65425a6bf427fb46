package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Harness-table loader (see /root/repo/TESTDATA.md). One parquet file per table. */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark has no native type for;
    // read nanos as long and convert at use sites (see eventsMicros).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with ts decoded from raw parquet NANOS to a proper microsecond timestamp.
    * Integer `div` (not `/`) — double division would lose precision on ~1.7e18 ns values.
    */
  def eventsMicros(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
