package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming lake ingestion — Structured Streaming replacement for the reference's
  * hand-rolled Kafka consumer loop.
  *
  * Reference: `ingestion/s3-orders-ingestion.py` — poll loop (500 ms, ≤10 records), buffer,
  * flush on 5 records OR 5 s, stamp `ingest_time`, write JSON-lines to
  * `{prefix}/{topic}/date=YYYY-MM-DD/...` (SURVEY.md §2.9 T1–T5).
  *
  * Spark-first notes: micro-batching, offset tracking, and at-least-once delivery are the
  * engine's job here — `Trigger.ProcessingTime` replaces the poll loop, the checkpoint
  * replaces auto-commit (upgrading the reference's at-least-once to exactly-once per sink
  * epoch), and `foreachBatch` + `partitionBy(date)` reproduces the landing layout. The
  * count-based flush (5 records) has no exact Structured Streaming analogue; the
  * rate cap (`maxFilesPerTrigger` / `maxOffsetsPerTrigger`) bounds batch size instead.
  */
object LakeWriter {

  /** File-stream stand-in for the Kafka source (connector jar absent offline; the layout,
    * stamping, and trigger semantics are identical). Set `trigger = AvailableNow` to
    * drain-and-stop, `ProcessingTime("5 seconds")` for the reference's cadence.
    */
  def ingestJsonStream(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      dateCol: Column,
      outputDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.json(inputDir)
    val stamped = stream
      .withColumn("date", dateCol)
      .withColumn("ingest_time",
        date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss"))
    stamped.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(idempotentLanding(outputDir) _)
      .start()
  }

  /** Idempotent landing: each micro-batch dynamically OVERWRITES only its own
    * (date, batch_id) partitions instead of appending. A batch replayed after a failure
    * (foreachBatch is at-least-once) rewrites the same partitions, upgrading the landing
    * to effectively exactly-once without any sink-side transaction log.
    */
  def idempotentLanding(outputDir: String)(batch: DataFrame, batchId: Long): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("date", "batch_id")
      .json(outputDir)

  /** The real Kafka path, written against the public Structured Streaming options
    * (`subscribe`, `startingOffsets`, `maxOffsetsPerTrigger`) — runs unmodified where
    * `spark-sql-kafka-0-10` is on the classpath (reference consumer config at
    * `ingestion/s3-orders-ingestion.py:22-29`: earliest offsets, bounded polls).
    */
  def ingestKafkaStream(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      schema: StructType,
      dateCol: Column,
      outputDir: String,
      checkpointDir: String,
      maxOffsetsPerTrigger: Long = 10L,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    val stream = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()
      .select(from_json(col("value").cast("string"), schema).as("r"))
      .select(col("r.*"))
    val stamped = stream
      .withColumn("date", dateCol)
      .withColumn("ingest_time",
        date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss"))
    stamped.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(idempotentLanding(outputDir) _)
      .start()
  }

  /** Producer-side encoding: rows → JSON messages (reference `json.dumps` value
    * serializer, `streaming-source/csv_to_orders_topic.py:7-10`). The `value` column is
    * what a Kafka sink would send.
    */
  def toJsonMessages(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))

  /** Stream → [[graft.catalog.VersionedTable]]: every micro-batch lands as ONE append
    * commit tagged `(checkpointDir, batchId)`, so a batch replayed after a crash
    * deduplicates instead of double-appending — exactly-once into the versioned table
    * (the Delta transactional-streaming-sink shape). Downstream readers get history
    * and as-of reads over the live stream's table for free.
    */
  def streamToVersionedTable(
      df: DataFrame,
      location: String,
      checkpointDir: String,
      partitionBy: Seq[String] = Nil,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // txnApp = the checkpoint location: stable across restarts of this query,
        // distinct between queries — the same identity the engine keys replays on
        graft.catalog.VersionedTable.idempotentAppend(
          batch, location, checkpointDir, batchId, partitionBy): Unit
      }
      .start()

  /** Rate-limited producer: replays a static dataset as an N-messages-per-second JSON
    * stream — the reference's throttled CSV→topic producer
    * (`streaming-source/csv_to_orders_topic.py:27`, `time.sleep(1)` per message; its
    * 1 msg/s is `rowsPerSecond = 1` here). The `rate` source emits a monotonically
    * increasing `value`; an inner join against the row-numbered dataset picks each
    * message in order, so OUTPUT stops by itself once the dataset is replayed (the
    * rate source keeps triggering — stop the query when done, as any producer). The
    * `text` sink writes the raw JSON lines (swap for `format("kafka")` where the
    * connector jar is present — the plan upstream of the sink is unchanged).
    *
    * Message indexing avoids a global window (`row_number` over an unpartitioned
    * Window pulls the dataset into ONE task): range-partition + in-partition
    * sort IS the global `orderCol` order, and zipWithIndex stamps dense
    * per-partition offsets — same indexes, no single-partition sort.
    */
  def rateProducer(
      spark: SparkSession,
      dataset: DataFrame,
      orderCol: String,
      outputDir: String,
      checkpointDir: String,
      rowsPerSecond: Int = 1): StreamingQuery = {
    // localCheckpoint materializes the indexed messages ONCE: a stream-static join
    // re-evaluates the static plan every micro-batch, which would re-run the
    // sort + indexing + JSON encode per trigger for the life of the query
    val ordered = dataset
      .repartitionByRange(col(orderCol)).sortWithinPartitions(orderCol)
      .select(to_json(struct(dataset.columns.map(col): _*)).as("value"))
    val outSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("__idx",
        org.apache.spark.sql.types.LongType, nullable = false),
      ordered.schema("value")))
    val indexed = spark.createDataFrame(
        ordered.rdd.zipWithIndex().map { case (r, i) =>
          org.apache.spark.sql.Row(i, r.getString(0))
        }, outSchema)
      .localCheckpoint()
    val ticks = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toLong).load()
    ticks.join(indexed, ticks("value") === indexed("__idx"))
      .select(indexed("value"))
      .writeStream
      .format("text")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .start()
  }
}
