package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{LakeWriter, Sessionize, StreamAggregates}

class StreamingSpec extends AnyFunSuite with SharedSpark {

  test("ingest: partitioned landing layout, ingest_time stamp, checkpointed exactly-once") {
    val src = Tables.eventsMicros(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
    val in = Files.createTempDirectory("si_in").toString
    val out = Files.createTempDirectory("si_out").toString
    val chk = Files.createTempDirectory("si_chk").toString
    src.write.mode("overwrite").json(in)

    val dateCol = date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd")
    LakeWriter.ingestJsonStream(spark, in, src.schema, dateCol, out, chk)
      .awaitTermination()

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("date=")))

    val outSchema = org.apache.spark.sql.types.StructType(src.schema.fields)
      .add("ingest_time", org.apache.spark.sql.types.StringType)
      .add("date", org.apache.spark.sql.types.StringType)
      .add("batch_id", org.apache.spark.sql.types.StringType)
    val landed = spark.read.schema(outSchema).json(out)
    assert(landed.count() === src.count())
    assert(landed.filter(col("ingest_time").isNull).count() === 0)

    // re-run against the same checkpoint: no files reprocessed, no duplicates
    LakeWriter.ingestJsonStream(spark, in, src.schema, dateCol, out, chk)
      .awaitTermination()
    assert(spark.read.schema(outSchema).json(out).count() === src.count())
  }

  test("stream into versioned table: micro-batches commit, restart appends nothing twice") {
    val src = Tables.eventsMicros(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val in = Files.createTempDirectory("vt_stream_in").toString
    val loc = Files.createTempDirectory("vt_stream_loc").toString
    val chk = Files.createTempDirectory("vt_stream_chk").toString
    src.write.mode("overwrite").json(in)

    val stream = spark.readStream.schema(src.schema).json(in)
    LakeWriter.streamToVersionedTable(stream, loc, chk).awaitTermination()

    val vt = graft.catalog.VersionedTable
    assert(vt.read(spark, loc).count() === src.count())
    val cs = vt.commits(spark, loc)
    assert(cs.nonEmpty && cs.forall(_.operation === "append"))
    // the commit carries the transactional identity replays dedupe on
    assert(cs.forall(c => c.txn_app === chk && c.txn_id >= 0))

    // restart against the same checkpoint: no batch reprocessed, no rows duplicated
    LakeWriter.streamToVersionedTable(
      spark.readStream.schema(src.schema).json(in), loc, chk).awaitTermination()
    assert(vt.read(spark, loc).count() === src.count())
    assert(vt.commits(spark, loc).size === cs.size)
  }

  test("rate producer: throttled replay delivers every row in order, then goes quiet") {
    import spark.implicits._
    val rows = (1 to 6).map(i => (i.toLong, s"msg$i"))
    val ds = rows.toDF("order_id", "payload")
    val out = Files.createTempDirectory("rp_out").toString
    val chk = Files.createTempDirectory("rp_chk").toString

    val t0 = System.nanoTime()
    val q = LakeWriter.rateProducer(spark, ds, orderCol = "order_id",
      outputDir = out, checkpointDir = chk, rowsPerSecond = 3)
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def landedCount(): Long =
        try spark.read.textFile(out).count() catch { case _: Throwable => 0L }
      while (landedCount() < rows.size && System.nanoTime() < deadline)
        Thread.sleep(200)
      val elapsed = (System.nanoTime() - t0) / 1e9
      val landed = spark.read.textFile(out).collect().toSeq
      assert(landed.size === rows.size, s"only ${landed.size} messages landed")
      // every message is intact JSON and replay preserves dataset order
      val parsed = spark.read.json(spark.createDataset(landed))
        .orderBy("order_id").collect()
      assert(parsed.map(_.getAs[Long]("order_id")).toSeq === rows.map(_._1))
      assert(parsed.map(_.getAs[String]("payload")).toSeq === rows.map(_._2))
      // 6 messages at 3/s cannot arrive instantaneously — the throttle is real
      assert(elapsed >= 1.0, s"6 msgs at 3/s landed in ${elapsed}s — no throttling?")
    } finally q.stop()
  }

  test("landing is idempotent under batch replay (dynamic partition overwrite)") {
    val src = Tables.eventsMicros(spark, sf)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("date"))
    val out = Files.createTempDirectory("si_replay").toString
    LakeWriter.idempotentLanding(out)(src, 7L)
    val first = spark.read.json(out).count()
    // replay the SAME batch (at-least-once delivery after a failure)
    LakeWriter.idempotentLanding(out)(src, 7L)
    assert(spark.read.json(out).count() === first)
    // a NEW batch with different data lands additively
    LakeWriter.idempotentLanding(out)(src.limit(10), 8L)
    assert(spark.read.json(out).count() === first + 10)
  }

  test("streaming exact dedup: duplicates within the watermark horizon are dropped") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val deduped = StreamingDedup.exactDedupStream(
      mem.toDF().toDF("doc_id", "ts", "text"), eventTimeCol = "ts", delay = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00"), "doc one"),
        (2L, Timestamp.valueOf("2024-01-01 10:00:10"), "doc two"))
      q.processAllAvailable()
      // a later micro-batch re-delivers doc one's text within the horizon
      mem.addData((3L, Timestamp.valueOf("2024-01-01 10:01:00"), "doc one"),
        (4L, Timestamp.valueOf("2024-01-01 10:01:10"), "doc three"))
      q.processAllAvailable()
      val out = spark.table("sdedup_out").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(out === Set(1L, 2L, 4L), "duplicate doc_id 3 must be deduped")
    } finally q.stop()
  }

  test("gopher gate composes with a live stream: junk rows never reach the sink") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // a pure per-row filter needs no state/watermark — it must run as-is on a stream
    val gated = graft.ops.TextAnalysis.gopherFilter(
      mem.toDF().toDF("doc_id", "text"),
      graft.ops.TextAnalysis.GopherConfig(minWords = 5, minStopHits = 1))
    val q = gated.writeStream.format("memory").queryName("gopher_stream_out")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "the quick brown fox jumps over that lazy dog with joy"),
        (2L, "too short"),
        (3L, "zz qq ww rr tt yy uu ii"))
      q.processAllAvailable()
      val out = spark.table("gopher_stream_out").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(out === Set(1L), "only the clean document may pass the streamed gate")
    } finally q.stop()
  }

  test("multimodal decode composes with a live stream: features emitted per batch") {
    import spark.implicits._
    implicit val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[graft.ops.Multimodal.MediaRecord]
    // mapPartitions decode is stateless per-row work — it must run on a stream as-is
    val feats = graft.ops.Multimodal.decode(mem.toDS()).toDF()
    val q = feats.writeStream.format("memory").queryName("mm_stream_out")
      .outputMode("append").start()
    try {
      val png = graft.ops.Multimodal.encodePng("stream me".getBytes("UTF-8"))
      mem.addData(
        graft.ops.Multimodal.MediaRecord(1L, "image/png", png),
        graft.ops.Multimodal.MediaRecord(2L, "image/png", Array[Byte](9, 9)))
      q.processAllAvailable()
      val out = spark.table("mm_stream_out")
        .select("doc_id", "width").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
      assert(out(1L) === 32 + 9 % 97, "decoded width must follow the encoder contract")
      assert(out(2L) === -1, "undecodable payload keeps its row with null features")
    } finally q.stop()
  }

  test("streaming DQ gate: violating rows quarantine, clean rows curate") {
    import graft.streaming.StreamingDq
    val src = Tables.eventsMicros(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        // plant violations: every 10th event gets a negative value
        when(col("event_id") % 10 === 0, -col("value")).otherwise(col("value"))
          .as("value"),
        unix_micros(col("ts")).as("ts_us"))
    val in = Files.createTempDirectory("dqs_in").toString
    val curated = Files.createTempDirectory("dqs_cur").toString
    val quarantine = Files.createTempDirectory("dqs_quar").toString
    val chk = Files.createTempDirectory("dqs_chk").toString
    src.write.mode("overwrite").json(in)

    StreamingDq.gatedIngest(spark, in, src.schema,
      dateCol = date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd"),
      curatedDir = curated, quarantineDir = quarantine, checkpointDir = chk,
      completenessColumns = Seq("event_id", "value"),
      rowRules = Seq("value_positive" -> (col("value") > 0)),
      accuracyThresholdPct = 50.0) // 10% planted violations: row-route, don't reject batch
      .awaitTermination()

    val curatedDf = spark.read.json(curated)
    val quarantinedDf = spark.read.json(quarantine)
    val expectedBad = src.filter(col("value") <= 0).count()
    assert(quarantinedDf.count() === expectedBad)
    assert(curatedDf.count() === src.count() - expectedBad)
    assert(curatedDf.filter(col("value") <= 0).count() === 0)
  }

  test("streaming DQ gate: a batch failing aggregate checks quarantines wholesale") {
    import graft.streaming.StreamingDq
    val src = Tables.eventsMicros(spark, sf)
      .select(col("event_id"), (-abs(col("value"))).as("value"),
        unix_micros(col("ts")).as("ts_us"))
    val in = Files.createTempDirectory("dqw_in").toString
    val curated = Files.createTempDirectory("dqw_cur").toString
    val quarantine = Files.createTempDirectory("dqw_quar").toString
    val chk = Files.createTempDirectory("dqw_chk").toString
    src.write.mode("overwrite").json(in)
    StreamingDq.gatedIngest(spark, in, src.schema,
      dateCol = date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd"),
      curatedDir = curated, quarantineDir = quarantine, checkpointDir = chk,
      completenessColumns = Seq("event_id"),
      rowRules = Seq("value_positive" -> (col("value") > 0)))
      .awaitTermination()
    assert(spark.read.json(quarantine).count() === src.count())
    assert(new java.io.File(curated).listFiles() == null ||
      !new java.io.File(curated).listFiles().exists(_.getName.startsWith("date=")))
  }

  test("windowed agg over a live MemoryStream matches the batch plan") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Timestamp, String, Double)]
    val df = events.toDF().toDF("ts", "event_type", "value")
    val q = StreamAggregates.hourlyEventStats(df)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Complete()).start()
    events.addData(
      (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.5),
      (Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.5),
      (Timestamp.valueOf("2024-01-01 11:05:00"), "view", 4.0))
    q.processAllAvailable()
    val got = spark.table("hourly_out")
      .orderBy("bucket_start", "event_type")
      .collect()
    q.stop()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("n_events") === 2 && got(0).getAs[Double]("total_value") === 4.0)
    assert(got(1).getAs[String]("event_type") === "view")
  }

  test("stream-stream join: range condition matches within lookback, excludes outside") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val orders = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val o = orders.toDF().toDF("user_id", "order_ts", "order_id")
    val c = clicks.toDF().toDF("user_id", "click_ts", "page")
    val joined = StreamAggregates.streamStreamJoin(
      o, c, key = "user_id", leftTs = "order_ts", rightTs = "click_ts",
      lookback = "1 hour")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append()).start()
    clicks.addData(
      (1L, Timestamp.valueOf("2024-01-01 09:30:00"), "home"),   // within lookback
      (1L, Timestamp.valueOf("2024-01-01 07:00:00"), "old"),    // outside lookback
      (2L, Timestamp.valueOf("2024-01-01 09:45:00"), "search")) // other user
    orders.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 100L))
    q.processAllAvailable()
    val got = spark.table("ssj_out").collect()
    q.stop()
    assert(got.length === 1)
    assert(got(0).getAs[String]("page") === "home")
    assert(got(0).getAs[Long]("order_id") === 100L)
  }

  test("streaming daily sales: stream-static dim join + 1-day windows match batch gold") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val customers = Seq((1L, "EAST"), (2L, "WEST")).toDF("customer_id", "region")
    val orders = MemoryStream[(Long, Long, Timestamp, Double)]
    val df = orders.toDF().toDF("order_id", "customer_id", "order_date", "order_amount")
    val q = StreamAggregates.streamingDailySales(df, customers)
      .writeStream.format("memory").queryName("sds_out")
      .outputMode(OutputMode.Complete()).start()
    orders.addData(
      (1L, 1L, Timestamp.valueOf("2024-03-01 09:00:00"), 10.0),
      (2L, 1L, Timestamp.valueOf("2024-03-01 17:00:00"), 30.0),
      (3L, 2L, Timestamp.valueOf("2024-03-01 12:00:00"), 5.0),
      (4L, 1L, Timestamp.valueOf("2024-03-02 08:00:00"), 7.0))
    q.processAllAvailable()
    val got = spark.table("sds_out").orderBy("sale_date", "region").collect()
    q.stop()
    assert(got.length === 3)
    val east1 = got(0)
    assert(east1.getAs[String]("sale_date") === "2024-03-01")
    assert(east1.getAs[String]("region") === "EAST")
    assert(east1.getAs[Long]("total_orders") === 2L)
    assert(east1.getAs[Double]("total_revenue") === 40.0)
    assert(east1.getAs[Double]("avg_order_value") === 20.0)
    assert(got(1).getAs[String]("region") === "WEST")
    assert(got(2).getAs[String]("sale_date") === "2024-03-02")
  }

  test("batch sessionization: gaps split sessions, totals preserved") {
    import spark.implicits._
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      (2L, Timestamp.valueOf("2024-01-01 10:10:00"), 1L), // same session (10 min gap)
      (3L, Timestamp.valueOf("2024-01-01 11:30:00"), 1L), // new session (80 min gap)
      (4L, Timestamp.valueOf("2024-01-01 10:00:00"), 2L)
    ).toDF("event_id", "ts", "user_id")
    val sessions = Sessionize.batch(ev).orderBy("user_id", "session_seq").collect()
    assert(sessions.length === 3)
    assert(sessions(0).getAs[Long]("n_events") === 2)
    assert(sessions(1).getAs[Long]("n_events") === 1)
    assert(Sessionize.batch(ev).agg(sum("n_events")).first().getLong(0) === 4)
  }

  test("session_window sessionization: matches batch sessions off-boundary, splits at gap") {
    import spark.implicits._
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      (2L, Timestamp.valueOf("2024-01-01 10:10:00"), 1L), // merges (10 < 30 min)
      (3L, Timestamp.valueOf("2024-01-01 11:30:00"), 1L), // splits (80 min gap)
      (4L, Timestamp.valueOf("2024-01-01 10:00:00"), 2L),
      (5L, Timestamp.valueOf("2024-01-01 10:30:00"), 2L)  // exactly-at-gap boundary
    ).toDF("event_id", "ts", "user_id")
    val got = Sessionize.sessionWindows(ev)
      .orderBy("user_id", "session_start").collect()
    // user 1: two sessions, same membership as Sessionize.batch
    assert(got.count(_.getLong(0) == 1L) === 2)
    assert(got(0).getAs[Long]("n_events") === 2)
    // session_end = last event + gap (merged-window end)
    assert(got(0).getAs[Timestamp]("session_end") ===
      Timestamp.valueOf("2024-01-01 10:40:00"))
    // boundary pinned: touching windows MERGE — an event at exactly the gap stays
    // in-session, agreeing with batch's `gap > threshold` split rule
    val u2 = got.filter(_.getLong(0) == 2L)
    assert(u2.length === 1 && u2(0).getAs[Long]("n_events") === 2)
    val batchU2 = Sessionize.batch(ev).filter(col("user_id") === 2L).collect()
    assert(batchU2.length === 1 && batchU2(0).getAs[Long]("n_events") === 2)
  }

  test("streaming session_window: watermarked sessions emit on close in append mode") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = MemoryStream[(Long, Timestamp, Long)]
    val df = events.toDF().toDF("event_id", "ts", "user_id")
    val q = Sessionize.sessionWindows(df.withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("sw_out")
      .outputMode(OutputMode.Append()).start()
    events.addData(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 9L),
      (2L, Timestamp.valueOf("2024-01-01 10:05:00"), 9L))
    q.processAllAvailable()
    // watermark still at-or-before session end: nothing final yet
    events.addData((3L, Timestamp.valueOf("2024-01-01 12:00:00"), 9L))
    q.processAllAvailable()
    // advance watermark past the second session too, closing it
    events.addData((4L, Timestamp.valueOf("2024-01-01 14:00:00"), 9L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sw_out").orderBy("session_start").collect()
    assert(out.length >= 2)
    assert(out(0).getAs[Long]("n_events") === 2)
    assert(out(0).getAs[Timestamp]("session_start") ===
      Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(out(0).getAs[Timestamp]("session_end") ===
      Timestamp.valueOf("2024-01-01 10:35:00"))
    assert(out(1).getAs[Long]("n_events") === 1)
  }

  test("stateful streaming runs on the RocksDB state store (large-state path)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val saved = spark.conf.getOption(GraftSession.rocksDbStateKey)
    spark.conf.set(GraftSession.rocksDbStateKey, GraftSession.rocksDbStateProvider)
    try {
      val events = MemoryStream[(Long, Timestamp, Long)]
      val df = events.toDF().toDF("event_id", "ts", "user_id")
      val q = Sessionize.sessionWindows(df.withWatermark("ts", "10 minutes"))
        .writeStream.format("memory").queryName("rocks_out")
        .outputMode(OutputMode.Append()).start()
      events.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
        (2L, Timestamp.valueOf("2024-01-01 10:05:00"), 1L))
      q.processAllAvailable()
      events.addData((3L, Timestamp.valueOf("2024-01-01 12:00:00"), 1L))
      q.processAllAvailable()
      val progress = q.lastProgress
      q.stop()
      val out = spark.table("rocks_out").collect()
      assert(out.length === 1 && out(0).getAs[Long]("n_events") === 2)
      // the state operator really ran RocksDB-backed
      assert(progress.stateOperators.nonEmpty)
      assert(progress.json.contains("rocksdb"),
        s"expected rocksdb metrics in progress: ${progress.json}")
    } finally {
      saved match {
        case Some(v) => spark.conf.set(GraftSession.rocksDbStateKey, v)
        case None    => spark.conf.unset(GraftSession.rocksDbStateKey)
      }
    }
  }

  test("stateful mapGroupsWithState accumulates per-user counts across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val events = MemoryStream[Sessionize.SessionEvent]
    val snapshots = Sessionize.SessionCounter(events.toDS())
    val q = snapshots.writeStream.format("memory").queryName("session_out")
      .outputMode(OutputMode.Update()).start()
    events.addData(
      Sessionize.SessionEvent(7L, Timestamp.valueOf("2024-01-01 10:00:00"), "click"),
      Sessionize.SessionEvent(7L, Timestamp.valueOf("2024-01-01 10:01:00"), "view"))
    q.processAllAvailable()
    events.addData(
      Sessionize.SessionEvent(7L, Timestamp.valueOf("2024-01-01 10:02:00"), "click"))
    q.processAllAvailable()
    val last = spark.table("session_out")
      .orderBy(col("n_events").desc).first()
    q.stop()
    assert(last.getAs[Long]("user_id") === 7L)
    assert(last.getAs[Long]("n_events") === 3L) // state carried across batches
  }
}
