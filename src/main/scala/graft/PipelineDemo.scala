package graft

import org.apache.spark.sql.SparkSession

import graft.model.RefAdapter
import graft.pipeline.Medallion

/** End-to-end medallion demo: harness orders/customers → bronze → DQ silver → gold.
  * Usage: runMain graft.PipelineDemo [sfDir] [outRoot]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val root = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("medallion_demo").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val summary = Medallion.run(spark,
      RefAdapter.orders(Tables.orders(spark, sfDir)),
      RefAdapter.customers(Tables.customer(spark, sfDir)),
      root)
    println(s"[pipeline] root=$root summary=$summary")
    spark.stop()
  }
}
