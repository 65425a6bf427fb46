package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Structural per-query audit: runs each headline query once (noop sink) and
  * records Spark JOB / STAGE / TASK counts plus shuffle and input bytes via a
  * listener. These counts are deterministic for a fixed plan — unlike
  * wall-clock, which swings ±30% with machine state — so they are the
  * round's before/after evidence for "removed a shuffle / removed a job"
  * claims (optimization guide §1: measure first, §2.4: remove shuffles).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.QueryAudit [q ...]
  * Prints one JSON line per query: {"q":..., "jobs":n, "stages":n,
  * "tasks":n, "shuffle_write_b":n, "input_b":n, "sec":s}.
  */
object QueryAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var shufW = 0L
    @volatile var input = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        synchronized { stages += 1 }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        tasks += 1
        Option(t.taskMetrics).foreach { m =>
          shufW += m.shuffleWriteMetrics.bytesWritten
          input += m.inputMetrics.bytesRead
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val names =
      if (args.nonEmpty) args.toSeq else graft.Bench.headline
    names.filter(graft.SparkEntry.queries.contains).foreach { name =>
      // one untimed warmup so codegen/JIT and scratch-index builds don't
      // pollute the counted run (contract gates build their index per
      // invocation — the audit still counts those jobs, which is the point:
      // it mirrors exactly what Bench's rep loop pays)
      try graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => () }
      Thread.sleep(500) // let straggler listener events drain
      synchronized { jobs = 0; stages = 0; tasks = 0; shufW = 0L; input = 0L }
      val t0 = System.nanoTime()
      val ok =
        try {
          graft.SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          true
        } catch { case scala.util.control.NonFatal(_) => false }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let straggler listener events drain
      println(f"""{"q":"$name","ok":$ok,"jobs":$jobs,"stages":$stages,"tasks":$tasks,"shuffle_write_b":$shufW,"input_b":$input,"sec":$sec%.3f}""")
      Console.out.flush()
    }
    spark.stop()
  }
}
