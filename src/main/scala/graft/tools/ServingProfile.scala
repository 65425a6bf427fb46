package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-JOB profile of a serving-gate rep: builds the named gates' serving
  * thunks once (untimed here), then runs N reps of each thunk with a listener
  * recording every Spark job's callsite description and wall ms — the
  * evidence for WHERE a serving rep's time goes (driver actions vs the main
  * plan), which QueryAudit's aggregate counts can't show.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ServingProfile <reps> <gate> [gate ...]
  */
object ServingProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ServingProfile <reps> <gate> [gate ...]")
    val reps = args.head.toInt
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

    val starts = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    val jobs = scala.collection.mutable.ArrayBuffer[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          j.stageInfos.map(si => si.name.linesIterator.next()).distinct
            .mkString(" | ") +
            s" [${j.stageInfos.length}st/${j.stageInfos.map(_.numTasks).sum}t]")
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d) =>
          jobs.synchronized { jobs += ((j.jobId, (System.nanoTime() - t0) / 1000000, d)) }
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(-1L)
        println(f"  stage ${si.stageId}%4d ${wall}%6dms run=" +
          f"${si.taskMetrics.executorRunTime}%6dms cpu=" +
          f"${si.taskMetrics.executorCpuTime / 1000000}%6dms " +
          f"deser=${si.taskMetrics.executorDeserializeTime}%5dms " +
          f"gc=${si.taskMetrics.jvmGCTime}%5dms " +
          f"t=${si.numTasks}%3d ${si.name.linesIterator.next().take(90)}")
      }
    })

    val builders = graft.SparkEntry.servingBench
    args.tail.foreach { gate =>
      val thunk: () => org.apache.spark.sql.DataFrame =
        builders.get(gate).map(_(spark, sfDir))
          .getOrElse(() => graft.SparkEntry.queries(gate)(spark, sfDir))
      if (sys.env.contains("SERVING_EXPLAIN"))
        println(thunk().queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      // one warmup
      thunk().write.format("noop").mode("overwrite").save()
      (1 to reps).foreach { r =>
        jobs.synchronized(jobs.clear())
        // driver-side hotspot sampler: the rep thread's stacks at 20 ms,
        // histogrammed by the deepest graft/spark frame (SERVING_SAMPLE=1)
        val repThread = Thread.currentThread()
        val hist = scala.collection.mutable.Map[String, Int]()
        @volatile var sampling = sys.env.contains("SERVING_SAMPLE")
        val sampler = new Thread(() => {
          while (sampling) {
            val st = repThread.getStackTrace
            val frame = st.find(e =>
              e.getClassName.startsWith("graft.") ||
                e.getClassName.startsWith("org.apache.spark."))
              .map(e => e.getClassName.split("\\.").takeRight(2).mkString(".") +
                "." + e.getMethodName + ":" + e.getLineNumber)
              .getOrElse(st.headOption.fold("?")(e =>
                e.getClassName + "." + e.getMethodName))
            hist.synchronized { hist(frame) = hist.getOrElse(frame, 0) + 1 }
            Thread.sleep(20)
          }
        })
        if (sampling) sampler.start()
        val t0 = System.nanoTime()
        thunk().write.format("noop").mode("overwrite").save()
        val total = (System.nanoTime() - t0) / 1000000
        sampling = false
        if (hist.nonEmpty) hist.synchronized {
          hist.toSeq.sortBy(-_._2).take(15).foreach { case (f, n) =>
            println(f"  samp ${n * 20}%6dms  $f")
          }
        }
        Thread.sleep(300) // let the listener bus drain
        if (sys.env.contains("SERVING_SQLMETRICS")) {
          val store = spark.sharedState.statusStore
          store.executionsList().lastOption.foreach { e =>
            val mv = store.executionMetrics(e.executionId)
            val g = store.planGraph(e.executionId)
            g.allNodes.foreach { n =>
              val ms = n.metrics.flatMap(m => mv.get(m.accumulatorId)
                .map(v => s"${m.name}=$v")).filter(s =>
                  s.contains("time") || s.contains("rows"))
              if (ms.nonEmpty)
                println(s"  sql ${n.name}: ${ms.mkString(", ")}")
            }
          }
        }
        val snap = jobs.synchronized(jobs.toSeq)
        println(s"== $gate rep $r total ${total}ms jobs ${snap.length} " +
          s"jobSum ${snap.map(_._2).sum}ms")
        snap.sortBy(_._1).foreach { case (id, ms, d) =>
          println(f"  job $id%4d $ms%6dms  ${d.take(140)}")
        }
      }
    }
    spark.stop()
  }
}
