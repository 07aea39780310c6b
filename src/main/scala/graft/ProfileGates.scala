package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round profiler: runs the named gates once each (noop sink,
  * same session shape as Bench) with a job listener, printing per-gate
  * wall time, Spark-job count, summed job time, and the residual gap
  * (driver/planning/streaming-machinery time no task executes in). The
  * gap is the number the bench alone cannot show — a gate whose wall is
  * 80% gap is bottlenecked on per-job/per-batch fixed overhead, not on
  * the distributed compute the plan shows.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfileGates gate1,gate2"
  */
object ProfileGates {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("stream_cms_fold"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "256k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup identical to Bench.
    spark.range(1000000).selectExpr("sum(id) s", "count(distinct id % 7) c")
      .write.format("noop").mode("overwrite").save()
    Tables.load(spark, sfDir, "region").write.format("noop").mode("overwrite").save()

    @volatile var jobs = 0
    @volatile var jobMs = 0L
    val verbose = sys.env.get("SPARK_GRAFT_PROFILE_VERBOSE").contains("1")
    // jobId -> (t0, nTasks, description)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("") + " | " +
          js.stageInfos.map(si => s"${si.name.takeWhile(_ != '(')}:${si.numTasks}")
            .mkString(",")
        starts.put(js.jobId,
          (System.nanoTime(), js.stageInfos.map(_.numTasks).sum, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) {
          val ms = (System.nanoTime() - s._1) / 1000000L
          jobs += 1; jobMs += ms
          if (verbose)
            println(f"[job] id=${je.jobId}%4d ${ms}%6d ms tasks=${s._2}%4d ${s._3.take(140)}")
        }
      }
    })

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // untimed warmup run (staging, codegen)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      jobs = 0; jobMs = 0L
      if (verbose) println(s"[gate] $n timed run starts")
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wallMs = (System.nanoTime() - t0) / 1000000L
      println(f"[profile] $n%-28s wall=${wallMs}%6d ms  jobs=$jobs%4d  jobMs=$jobMs%6d  gapMs=${wallMs - jobMs}%6d")
    }
    spark.stop()
  }
}
