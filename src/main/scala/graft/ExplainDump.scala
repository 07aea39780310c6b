package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for the named gates to files — the
  * optimization-round evidence artifact (`plans/r18/<gate>_{before,after}.txt`).
  * Session shape matches Bench so the captured plan is the plan the bench
  * actually runs (same shuffle partitions, same split sizing).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ExplainDump <outDir> <suffix> g1,g2"
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "256k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(s"$outDir/${n}_$suffix.txt")
      try w.println(plan) finally w.close()
      println(s"[explain] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
