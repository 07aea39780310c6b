package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd arg: comma-separated name substrings — dump only the
    // matching queries (local iteration; the driver always passes 2 args).
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Seq[String]] =
      if (args.length > 2) Some(args(2).split(",").toSeq) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER overrides the master for multi-process runs
    // (local-cluster[2,8,4096] spawns separate executor JVMs — the
    // single-machine stand-in for a real cluster's serialization paths:
    // custom-expression shipping, UDAF buffers, exchanges, broadcasts).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val boards = run(spark, sfDir, outDir, only)
    spark.stop()
    // A run that produced ZERO result boards is a broken run, never a
    // green one — fail loudly instead of leaving an empty artifact the
    // driver could mistake for "nothing to check" (round-10 postmortem:
    // CORRECTNESS_r10.json was silently `{}`).
    if (boards == 0) {
      System.err.println("[verify] FATAL: 0 result boards written " +
        "(empty query map or filter matched nothing) - exiting nonzero")
      sys.exit(1)
    }
  }

  /** Dumps every matching query board + oracle/errors/run_info JSON;
    * returns the number of result boards successfully written. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      only: Option[Seq[String]]): Int = {
    new java.io.File(outDir).mkdirs()
    // A query that throws must show up on the board as a red entry, not
    // silently vanish (in round 7 a fixture-schema crash made 66 gates
    // disappear from the report). Record every failure in errors.json.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var written = 0
    SparkEntry.queries
      .filter { case (name, _) =>
        only.forall(_.exists(name.contains)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        written += 1
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    // Execution-topology evidence: master + live executor set (the
    // driver's BlockManager plus one entry per executor JVM), so a
    // local-cluster run is distinguishable from local[] in the artifact
    // itself — the whole point of that run is proving custom expression /
    // UDAF / exchange serialization across process boundaries.
    val execs = spark.sparkContext.statusTracker.getExecutorInfos
    val info = s"""{"master": ${q(spark.sparkContext.master)}, """ +
      s""""executors": ${execs.length}, """ +
      s""""executor_hosts": [${execs.map(e => q(e.host())).mkString(",")}]}"""
    Files.writeString(Paths.get(s"$outDir/run_info.json"), info)
    System.err.println(s"[verify] $info")
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        errors.keys.mkString(", "))
    written
  }
}
