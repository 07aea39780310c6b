package graft

import org.apache.spark.sql.SparkSession

import graft.fuzz.QueryFuzz

/** Mass differential-fuzz campaign driver (dev tool, mirrors the gate's
  * contract at many seeds): for each seed in [start, start+count) runs
  * the full [[QueryFuzz]] battery on Spark against `sfDir`, dumps the
  * (qid, n_rows, digest) board to `outDir/seed_<s>` parquet and the
  * battery's exact SQL text to `outDir/seed_<s>.sql`. The companion
  * `tools/fuzz_campaign.py` replays each SQL file VERBATIM in DuckDB
  * over the same parquet tables and diffs the boards — any (seed, qid)
  * divergence names the grammar shape whose semantics split the engines.
  *
  *   sbt "runMain graft.FuzzCampaign /root/testdata/sf0.001 \
  *     target/fuzz_r12 4000 20 28"
  */
object FuzzCampaign {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: FuzzCampaign <sfDir> <outDir> <seedStart> <seedCount> [nQueries]")
    val (sfDir, outDir) = (args(0), args(1))
    val seedStart = args(2).toLong
    val seedCount = args(3).toInt
    // Default tracks the grammar size — a fixed literal here silently
    // drops the newest shapes from every default-config campaign (the
    // r16 nQueries trap, re-hit by the r18 campaign tool itself).
    val nQueries =
      if (args.length > 4) args(4).toInt else QueryFuzz.defaultNQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var boards = 0
    (seedStart until seedStart + seedCount).foreach { seed =>
      val cfg = QueryFuzz.FuzzConfig(seed = seed, nQueries = nQueries)
      val sql = QueryFuzz.differentialSql(cfg)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/seed_$seed.sql"),
        sql.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      QueryFuzz.run(spark, sfDir, cfg).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/seed_$seed")
      boards += 1
      println(s"[fuzz-campaign] seed $seed: $nQueries queries boarded")
    }
    spark.stop()
    if (boards == 0) {
      System.err.println("[fuzz-campaign] FATAL: 0 boards written")
      sys.exit(1)
    }
  }
}
