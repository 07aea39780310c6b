package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Complete-mode streaming top-k: the in-stream sort/limit over a running
  * aggregation must converge to the batch answer once all files arrive —
  * including rank flips where a late batch overtakes day-0 leaders. */
class StreamTopKSpec extends GraftSuite {
  import spark.implicits._

  test("streaming top-k equals batch top-k after a rank-flipping batch") {
    // day 0: "alpha" leads; day 1 floods "omega" past it.
    val day0 = Seq.fill(30)("alpha") ++ Seq.fill(20)("beta") ++
      Seq.fill(10)("gamma")
    val day1 = Seq.fill(45)("omega") ++ Seq.fill(5)("beta")
    val root = java.nio.file.Files.createTempDirectory("graft_stk").toString
    val logDir = s"$root/days"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(logDir))
    Seq(day0, day1).zipWithIndex.foreach { case (words, i) =>
      val stage = s"$root/stage$i"
      words.toDF("w").coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = java.nio.file.Paths.get(logDir, f"day$i%03d.parquet")
      java.nio.file.Files.copy(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    val stream = spark.readStream
      .schema(day0.toDF("w").schema)
      .option("maxFilesPerTrigger", 1).parquet(logDir)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(3)
    val got = EventStream.runToMemory(spark, stream,
        s"stk_${System.nanoTime()}")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("omega", 45L), ("alpha", 30L), ("beta", 25L)),
      s"got $got")
  }
}
