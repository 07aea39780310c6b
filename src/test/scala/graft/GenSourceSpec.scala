package graft

import org.apache.spark.sql.DataFrame

/** The graftgen DataSource V2 connector: native random-row generation at
  * the scan. */
class GenSourceSpec extends GraftSuite {

  private def read(rows: Long, partitions: Int, seed: Long): DataFrame =
    spark.read.format("graftgen")
      .option("rows", rows).option("partitions", partitions)
      .option("seed", seed)
      .option("columns", "id,qty,price,flag,seg,u")
      .option("gen.id", "seq")
      .option("gen.qty", "int64_uniform:1:50")
      .option("gen.price", "float64_normal:100:15")
      .option("gen.flag", "bool_bernoulli:0.25")
      .option("gen.seg", "choice:A|B|C")
      .option("gen.u", "uuid")
      .load()

  test("schema, row count, bounds and id sequence") {
    val df = read(10000L, 8, 42L)
    assert(df.schema.map(f => f.name -> f.dataType.typeName) ==
      Seq("id" -> "long", "qty" -> "long", "price" -> "double",
        "flag" -> "boolean", "seg" -> "string", "u" -> "string"))
    val r = df.selectExpr("count(*) n", "count(distinct id) dn",
      "min(qty) qlo", "max(qty) qhi", "count(distinct u) du",
      "avg(CASE WHEN flag THEN 1.0D ELSE 0.0D END) pf").collect()(0)
    assert(r.getLong(0) == 10000L && r.getLong(1) == 10000L)
    assert(r.getLong(2) >= 1L && r.getLong(3) <= 50L)
    assert(r.getLong(4) == 10000L)
    assert(math.abs(r.getDouble(5) - 0.25) < 0.02)
  }

  test("deterministic per (seed, partitions); different seeds differ") {
    val a = read(2000L, 4, 7L).collect().map(_.toString).sorted
    val b = read(2000L, 4, 7L).collect().map(_.toString).sorted
    val c = read(2000L, 4, 8L).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
  }

  test("generation is a leaf scan: no exchange, rows split across partitions") {
    val df = read(1000L, 8, 1L)
    assert(df.rdd.getNumPartitions == 8)
    val plan = df.groupBy("seg").count().queryExecution.executedPlan.toString
    // exactly one exchange (the aggregation's), none for generation
    assert(plan.split("Exchange").length - 1 == 1, plan)
  }

  test("uneven row split covers every row exactly once") {
    val df = read(10L, 3, 5L)
    val ids = df.select("id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(0L until 10L))
  }

  test("streaming restart resumes from the checkpoint (no regression, no dups)") {
    // The file sink is the fault-tolerant one (memory sink refuses
    // checkpoint recovery): run 3 batches, restart with a higher cap
    // against the same checkpoint, and the output must be exactly one
    // copy of every batch — a regressed or re-counted offset would
    // duplicate early ids or miss the 150..249 tail.
    val ckpt = java.nio.file.Files.createTempDirectory("graft_gen_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_gen_out").toString
    def start(maxBatches: Int) = spark.readStream.format("graftgen")
      .option("rows", 0).option("partitions", 2).option("seed", 13)
      .option("rowsPerBatch", 50).option("maxBatches", maxBatches)
      .option("columns", "id").option("gen.id", "seq")
      .load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    val q1 = start(3)
    try q1.processAllAvailable() finally q1.stop()
    val q2 = start(5)
    try q2.processAllAvailable() finally q2.stop()
    val ids = spark.read.parquet(out).select("id").collect()
      .map(_.getLong(0)).sorted
    assert(ids.sameElements(0L until 250L),
      s"restart emitted ${ids.length} rows, range [${ids.headOption}, ${ids.lastOption}]")
  }

  test("streaming micro-batch path: maxBatches x rowsPerBatch rows, unique ids") {
    val stream = spark.readStream.format("graftgen")
      .option("rows", 0).option("partitions", 4).option("seed", 9)
      .option("rowsPerBatch", 100).option("maxBatches", 5)
      .option("columns", "id,v")
      .option("gen.id", "seq")
      .option("gen.v", "int64_uniform:1:6")
      .load()
    val out = graft.streaming.EventStream.runToMemory(spark, stream,
      "gen_stream_spec",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val r = out.selectExpr("count(*) n", "count(distinct id) dn",
      "min(v) lo", "max(v) hi").collect()(0)
    assert(r.getLong(0) == 500L, s"rows: ${r.getLong(0)}")
    assert(r.getLong(1) == 500L, "streaming row ids must stay globally unique")
    assert(r.getLong(2) >= 1L && r.getLong(3) <= 6L)
  }
}
