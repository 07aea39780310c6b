package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.{Similarity, SyntheticEmbeddings}
import graft.queries.Staging
import graft.streaming.EmbeddingIndexStream

/** Dev-tool scale probe for the delta-chain streaming folds: per-batch
  * fold cost at FIXED batch size against a GROWING accumulated corpus.
  * Under the r6–r16 full-rewrite discipline this curve was linear in the
  * corpus (batch b read AND rewrote the whole accumulated index); under
  * [[graft.streaming.DeltaState]] it must be ~flat — batch cost is the
  * batch's own assignment + one O(batch) delta write, independent of how
  * much history has accumulated.
  *
  * Per-batch cost is isolated as (full fold wall − seed-only wall) / 2
  * over two streamed batches, min of `reps` runs after a warm-up
  * history decade (JIT + stream machinery warm).
  *
  *   sbt "runMain graft.FoldSweep [outJson]"
  */
object FoldSweep {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "target/fold_sweep.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 32
    val batchRows = 2048L
    val reps = 3
    // Four decades of accumulated history at one fixed batch size.
    val decades = Seq(4096L, 16384L, 65536L, 262144L)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def measure(h: Long): (Double, Double) = {
      val hist = SyntheticEmbeddings.clustered(spark, h, 8, dim, 1205L, 0.5)
        .select(col("id"), col("embedding").as("vec"))
      val arriving = SyntheticEmbeddings
        .clustered(spark, batchRows * 2, 8, dim, 7702L, 0.5)
        .select((col("id") + 100000000L).as("id"),
          col("embedding").as("vec"))
      val days = Seq(
        arriving.where(col("id") < 100000000L + batchRows),
        arriving.where(col("id") >= 100000000L + batchRows))
      val logDir = Staging.batchLog(s"foldsweep_$h", "synthetic", "day", days)
      val cents = Similarity.trainKMeans(
        hist.where(col("id") % 16 === 0), "id", "vec", 8, dim, 2)
      // Materialize the history once so neither timing pays generation.
      val histDir = s"${Staging.freshStateRoot("graft_fsw_hist")}/h"
      hist.write.mode("overwrite").parquet(histDir)
      val histP = spark.read.parquet(histDir)
      val (seedT, foldT) = (1 to reps).map { _ =>
        val seedOnly = timed {
          Similarity.ivfAssignments(histP, "id", "vec", cents)
            .write.mode("overwrite")
            .parquet(s"${Staging.freshStateRoot("graft_fsw_seed")}/seed")
        }
        // Time ONLY the ingest (seed + per-batch folds); the final
        // accumulated-state read is O(accumulated) by definition and
        // would contaminate perBatch with a corpus-proportional term.
        var served: org.apache.spark.sql.DataFrame = null
        val full = timed {
          served = EmbeddingIndexStream.incrementalIvf(spark, histP, logDir,
            days.head.schema,
            s"${Staging.freshStateRoot("graft_fsw_state")}/state",
            "id", "vec", cents)
        }
        require(served.count() > 0, "fold produced an empty index")
        (seedOnly, full)
      }.reduce((a, b) => (math.min(a._1, b._1), math.min(a._2, b._2)))
      val perBatch = math.max(0.0, (foldT - seedT) / 2.0)
      println(f"h=$h seed=$seedT%.3f fold=$foldT%.3f perBatch=$perBatch%.3f")
      (seedT, perBatch)
    }

    measure(decades.head) // warm-up: JIT + stream machinery
    val rows = decades.map(h => h -> measure(h))
    val perBatchJson = rows.map { case (h, (_, pb)) =>
      "\"" + h + "\":" + f"$pb%.4f" }.mkString("{", ",", "}")
    val seedJson = rows.map { case (h, (st, _)) =>
      "\"" + h + "\":" + f"$st%.4f" }.mkString("{", ",", "}")
    // Decade-over-decade per-batch ratios: ~1.0 = flat (the contract);
    // the old rewrite design tracked the corpus, ratio -> ~4.
    val ratios = rows.sliding(2).map { case Seq((_, (_, a)), (_, (_, b))) =>
      f"${b / math.max(a, 1e-9)}%.2f" }.mkString("[", ",", "]")
    val json = s"""{"metric":"fold_per_batch_sec","batch_rows":$batchRows,""" +
      s""""dim":$dim,"reps":$reps,"per_batch":$perBatchJson,""" +
      s""""seed":$seedJson,"decade_ratios":$ratios}"""
    val f = new java.io.File(out)
    Option(f.getParentFile).foreach(_.mkdirs())
    val w = new java.io.PrintWriter(f)
    try w.println(json) finally w.close()
    println(json)
    spark.stop()
  }
}
