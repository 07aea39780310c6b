package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Fixture scaler for scale-evidence runs: replicates a testdata directory
 * `factor`× with consistent key remapping, so the gate suite can be
 * measured at sf1 (and beyond) without new driver-provisioned data.
 *
 * Semantics of the scale-up (mirrors how TPC-H SF growth behaves):
 *  - Entity keys get a per-copy stride offset (stride = max(key)+1 read
 *    from the source), applied consistently across referencing tables —
 *    copy c of `orders` references copy c of `customer`, so join
 *    fan-outs, group cardinalities per key, and order fanouts stay
 *    constant while table cardinality grows `factor`×.
 *  - `region`/`nation` stay fixed (constant dimensions at every SF, like
 *    TPC-H), so broadcast-dim joins keep their shape.
 *  - `documents.text` is passed through a per-copy alphabet-rotation
 *    cipher (copy 0 untouched): lengths, whitespace and punctuation
 *    structure are preserved (token counts, chunking and quality costs
 *    scale honestly) while shingles/minhashes differ per copy — the
 *    duplicate RATE stays that of the source corpus instead of every doc
 *    gaining factor-1 artificial near-copies, which would make dedup
 *    families look super-linear for fixture reasons, not design reasons.
 *  - `embeddings.embedding` gets a small deterministic per-copy,
 *    per-element perturbation so cosine ties don't degenerate ANN top-k,
 *    with norms and cluster structure essentially preserved.
 *  - `events` keeps its time range: 10× rows in the same window models a
 *    10×-busier service, so watermark state and window fanout scale the
 *    way a real deployment's would.
 *
 * Each output table is staged and moved to `<out>/<name>.parquet` as a
 * single file, matching the driver fixture layout `Tables.load` expects.
 */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <outDir> <factor>")
    val Array(src, out, factorStr) = args
    val factor = factorStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scaleDir(spark, src, out, factor)
    spark.stop()
  }

  def scaleDir(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    require(factor >= 1, "factor >= 1")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    def tbl(n: String): DataFrame = spark.read.parquet(s"$src/$n.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    val custS = stride(tbl("customer"), "c_custkey")
    val suppS = stride(tbl("supplier"), "s_suppkey")
    val partS = stride(tbl("part"), "p_partkey")
    val ordS = stride(tbl("orders"), "o_orderkey")
    val userS = stride(tbl("events"), "user_id")
    val evS = stride(tbl("events"), "event_id")
    val docS = stride(tbl("documents"), "doc_id")
    val vecS = stride(tbl("embeddings"), "vec_id")

    def replicate(df: DataFrame)(perCopy: (DataFrame, Int) => DataFrame)
        : DataFrame =
      (0 until factor).map(c => perCopy(df, c)).reduce(_.unionByName(_))

    def off(k: String, s: Long, c: Int): Column = col(k) + lit(s * c)

    val lower = "abcdefghijklmnopqrstuvwxyz"
    def rot(s: String, c: Int): String = s.drop(c % 26) + s.take(c % 26)
    def cipher(text: Column, c: Int): Column =
      if (c % 26 == 0) text
      else translate(text, lower + lower.toUpperCase,
        rot(lower, c) + rot(lower, c).toUpperCase)

    val outputs: Seq[(String, DataFrame)] = Seq(
      "region" -> tbl("region"),
      "nation" -> tbl("nation"),
      "customer" -> replicate(tbl("customer")) { (df, c) =>
        df.withColumn("c_custkey", off("c_custkey", custS, c))
      },
      "supplier" -> replicate(tbl("supplier")) { (df, c) =>
        df.withColumn("s_suppkey", off("s_suppkey", suppS, c))
      },
      "part" -> replicate(tbl("part")) { (df, c) =>
        df.withColumn("p_partkey", off("p_partkey", partS, c))
      },
      "orders" -> replicate(tbl("orders")) { (df, c) =>
        df.withColumn("o_orderkey", off("o_orderkey", ordS, c))
          .withColumn("o_custkey", off("o_custkey", custS, c))
      },
      "lineitem" -> replicate(tbl("lineitem")) { (df, c) =>
        df.withColumn("l_orderkey", off("l_orderkey", ordS, c))
          .withColumn("l_partkey", off("l_partkey", partS, c))
          .withColumn("l_suppkey", off("l_suppkey", suppS, c))
      },
      "events" -> replicate(tbl("events")) { (df, c) =>
        df.withColumn("event_id", off("event_id", evS, c))
          .withColumn("user_id", off("user_id", userS, c))
      },
      "documents" -> replicate(tbl("documents")) { (df, c) =>
        df.withColumn("doc_id", off("doc_id", docS, c))
          .withColumn("text", cipher(col("text"), c))
      },
      "embeddings" -> replicate(tbl("embeddings")) { (df, c) =>
        df.withColumn("vec_id", off("vec_id", vecS, c))
          .withColumn("embedding", transform(col("embedding"),
            (x, i) => x + ((lit(c * 31) + i * 7) % 13 - 6).cast("float")
              * lit(0.01f)))
      })

    outputs.foreach { case (name, df) =>
      val stage = java.nio.file.Files.createTempDirectory("graft_scaleup")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = new java.io.File(stage.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = java.nio.file.Paths.get(out, s"$name.parquet")
      java.nio.file.Files.deleteIfExists(dst)
      java.nio.file.Files.move(part, dst)
      println(s"[scaleup] $name -> $dst")
    }
  }
}
