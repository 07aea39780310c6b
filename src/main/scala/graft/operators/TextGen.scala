package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Seeded Markov-chain synthetic TEXT generation — the generator family
 * (SURVEY.md §2.4, the reference's stated purpose) extended from scalar
 * columns to realistic documents: train a bigram transition model on a
 * real corpus IN-ENGINE (one explode + keyed counts — the same shuffle
 * shape as the BM25/LM folds), then generate any number of synthetic
 * documents as a deterministic seeded walk. The synthetic corpus keeps
 * the source's token distribution and local co-occurrence statistics,
 * which is what downstream text-pipeline tests (dedup, LM scoring,
 * tokenizer training) need from a fixture generator.
 *
 * Scale shape: training cost is corpus-linear (explode + two groupBys)
 * with DRIVER state strictly bounded by `maxVocab * maxFanout`
 * (top-fanout transition cut per token, vocabulary cut by frequency) —
 * the collected model is a capped sketch, never the corpus. Generation
 * is one narrow `mapPartitions` over `spark.range` with the model
 * broadcast once: no shuffle, per-row determinism under (seed, id), so
 * it parallelizes to any executor count and is retry-safe.
 */
object TextGen {

  /** Compact transition model: token index -> (next ids, cumulative
    * counts) for weighted sampling; `starts` samples the first token. */
  case class MarkovModel(tokens: Array[String], startIds: Array[Int],
      startCum: Array[Long], nextIds: Array[Array[Int]],
      nextCum: Array[Array[Long]]) extends Serializable {
    require(startIds.nonEmpty, "MarkovModel: empty start distribution")
    def vocabSize: Int = tokens.length
  }

  /**
   * Trains a bigram model from whitespace-tokenized `textCol`.
   * `maxVocab` keeps the most frequent tokens; `maxFanout` keeps each
   * token's most frequent successors (ties broken lexicographically, so
   * training is deterministic). Both cuts bound the driver collect.
   */
  def trainBigrams(docs: DataFrame, textCol: String, maxVocab: Int = 65536,
      maxFanout: Int = 64): MarkovModel = {
    require(maxVocab > 0 && maxFanout > 0,
      "trainBigrams: maxVocab and maxFanout must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // Persisted: tokenization (trim + regex split per document) is the
    // corpus-scale cost, and three jobs below (vocab, starts, bigrams)
    // read it — without the persist each would re-tokenize the corpus.
    val toks = docs
      .select(split(trim(col(textCol)), "\\s+").as("t"))
      .where(size(col("t")) > 0)
      .persist()
    try {
    // Vocabulary cut: top-maxVocab tokens by total occurrences.
    val vocab = toks.select(explode(col("t")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(maxVocab)
      .select("tok").collect().map(_.getString(0))
    val id = vocab.zipWithIndex.toMap
    // Vocabulary membership is applied AFTER aggregation via broadcast
    // semi-joins: the filter touches count tables (distinct tokens /
    // distinct bigrams), never the corpus-scale token stream — a
    // per-token array_contains over a 64k-literal vocabulary would be
    // O(corpus x vocab).
    val vocabDf = broadcast(vocab.toSeq.toDF("tok"))
    // Start-token distribution (first token of each doc).
    val starts = toks.select(element_at(col("t"), 1).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .join(vocabDf, Seq("tok"), "left_semi")
      .orderBy(col("tok"))
      .collect().map(r => (id(r.getString(0)), r.getLong(1)))
    // Bigram counts with a per-token top-fanout cut. Single-token docs
    // contribute no bigrams — and must be filtered BEFORE the transform:
    // Spark's sequence(1, 0) descends instead of emptying out.
    val pairs = toks.where(size(col("t")) >= 2).select(explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .join(vocabDf.withColumnRenamed("tok", "a"), Seq("a"), "left_semi")
      .join(vocabDf.withColumnRenamed("tok", "b"), Seq("b"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a").orderBy(col("n").desc, col("b"))
    val kept = pairs.withColumn("rn", row_number().over(w))
      .where(col("rn") <= maxFanout)
      .select("a", "b", "n")
      .collect()
      .map(r => (id(r.getString(0)), id(r.getString(1)), r.getLong(2)))
      .groupBy(_._1)
    val nextIds = Array.fill(vocab.length)(Array.empty[Int])
    val nextCum = Array.fill(vocab.length)(Array.empty[Long])
    kept.foreach { case (a, rows) =>
      val sorted = rows.sortBy(_._2) // deterministic layout
      nextIds(a) = sorted.map(_._2).toArray
      nextCum(a) = sorted.map(_._3).scanLeft(0L)(_ + _).tail.toArray
    }
    val startCum = starts.map(_._2).scanLeft(0L)(_ + _).tail
    MarkovModel(vocab, starts.map(_._1), startCum, nextIds, nextCum)
    } finally toks.unpersist()
  }

  /**
   * Generates `rows` documents of up to `len` tokens: (gen_id, text).
   * Each row's walk is seeded by (seed, gen_id) — bit-reproducible,
   * task-retry-safe, and independent of partitioning. A walk that hits
   * a token with no retained successors ends early (emitted bigrams are
   * therefore always a SUBSET of the trained transitions — the
   * correctness contract the gate asserts).
   */
  def generate(spark: SparkSession, model: MarkovModel, rows: Long,
      seed: Long, len: Int, numPartitions: Int = 0): DataFrame = {
    require(len > 0, "generate: len must be positive")
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val base =
      if (numPartitions > 0) spark.range(0, rows, 1, numPartitions)
      else spark.range(0, rows)
    base.as[Long].mapPartitions { it =>
      val m = bc.value
      it.map { rowId =>
        val Golden = graft.functions.GraftRandom.Golden
        var s = seed * Golden + rowId
        def next(): Long = {
          s += Golden
          graft.functions.GraftRandom.mix64(s)
        }
        def pick(ids: Array[Int], cum: Array[Long]): Int = {
          val r = Math.floorMod(next(), cum(cum.length - 1))
          var i = java.util.Arrays.binarySearch(cum, r + 1)
          if (i < 0) i = -i - 1
          ids(i)
        }
        val sb = new StringBuilder
        var cur = pick(m.startIds, m.startCum)
        sb.append(m.tokens(cur))
        var emitted = 1
        while (emitted < len && m.nextIds(cur).nonEmpty) {
          cur = pick(m.nextIds(cur), m.nextCum(cur))
          sb.append(' ').append(m.tokens(cur))
          emitted += 1
        }
        (rowId, sb.toString)
      }
    }.toDF("gen_id", "text")
  }
}
