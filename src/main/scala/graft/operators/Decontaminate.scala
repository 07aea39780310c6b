package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextHash.wordShingles

/**
 * Benchmark decontamination (SURVEY.md §2.5 layer C): flag training-corpus
 * documents that overlap an evaluation/benchmark set at the word-n-gram
 * level — the standard guard against test-set leakage when assembling
 * training data.
 *
 * Scale design (the 100 TB story): the eval side is always tiny relative
 * to the corpus (benchmarks are thousands of documents; the corpus is
 * billions), so the distinct eval-gram set is BROADCAST and the corpus
 * never shuffles its gram stream — the per-document overlap count is a
 * narrow explode + broadcast semi-join + hash aggregate whose map-side
 * partials reduce to one row per document before the only exchange
 * (keyed by doc id). No corpus-vs-corpus join exists anywhere.
 *
 * Grams reuse the deterministic WordShingles codegen expression (distinct
 * word k-grams, whole-text fallback below k words), so the DuckDB oracle
 * replays the pipeline exactly.
 */
object Decontaminate {

  /**
   * Per-corpus-document overlap against `evalSet`: distinct gram count,
   * shared-with-eval gram count, and a contamination flag at threshold
   * `num/den` (integer arithmetic — no float drift).
   */
  def ngramOverlap(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, k: Int = 3, num: Int = 1, den: Int = 5): DataFrame = {
    require(den > 0 && num >= 0, s"threshold $num/$den must be non-negative")
    val evalGrams = evalSet
      .select(explode(wordShingles(col(textCol), k)).as("gram"))
      .distinct()
    val withGrams = corpus.select(col(idCol).as("doc_id"),
      wordShingles(col(textCol), k).as("grams"))
    val shared = withGrams
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    withGrams
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
      .join(shared, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_shared"))
      .withColumn("contaminated",
        col("n_shared") * den >= col("n_grams") * num)
  }

  /**
   * [[ngramOverlap]] with a Bloom prefilter on the corpus gram stream —
   * bit-identical results (a Bloom filter has NO false negatives; its
   * false positives are eliminated by the exact semi-join that follows),
   * cheaper at scale: the broadcast eval-GRAM-STRING table can reach
   * hundreds of MB once benchmarks accumulate (millions of distinct
   * grams × ~40-byte strings), while the Bloom over their xxhash64 codes
   * is `-n·ln(fpp)/ln²2` BITS (~1.2 MB per million grams at 1%), and the
   * probe drops non-candidate grams BEFORE they reach the semi-join's
   * hash table — the same discipline as Joins.bloomPrefilteredJoin and
   * the broadcast-quantizer switch (third applied instance). The filter
   * ships plan-embedded below `bcastThresholdBytes`, as a torrent
   * broadcast above it.
   *
   * `expectedGrams` sizes the filter — overshooting costs bits, not
   * correctness; undershooting only raises the false-positive rate (more
   * rows reach the exact join). `expectedGrams = 0` sizes AUTOMATICALLY
   * from one distinct-gram count of the eval side — a fixed sizing is
   * the same latent trap every fixed LSH config was (the eval set grows
   * as benchmarks accumulate; a 64k filter over 300k grams probes at a
   * useless fpp), and the count is one eval-sized job against a
   * corpus-sized saving.
   */
  def ngramOverlapBloom(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, k: Int = 3, num: Int = 1, den: Int = 5,
      expectedGrams: Long = 0L, fpp: Double = 0.01,
      bcastThresholdBytes: Long = 4L << 20): DataFrame = {
    require(den > 0 && num >= 0, s"threshold $num/$den must be non-negative")
    require(expectedGrams >= 0 && fpp > 0 && fpp < 1,
      s"bad bloom sizing: grams=$expectedGrams fpp=$fpp")
    // The distinct eval-gram plan is used three times (auto-size count,
    // Bloom build, exact semi-join build side) and the operator's own
    // premise is that the eval set grows as benchmarks accumulate —
    // persist across the two EAGER uses so the shingle+distinct runs
    // once, and release before returning (the lazy semi-join side
    // recomputes one eval-sized scan at caller-execution time; holding
    // the cache hostage to an unknown caller lifetime is the worse
    // trade in a long-running pipeline).
    val evalGrams = evalSet
      .select(explode(wordShingles(col(textCol), k)).as("gram"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizedGrams =
      if (expectedGrams > 0) expectedGrams
      else math.max(evalGrams.count(), 1024L)
    val bf = evalGrams.withColumn("h", xxhash64(col("gram")))
      .stat.bloomFilter("h", sizedGrams, fpp)
    evalGrams.unpersist(false)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    val bytes = out.toByteArray
    import org.apache.spark.sql.graftbridge.GraftSqlBridge
    val keyExpr = GraftSqlBridge.expression(xxhash64(col("gram")))
    val probe = GraftSqlBridge.column(
      if (bytes.length <= bcastThresholdBytes)
        graft.functions.BloomMightContainLong(keyExpr, bytes)
      else
        graft.functions.BloomMightContainLongBcast(keyExpr,
          corpus.sparkSession.sparkContext.broadcast(bytes)))
    val withGrams = corpus.select(col(idCol).as("doc_id"),
      wordShingles(col(textCol), k).as("grams"))
    val shared = withGrams
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .where(probe)
      .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    withGrams
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
      .join(shared, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_shared"))
      .withColumn("contaminated",
        col("n_shared") * den >= col("n_grams") * num)
  }

  /**
   * Semantic (embedding-level) decontamination: [[ngramOverlap]] catches
   * verbatim leakage only — paraphrased eval material needs an
   * eval-vs-corpus join in embedding space. Candidates come from an
   * SRP-LSH bucket equi-join ([[Similarity.lshCodes]] on both sides, the
   * eval side BROADCAST — same asymmetry as the n-gram path: benchmarks
   * are thousands of vectors, the corpus is billions), then an exact
   * cosine ≥ `threshold` refilter. Returns one row per contaminated
   * corpus document: how many eval items it matches and the max cosine
   * (rounded once, after the max).
   *
   * Scale shape: the corpus computes its bucket codes in one narrow
   * codegen scan and joins a broadcast eval-code set — no corpus-vs-
   * corpus join, no shuffle of the corpus beyond the final per-doc
   * aggregate; recall is dialed by numTables/numPlanes exactly as in
   * [[Similarity.lshNearDuplicates]].
   */
  /** [[semanticOverlap]] with the LSH scale dial APPLIED
    * ([[Similarity.lshAutoConfig]] on the CORPUS size): a fixed
    * (tables, planes) config is quadratic once both sides grow with the
    * corpus — the r10 sf3 evidence run measured the fixed 8x3 gate at
    * x12.6 for 3x data — while occupancy-dialed planes keep buckets (and
    * with them the candidate join) linear-ish, and the high decontam
    * threshold keeps the recall-driven table count tiny (2 at the
    * fixture, 5 at 150k rows). One corpus count() picks the config. */
  def semanticOverlapAuto(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, evalIdCol: String, evalVecCol: String,
      threshold: Double, targetOccupancy: Long = 64L, recall: Double = 0.92,
      maxTables: Int = 128, seed: Int = 42, dim: Int = 64): DataFrame = {
    val (numPlanes, numTables) = Similarity.lshAutoConfig(corpus.count(),
      threshold, targetOccupancy, recall, maxTables)
    semanticOverlap(corpus, evalSet, idCol, vecCol, evalIdCol, evalVecCol,
      threshold, numTables, numPlanes, seed, dim)
  }

  def semanticOverlap(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      vecCol: String, evalIdCol: String, evalVecCol: String,
      threshold: Double, numTables: Int = 8, numPlanes: Int = 3,
      seed: Int = 42, dim: Int = 64): DataFrame = {
    val cCodes = Similarity.lshCodes(corpus, idCol, vecCol,
      numTables, numPlanes, seed, dim)
    val eCodes = Similarity.lshCodes(evalSet, evalIdCol, evalVecCol,
        numTables, numPlanes, seed, dim)
      .withColumnRenamed("vec_id", "eval_id")
    val cand = cCodes.join(broadcast(eCodes), Seq("tbl", "code"))
      .select(col("vec_id").as("doc_id"), col("eval_id"))
      .distinct()
    val cv = corpus.select(col(idCol).as("doc_id"), col(vecCol).as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))
    val ev = evalSet
      .select(col(evalIdCol).as("eval_id"), col(evalVecCol).as("ev"))
      .withColumn("en", VectorOps.norm(col("ev")))
    cand.join(cv, Seq("doc_id")).join(broadcast(ev), Seq("eval_id"))
      .withColumn("cos",
        VectorOps.dot(col("cv"), col("ev")) / (col("cn") * col("en")))
      .where(col("cos") >= threshold)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_hits"),
        round(max(col("cos")), 6).as("max_cos"))
  }

  /**
   * SPAN-level decontamination (the Lee et al. window signal pointed at
   * an eval set): a corpus document is contaminated wherever any of its
   * stride-1 `w`-token windows appears VERBATIM in the eval set — this
   * catches an eval answer pasted mid-document at any offset, which
   * distinct-k-gram overlap ([[ngramOverlap]]) dilutes and aligned
   * paragraph checks miss entirely. Per flagged doc: token count, hit
   * windows, contaminated-token mass by exact interval union (the
   * [[Dedup.duplicatedSpans]] lead() trick), and the fraction.
   *
   * Scale shape: eval windows are benchmark-sized and BROADCAST; the
   * corpus window stream is one narrow codegen explode joined against
   * them — the corpus never shuffles its windows; the only exchange is
   * the doc-keyed roll-up of hits. No corpus-vs-corpus join.
   */
  def spanOverlap(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, w: Int = 8): DataFrame = {
    require(w > 0, "spanOverlap: w must be positive")
    def windows(df: DataFrame, withPos: Boolean): DataFrame = {
      val toks = split(col(textCol), " ")
      val grams = org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
        graft.functions.WordGramsAll(
          org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(
            col(textCol)), w))
      val wins = when(length(trim(col(textCol))) === 0,
          array().cast("array<string>"))
        .otherwise(when(size(toks) >= w, grams)
          .otherwise(array(concat_ws(" ", toks))))
      if (withPos)
        df.select(col(idCol).as("doc_id"), size(toks).as("ntok"),
            posexplode(wins))
          .select(col("doc_id"), col("ntok"), col("pos"),
            md5(col("col")).as("wh"))
      else
        df.select(explode(wins).as("g")).select(md5(col("g")).as("wh"))
          .distinct()
    }
    val evalWins = windows(evalSet, withPos = false)
    val hits = windows(corpus, withPos = true)
      .join(broadcast(evalWins), "wh")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    hits.withColumn("nxt", lead(col("pos"), 1).over(byDoc))
      .groupBy("doc_id")
      .agg(max(col("ntok")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_hit_windows"),
        sum(when(col("nxt").isNull, least(lit(w), col("ntok") - col("pos")))
          .otherwise(least(col("nxt") - col("pos"), lit(w))))
          .cast("long").as("contaminated_tokens"))
      .withColumn("contaminated_frac",
        round(col("contaminated_tokens").cast("double") / col("n_tokens"), 6))
  }
}
