package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Similarity
import graft.queries.Staging
import graft.streaming.EmbeddingIndexStream

/** Dev-tool margin probe (the PqAssignSweep companion): raw
  * stale-vs-rebuilt recall counts for the COMPRESSED-fold rebuild gates
  * (`stream_ivfsq8_rebuild` / `stream_ivfpq_rebuild`) on their planted
  * drift fixture, so the gates' wide-margin booleans are SET FROM
  * MEASUREMENT, not guessed (the stream_ivf_rebuild convention: margins
  * must sit >4 sigma from values observed under different task layouts —
  * run under local[32] and local[4] before pinning).
  *
  *   sbt "runMain graft.RebuildSweep <sfDir>"
  */
object RebuildSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 32
    val KmIters = 2
    val hist = graft.operators.SyntheticEmbeddings
      .clustered(spark, 2048L, 8, dim, 1205L, 0.5)
      .select(col("id"), col("embedding").as("vec"))
    val driftAll = graft.operators.SyntheticEmbeddings
      .clustered(spark, 2112L, 8, dim, 7702L, 0.5)
    val driftFold = driftAll.where(col("id") < 2048)
      .select((col("id") + 10000L).as("id"), col("embedding").as("vec"))
    val queries = driftAll.where(col("id") >= 2048)
      .select(col("id").as("qid"), col("embedding").as("qvec"))
    val days = Seq(
      driftFold.where(col("id") < 10512),
      driftFold.where(col("id") >= 10512 && col("id") < 11024),
      driftFold.where(col("id") >= 11024 && col("id") < 11536),
      driftFold.where(col("id") >= 11536))
    val logDir = Staging.batchLog("sivfrebi", sfDir, "day", days)
    val corpus = hist.unionByName(driftFold)
    val truth = Similarity.bruteForceTopK(corpus, queries, 10)
      .select("qid", "id").cache()
    println(s"n_truth=${truth.count()}")

    val histTrain = hist.where(col("id") % 4 === 0)
    val stale = Similarity.trainKMeans(histTrain, "id", "vec", 8, dim,
      KmIters)

    // ---- SQ8 ----
    val (rebS, rebListsS) = EmbeddingIndexStream.incrementalIvfSq8WithRebuild(
      spark, hist, logDir, days.head.schema,
      s"${Staging.freshStateRoot("graft_sq8rebi_sweep")}/state", "id", "vec",
      stale, rebuildEvery = 2, rebuildK = _ => 16, dim = dim, iters = KmIters)
    val staleListsS = Similarity.ivfSq8Assignments(corpus, "id", "vec", stale)
      .cache()
    val hitsStaleS = Similarity.probeSq8Index(staleListsS, queries, 10,
      stale, 1).select("qid", "id").intersect(truth).count()
    val hitsRebS = Similarity.probeSq8Index(rebListsS.cache(), queries, 10,
      rebS, 1).select("qid", "id").intersect(truth).count()
    println(s"sq8: stale=$hitsStaleS rebuilt=$hitsRebS")

    // ---- PQ ----
    val subDim = 2
    val m = dim / subDim
    val staleBooks = Similarity.trainPQ(histTrain, "id", "vec", m, subDim,
      16, 2)
    val (rebP, rebGensP, rebListsP) =
      EmbeddingIndexStream.incrementalIvfPqWithRebuild(
        spark, hist, logDir, days.head.schema,
        s"${Staging.freshStateRoot("graft_pqrebi_sweep")}/state", "id", "vec",
        stale, staleBooks, subDim, rebuildEvery = 2, rebuildK = _ => 16,
        dim = dim, iters = KmIters, pqK = 16, pqIters = 2)
    val staleListsP = Similarity.ivfPqAssignments(corpus, "id", "vec",
      stale, staleBooks, subDim).cache()
    val hitsStaleP = Similarity.probePqIndex(staleListsP, queries, 10,
      stale, staleBooks, subDim, 1).select("qid", "id")
      .intersect(truth).count()
    val hitsRebP = Similarity.probePqIndexVersioned(rebListsP.cache(),
      queries, 10, rebP, rebGensP, subDim, 1).select("qid", "id")
      .intersect(truth).count()
    println(s"pq (pure ADC): stale=$hitsStaleP rebuilt=$hitsRebP")
    // The served path: 50-deep ADC shortlist from the index, exact
    // re-rank against corpus storage (ivfPqTopK's dataflow) — isolates
    // the coarse-probe drift the rebuild targets from ADC payload noise.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{broadcast, row_number}
    val vo = graft.operators.VectorOps
    def refinedFrom(short: org.apache.spark.sql.DataFrame): Long = {
      short
        .join(broadcast(queries.withColumn("qnrm", vo.norm(col("qvec")))),
          "qid")
        .join(corpus.withColumn("nrm", vo.norm(col("vec"))), "id")
        .withColumn("score",
          vo.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
        .withColumn("rnk", row_number().over(Window.partitionBy("qid")
          .orderBy(col("score").desc, col("id"))))
        .where(col("rnk") <= 10)
        .select("qid", "id").intersect(truth).count()
    }
    def refined(lists: org.apache.spark.sql.DataFrame,
        cents: Seq[(Long, Array[Float])],
        books: Seq[Seq[(Long, Array[Float])]], depth: Int = 50): Long =
      refinedFrom(Similarity.probePqIndex(lists, queries, depth, cents,
        books, subDim, 1).select("qid", "id"))
    def refinedV(lists: org.apache.spark.sql.DataFrame,
        cents: Seq[(Long, Array[Float])],
        gens: Seq[(Long, Seq[Seq[(Long, Array[Float])]])],
        depth: Int = 50): Long =
      refinedFrom(Similarity.probePqIndexVersioned(lists, queries, depth,
        cents, gens, subDim, 1).select("qid", "id"))
    val refStale = refined(staleListsP, stale, staleBooks)
    val refReb = refinedV(rebListsP, rebP, rebGensP)
    println(s"pq (refine 50 + exact): stale=$refStale rebuilt=$refReb")
    // (a) Fresh ceiling: coarse + books retrained RAW on the full-corpus
    // 1-in-4 sample, everything re-encoded raw — what any rebuild design
    // can at best reach.
    val corpTrain = corpus.where(col("id") % 4 === 0)
    val freshC = Similarity.trainKMeans(corpTrain, "id", "vec", 16, dim,
      KmIters)
    val freshB = Similarity.trainPQ(corpTrain, "id", "vec", m, subDim, 16, 2)
    val freshLists = Similarity.ivfPqAssignments(corpus, "id", "vec",
      freshC, freshB, subDim).cache()
    println(s"pq fresh ceiling (refine 50): " +
      s"${refined(freshLists, freshC, freshB)}")
    // (c) Re-key-only generations proxy: coarse retrained from
    // reconstructions, rows RE-KEYED but codes kept (payload noise stays
    // 1x), probed with the books that encoded them.
    val recon = EmbeddingIndexStream.pqReconstruct(staleListsP, staleBooks)
      .cache()
    val reconC = Similarity.trainKMeans(
      recon.where(col("id") % 4 === 0), "id", "rvec", 16, dim, KmIters)
    val cidOf = recon.select(
      org.apache.spark.sql.functions.element_at(
        Similarity.probeCids(col("rvec"), reconC, 1), 1).as("ncid"),
      col("id"))
    val rekeyed = staleListsP.drop("cid").join(cidOf, "id")
      .withColumnRenamed("ncid", "cid").cache()
    println(s"pq rekey-only (refine 50): " +
      s"${refined(rekeyed, reconC, staleBooks)}")
    // Isolate cents-training-space: re-key the all-stale-books lists
    // with the REAL fold's (raw-reservoir-trained) centroids.
    val cidOfB = recon.select(col("id"),
      org.apache.spark.sql.functions.element_at(
        Similarity.probeCids(col("rvec"), rebP, 1), 1).as("ncid2"))
    val rekeyedB = staleListsP.drop("cid").join(cidOfB, "id")
      .withColumnRenamed("ncid2", "cid").cache()
    println(s"pq rekey-rawcents-150: ${refined(rekeyedB, rebP, staleBooks, 150)}")
    // Per-generation diagnosis: where do the rebuilt index's hits/misses
    // live? Truth rows per bv vs served hits per bv.
    locally {
      import org.apache.spark.sql.functions.broadcast
      val bvOf = rebListsP.select(col("id"), col("bv")).distinct()
      val short = Similarity.probePqIndexVersioned(rebListsP, queries, 150,
        rebP, rebGensP, subDim, 1).select("qid", "id")
      val served = short
        .join(broadcast(queries.withColumn("qnrm", vo.norm(col("qvec")))),
          "qid")
        .join(corpus.withColumn("nrm", vo.norm(col("vec"))), "id")
        .withColumn("score",
          vo.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
        .withColumn("rnk", row_number().over(Window.partitionBy("qid")
          .orderBy(col("score").desc, col("id"))))
        .where(col("rnk") <= 10).select("qid", "id")
      val hitByBv = served.intersect(truth).join(bvOf, "id")
        .groupBy("bv").count().orderBy(col("bv")).collect()
        .map(r => s"bv${r.getLong(0)}=${r.getLong(1)}").mkString(" ")
      val truthByBv = truth.join(bvOf, "id")
        .groupBy("bv").count().orderBy(col("bv")).collect()
        .map(r => s"bv${r.getLong(0)}=${r.getLong(1)}").mkString(" ")
      val short150ByBv = short.join(bvOf, "id")
        .groupBy("bv").count().orderBy(col("bv")).collect()
        .map(r => s"bv${r.getLong(0)}=${r.getLong(1)}").mkString(" ")
      println(s"pq diag: truthByBv($truthByBv) hitByBv($hitByBv) shortByBv($short150ByBv)")
    }
    println(s"pq refine-150: stale=${refined(staleListsP, stale, staleBooks, 150)} " +
      s"rebuilt=${refinedV(rebListsP, rebP, rebGensP, 150)} " +
      s"rekey=${refined(rekeyed, reconC, staleBooks, 150)} " +
      s"fresh=${refined(freshLists, freshC, freshB, 150)}")

    // ---- Matryoshka (prefix payload, PREFIX-SPACE quantizer) ----
    // Margins for stream_ivfmat_rebuild: stale prefix-trained quantizer
    // vs the rebuildIvfMatryoshka retrain from stored prefixes, probed
    // by pure stored-prefix cosine at nprobe=1 (queries pre-sliced).
    val pdim = dim / 2
    def pfx(df: org.apache.spark.sql.DataFrame, vc: String) =
      df.withColumn(vc, org.apache.spark.sql.functions.slice(col(vc), 1, pdim))
    val staleM = Similarity.trainKMeans(
      pfx(histTrain, "vec"), "id", "vec", 8, pdim, KmIters)
    val (rebM, rebListsM) = EmbeddingIndexStream
      .incrementalIvfMatryoshkaWithRebuild(spark, hist, logDir,
        days.head.schema,
        s"${Staging.freshStateRoot("graft_matrebi_sweep")}/state",
        "id", "vec", staleM, pdim, rebuildEvery = 2, rebuildK = _ => 16,
        iters = KmIters)
    val staleListsM = Similarity.ivfMatryoshkaAssignments(
      pfx(corpus, "vec"), "id", "vec", staleM, pdim).cache()
    val qp = pfx(queries, "qvec")
    val hitsStaleM = Similarity.probeMatryoshkaIndex(staleListsM, qp, 10,
      staleM, pdim, 1).select("qid", "id").intersect(truth).count()
    val hitsRebM = Similarity.probeMatryoshkaIndex(rebListsM.cache(), qp, 10,
      rebM, pdim, 1).select("qid", "id").intersect(truth).count()
    println(s"mat (prefix cosine, pdim=$pdim): stale=$hitsStaleM rebuilt=$hitsRebM")
    // Served path (ivfMatryoshkaTopK's dataflow over the folded lists):
    // 50-deep prefix shortlist, exact full-dim re-rank — isolates the
    // coarse-probe drift the rebuild targets from prefix-ranking noise,
    // the same reason the PQ gate pins the refined path.
    val refStaleM = refinedFrom(Similarity.probeMatryoshkaIndex(staleListsM,
      qp, 50, staleM, pdim, 1).select("qid", "id"))
    val refRebM = refinedFrom(Similarity.probeMatryoshkaIndex(rebListsM,
      qp, 50, rebM, pdim, 1).select("qid", "id"))
    println(s"mat (refine 50 + exact): stale=$refStaleM rebuilt=$refRebM")
    spark.stop()
  }
}
