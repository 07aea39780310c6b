package graft

/** The `graft_markov_text` TVF memoizes trained models keyed by
  * (table, textCol, SHA-256 of the backing file-set snapshot). This is
  * correctness-relevant cache invalidation — a stale hit would serve
  * synthetic text trained on replaced data — so each contract leg is
  * pinned here via the `markovTrainCount` hook:
  *
  *   1. hit-on-unchanged: two resolutions of the same file-backed table
  *      run exactly ONE training job;
  *   2. retrain-on-replace: overwriting the backing parquet re-trains,
  *      and the generated text actually reflects the new corpus;
  *   3. non-file-backed fallback: an in-memory view has no stable
  *      fingerprint, so every resolution trains fresh (never a stale
  *      hit, at the documented cost of repeat training).
  */
class MarkovCacheSpec extends GraftSuite {
  import spark.implicits._

  private def trainCount: Long = GraftExtensions.markovTrainCount.get()

  private def writeCorpus(dir: String, word: String): Unit =
    Seq.tabulate(50)(i => (i.toLong, s"$word $word alpha $word beta"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)

  test("hit-on-unchanged: two resolutions, one training job") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mkc1").toString
    writeCorpus(dir, "stable")
    spark.read.parquet(dir).createOrReplaceTempView("graft_mkc_hit")
    GraftExtensions.markovCacheReset()
    val before = trainCount
    val sql = "SELECT * FROM graft_markov_text('graft_mkc_hit', 'text', 20, 7, 10)"
    val first = spark.sql(sql).collect()
    assert(first.length == 20)
    assert(trainCount == before + 1, "first resolution must train once")
    val second = spark.sql(sql).collect()
    assert(second.length == 20)
    assert(trainCount == before + 1,
      "second resolution of unchanged data must hit the cache, not retrain")
    assert(first.map(_.getString(1)).toSeq == second.map(_.getString(1)).toSeq,
      "cached model + same seed must reproduce the same text")
  }

  test("retrain-on-replace: overwriting the backing parquet re-trains") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mkc2").toString
    writeCorpus(dir, "oldword")
    spark.read.parquet(dir).createOrReplaceTempView("graft_mkc_rep")
    GraftExtensions.markovCacheReset()
    val before = trainCount
    val sql = "SELECT * FROM graft_markov_text('graft_mkc_rep', 'text', 30, 7, 10)"
    val oldText = spark.sql(sql).collect().map(_.getString(1)).mkString(" ")
    assert(trainCount == before + 1)
    assert(oldText.contains("oldword") && !oldText.contains("newword"))
    // Replace the data under the same table name (what a daily refresh
    // does) — new part files => new fingerprint => retrain.
    writeCorpus(dir, "newword")
    spark.read.parquet(dir).createOrReplaceTempView("graft_mkc_rep")
    val newText = spark.sql(sql).collect().map(_.getString(1)).mkString(" ")
    assert(trainCount == before + 2,
      "replaced backing files must re-train, not serve the stale model")
    assert(newText.contains("newword") && !newText.contains("oldword"),
      s"generated text must reflect the NEW corpus, got: ${newText.take(200)}")
  }

  test("non-file-backed fallback: in-memory view trains every resolution") {
    Seq.tabulate(50)(i => (i.toLong, "gamma delta gamma epsilon"))
      .toDF("doc_id", "text")
      .createOrReplaceTempView("graft_mkc_mem")
    GraftExtensions.markovCacheReset()
    val before = trainCount
    val sql = "SELECT * FROM graft_markov_text('graft_mkc_mem', 'text', 10, 7, 8)"
    spark.sql(sql).collect()
    spark.sql(sql).collect()
    assert(trainCount == before + 2,
      "a relation with no backing files has no staleness signal - must " +
        "train fresh on every resolution")
  }
}
