package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.{Similarity, TextAnalysis}

/**
 * DELETES THROUGH THE INDEX FOLDS — the retraction path a real corpus
 * pipeline takes daily (takedowns, licensing removals, dedup-driven
 * retractions): a single changelog stream of I/D ops maintains a served
 * index that never returns a deleted document, with O(batch) per-batch
 * I/O under the [[DeltaState]] discipline.
 *
 * Mechanism — TOMBSTONES AS DELTAS: alongside each index chain
 * (`{chain}_base/_d`) lives a tombstone chain (`{chain}tmb_base/_d`).
 * Batch b writes its inserts' index rows (tagged with ingest version
 * `__v` = b) as the index delta and its deleted ids (tagged `__tv` = b)
 * as the tombstone delta — both O(batch). The SERVED index is
 *
 *   (base ∪ index deltas) ANTI-JOIN tombstones ON same id AND __v <= __tv
 *
 * so a tombstone kills every row ingested AT OR BEFORE it (including an
 * insert in its own batch — within one batch D wins; sequence-ordered
 * semantics belong to [[ChangelogStream]]) while a LATER re-insert of
 * the same id survives. Compaction (every `compactEvery` batches) bakes
 * the anti-join: the served view becomes the new index base and the
 * tombstone chain restarts empty — deleted rows are now physically gone,
 * the GDPR-style hard-delete horizon.
 *
 * Correctness composition: [[TextAnalysis.bm25FromPostings]] derives ALL
 * its corpus statistics (df, avgdl, N) from the postings table itself,
 * so serving it the tombstone-filtered postings makes every stat — and
 * therefore every score — BIT-IDENTICAL to a fresh scan of the surviving
 * corpus (the stream_index_delete gate's oracle). The IVF family's
 * probes take the list table as input, so a filtered list table makes a
 * deleted id UNSERVABLE from any probe path (DeleteStreamSpec pins this
 * across raw/SQ8/prefix probes).
 *
 * Precondition: insert ids are unique among LIVE rows — re-inserting an
 * id without deleting it first lands duplicate index rows (send D then I
 * in later batches for upsert; [[graft.operators.Merge.applyChangelog]]
 * is the seq-ordered alternative).
 *
 * Scale shape per batch: one narrow assignment projection over the
 * batch's inserts + two O(batch) delta writes; the anti-join on serve is
 * id-keyed (at rest both sides bucket by id, so it co-locates) against a
 * tombstone side bounded by deletions since the last compaction.
 */
object DeleteStream {

  /** The served view: index rows minus tombstoned (id, version <= tv). */
  private def minus(rows: DataFrame, tombs: DataFrame,
      idName: String): DataFrame =
    rows.join(tombs,
      rows(idName) === tombs("__tid") && rows("__v") <= tombs("__tv"),
      "left_anti")

  private def servedAt(spark: SparkSession, stateDir: String, chain: String,
      idName: String, version: Long, baseCap: Long): DataFrame =
    minus(DeltaState.read(spark, stateDir, chain, version, baseCap),
      DeltaState.read(spark, stateDir, s"${chain}tmb", version, baseCap),
      idName)

  /** The shared delete-aware fold: `assign` maps a batch's INSERT rows to
    * index rows (keyed by `idName` after assignment); `idCol` + `opCol`
    * name the changelog's key and I/D op columns. Returns the final
    * served index (internal `__v` tag dropped). */
  private[streaming] def deleteAwareFold(spark: SparkSession,
      history: DataFrame,
      logDir: String, schema: StructType, stateDir: String, chain: String,
      idCol: String, idName: String, opCol: String, retainVersions: Int,
      compactEvery: Int, assign: DataFrame => DataFrame): DataFrame = {
    require(retainVersions >= 2, "deleteAwareFold: retainVersions >= 2")
    val tmb = s"${chain}tmb"
    // Tombstones carry the changelog's NATIVE id type (string doc ids
    // included) — a silent cast-to-long would null out non-numeric ids
    // and make their deletes no-op while the rows kept being served.
    val idType = schema(idCol).dataType
    val emptyTombs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("__tid", idType),
        StructField("__tv", LongType))))
    DeltaState.writeBase(assign(history).withColumn("__v", lit(0L)),
      stateDir, chain, 0L)
    DeltaState.writeBase(emptyTombs, stateDir, tmb, 0L)
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(logDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val ins = batch.where(col(opCol) === "I")
      val dels = batch.where(col(opCol) === "D")
        .select(col(idCol).as("__tid")).distinct()
      DeltaState.writeDelta(assign(ins).withColumn("__v", lit(id + 1)),
        stateDir, chain, id + 1)
      DeltaState.writeDelta(dels.withColumn("__tv", lit(id + 1)),
        stateDir, tmb, id + 1)
      if (DeltaState.due(stateDir, chain, id + 1, compactEvery)) {
        // Bake the tombstones: the served view (inputs resolved at the
        // replay-safe cap id) becomes the new base; the tombstone chain
        // restarts empty at the same version — deleted rows are
        // physically gone past this horizon.
        DeltaState.writeBase(servedAt(spark, stateDir, chain, idName,
          id + 1, id), stateDir, chain, id + 1)
        DeltaState.writeBase(emptyTombs, stateDir, tmb, id + 1)
        DeltaState.vacuum(stateDir, chain, retainVersions)
        DeltaState.vacuum(stateDir, tmb, retainVersions)
      }
      last = id + 1
    })
    servedAt(spark, stateDir, chain, idName, last, last).drop("__v")
  }

  /**
   * BM25 postings maintenance under deletes: the changelog stream in
   * `logDir` (parquet, `schema` = (idCol, textCol, opCol); D rows need
   * only the id) folds into served (doc_id, term, tf) postings that
   * always equal [[TextAnalysis.termPostings]] over exactly the
   * SURVIVING documents — feed them to [[TextAnalysis.bm25FromPostings]]
   * and every df/avgdl/N (hence every score) matches a fresh scan of the
   * surviving corpus bit for bit.
   */
  def incrementalPostingsWithDeletes(spark: SparkSession, history: DataFrame,
      logDir: String, schema: StructType, stateDir: String,
      idCol: String, textCol: String, opCol: String,
      retainVersions: Int = 3, compactEvery: Int = 16): DataFrame =
    deleteAwareFold(spark, history, logDir, schema, stateDir, "post",
      idCol, "doc_id", opCol, retainVersions, compactEvery,
      batch => TextAnalysis.termPostings(batch, idCol, textCol))

  /**
   * IVF inverted-list maintenance under deletes: the changelog stream
   * (`schema` = (idCol, vecCol, opCol)) folds into served (cid, id, vec)
   * lists equal to [[Similarity.ivfAssignments]] over exactly the
   * surviving vectors — a deleted id can never be returned by
   * [[Similarity.probeIndex]] (or any list-table probe) because it is
   * absent from the table the probe scans.
   */
  def incrementalIvfWithDeletes(spark: SparkSession, history: DataFrame,
      logDir: String, schema: StructType, stateDir: String,
      idCol: String, vecCol: String, opCol: String,
      centroids: Seq[(Long, Array[Float])],
      retainVersions: Int = 3, compactEvery: Int = 16): DataFrame = {
    require(centroids.nonEmpty,
      "incrementalIvfWithDeletes: train the coarse quantizer first")
    deleteAwareFold(spark, history, logDir, schema, stateDir, "lists",
      idCol, "id", opCol, retainVersions, compactEvery,
      batch => Similarity.ivfAssignments(batch, idCol, vecCol, centroids))
  }

  /** [[incrementalIvfWithDeletes]] with the SQ8 payload — served
    * (cid, id, code, cmax) lists over exactly the surviving vectors. */
  def incrementalIvfSq8WithDeletes(spark: SparkSession, history: DataFrame,
      logDir: String, schema: StructType, stateDir: String,
      idCol: String, vecCol: String, opCol: String,
      centroids: Seq[(Long, Array[Float])],
      retainVersions: Int = 3, compactEvery: Int = 16): DataFrame = {
    require(centroids.nonEmpty,
      "incrementalIvfSq8WithDeletes: train the coarse quantizer first")
    deleteAwareFold(spark, history, logDir, schema, stateDir, "sq8_lists",
      idCol, "id", opCol, retainVersions, compactEvery,
      batch => Similarity.ivfSq8Assignments(batch, idCol, vecCol, centroids))
  }

  /** [[incrementalIvfWithDeletes]] on the IVF x PQ fold — served
    * (cid, id, m, code) code rows over exactly the surviving vectors, so
    * the pure-ADC probe ([[Similarity.probePqIndex]]) can never return a
    * tombstoned id: it is absent from the code table the probe scans.
    * Tombstones anti-join on id and cover ALL m subspace rows of a
    * vector (the fold keys on id, not (id, m)); compaction hard-deletes
    * the codes. */
  def incrementalIvfPqWithDeletes(spark: SparkSession, history: DataFrame,
      logDir: String, schema: StructType, stateDir: String,
      idCol: String, vecCol: String, opCol: String,
      centroids: Seq[(Long, Array[Float])],
      codebooks: Seq[Seq[(Long, Array[Float])]], subDim: Int,
      retainVersions: Int = 3, compactEvery: Int = 16): DataFrame = {
    require(centroids.nonEmpty && codebooks.nonEmpty,
      "incrementalIvfPqWithDeletes: train the quantizer and codebooks first")
    deleteAwareFold(spark, history, logDir, schema, stateDir, "pq_lists",
      idCol, "id", opCol, retainVersions, compactEvery,
      batch => Similarity.ivfPqAssignments(batch, idCol, vecCol, centroids,
        codebooks, subDim))
  }

  /** [[incrementalIvfWithDeletes]] with the Matryoshka PREFIX payload —
    * served (cid, id, prefix) lists over exactly the surviving vectors. */
  def incrementalIvfMatryoshkaWithDeletes(spark: SparkSession,
      history: DataFrame, logDir: String, schema: StructType,
      stateDir: String, idCol: String, vecCol: String, opCol: String,
      centroids: Seq[(Long, Array[Float])], pdim: Int,
      retainVersions: Int = 3, compactEvery: Int = 16): DataFrame = {
    require(centroids.nonEmpty,
      "incrementalIvfMatryoshkaWithDeletes: train the coarse quantizer first")
    deleteAwareFold(spark, history, logDir, schema, stateDir, "mat_lists",
      idCol, "id", opCol, retainVersions, compactEvery,
      batch => Similarity.ivfMatryoshkaAssignments(batch, idCol, vecCol,
        centroids, pdim))
  }
}
