package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.operators.Similarity

/**
 * Streaming embedding-index maintenance — the ANN twin of
 * [[DedupStream]]: vector batches arrive as a stream and are folded into
 * a persisted IVF inverted-list index, so similarity queries always run
 * against everything ingested so far WITHOUT re-scanning or re-assigning
 * history.
 *
 * The coarse quantizer is trained ONCE (on history, offline — the
 * standard IVF recipe; retraining is a scheduled rebuild, not a per-batch
 * step), so each micro-batch costs one narrow nprobe=1 assignment
 * projection plus a DELTA write: day-N ingest is O(batch) in compute AND
 * in I/O. State lives as [[DeltaState]] chains — batch b physically
 * writes only `lists_d{b}`; the accumulated index is one multi-path scan
 * of base ∪ deltas; the scheduled rebuild (which re-keys every row
 * anyway) is the only full-state write, doubling as the compaction.
 * Replays re-overwrite only their own delta, so exactly-once holds, and
 * [[DeltaState.vacuum]] keeps the newest `retainVersions` (>= 2) replay
 * anchors — the [[DedupStream]] retention contract.
 *
 * At 100 TB the lists live bucketed by cid: the per-batch append touches
 * only the buckets its vectors land in, and [[Similarity.probeIndex]]
 * co-locates with zero exchange on the index side.
 */
object EmbeddingIndexStream {

  /** The shared APPEND fold: seed `{chain}_base0` with the assigned
    * history, then run the vector stream to completion, each batch
    * writing ONLY its own `{chain}_d{b}` delta under the [[DeltaState]]
    * discipline — per-batch ingest I/O is O(batch), never O(accumulated
    * index). Maintenance is the two-level LSM: every `packEvery`
    * batches the trailing deltas merge into ONE pack (O(batch ·
    * packEvery) bytes — the accumulated state is untouched), and only
    * every `compactEvery` batches does a full base rewrite happen —
    * ≤ 3 writes per row per base epoch, where single-level compaction
    * paid O(accumulated) every packEvery batches. Replays re-overwrite
    * only their own delta/pack/base from retained anchors, so
    * exactly-once is preserved. Returns the final accumulated index
    * (base ∪ packs ∪ deltas, one multi-path scan). Generic over the
    * per-batch assignment — [[MediaIndexStream]] rides the same fold for
    * signature tables. */
  private[streaming] def incrementalFold(spark: SparkSession, history: DataFrame,
      vecDir: String, schema: StructType, stateDir: String, chain: String,
      retainVersions: Int, assign: DataFrame => DataFrame,
      compactEvery: Int = 256, packEvery: Int = 16): DataFrame = {
    DeltaState.writeBase(assign(history), stateDir, chain, 0L)
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(vecDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      DeltaState.writeDelta(assign(batch), stateDir, chain, id + 1)
      if (DeltaState.due(stateDir, chain, id + 1, compactEvery)) {
        DeltaState.compact(spark, stateDir, chain, id + 1)
        DeltaState.vacuum(stateDir, chain, retainVersions)
      } else if (DeltaState.packDue(stateDir, chain, id + 1, packEvery)) {
        DeltaState.pack(spark, stateDir, chain, id + 1)
        DeltaState.vacuum(stateDir, chain, retainVersions)
      }
      last = id + 1
    })
    DeltaState.read(spark, stateDir, chain, last)
  }

  /** The shared MERGE fold for CONSTANT-SIZE states (CMS grids, dim
    * stats, histograms, DSIR bucket counts): batch b reads v{b}, merges,
    * overwrites v{b+1} — the original full-rewrite discipline, which is
    * O(1) I/O per batch exactly because the state never grows. Growing
    * states must use [[incrementalFold]]'s delta chains instead. */
  private[streaming] def mergedFold(spark: SparkSession, history: DataFrame,
      vecDir: String, schema: StructType, stateDir: String, prefix: String,
      retainVersions: Int, assign: DataFrame => DataFrame,
      combine: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    assign(history).write.mode("overwrite").parquet(s"$stateDir/${prefix}0")
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(vecDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val prev = spark.read.parquet(s"$stateDir/$prefix$id")
      combine(prev, assign(EventStream.spread(batch)))
        .write.mode("overwrite").parquet(s"$stateDir/$prefix${id + 1}")
      ChangelogStream.vacuum(stateDir, retainVersions, prefix = prefix)
      last = id + 1
    })
    spark.read.parquet(s"$stateDir/$prefix$last")
  }

  /**
   * Runs the vector stream in `vecDir` (parquet, `schema` with id/vec
   * columns named `idCol`/`vecCol`) to completion, starting from
   * `history` (assigned as `lists_base0`), folding (cid, id, vec) list
   * rows under `stateDir` as per-batch deltas. Returns the final
   * accumulated index.
   */
  def incrementalIvf(spark: SparkSession, history: DataFrame,
      vecDir: String, schema: StructType, stateDir: String,
      idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])],
      retainVersions: Int = 3, compactEvery: Int = 256,
      packEvery: Int = 16): DataFrame = {
    require(retainVersions >= 2,
      "incrementalIvf: retainVersions >= 2 (current + replay anchor)")
    require(centroids.nonEmpty,
      "incrementalIvf: empty coarse quantizer — train centroids first")
    incrementalFold(spark, history, vecDir, schema, stateDir, "lists",
      retainVersions,
      batch => Similarity.ivfAssignments(batch, idCol, vecCol, centroids),
      compactEvery, packEvery)
  }

  /**
   * [[incrementalIvf]] whose folded rows CARRY filterable attribute
   * columns — (cid, id, vec, attrs...) per
   * [[graft.operators.Similarity.ivfAssignmentsWithAttrs]] — so the
   * accumulated state serves predicate-aware top-k directly through
   * [[graft.operators.Similarity.probeIndexFiltered]] (the pre-filter
   * recall contract: the predicate runs inside the probed lists, before
   * any ranking or trim). Same delta-chain I/O discipline; the attribute
   * bytes ride the same per-batch delta as the payload they qualify.
   */
  def incrementalIvfWithAttrs(spark: SparkSession, history: DataFrame,
      vecDir: String, schema: StructType, stateDir: String,
      idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])], attrCols: Seq[String],
      retainVersions: Int = 3, compactEvery: Int = 256,
      packEvery: Int = 16): DataFrame = {
    require(retainVersions >= 2,
      "incrementalIvfWithAttrs: retainVersions >= 2 (current + replay anchor)")
    require(centroids.nonEmpty,
      "incrementalIvfWithAttrs: empty coarse quantizer — train centroids first")
    incrementalFold(spark, history, vecDir, schema, stateDir, "lists",
      retainVersions,
      batch => Similarity.ivfAssignmentsWithAttrs(batch, idCol, vecCol,
        centroids, attrCols),
      compactEvery, packEvery)
  }

  /**
   * The SCHEDULED REBUILD the incremental fold's header promises: once
   * the ingested distribution has drifted from the history the coarse
   * quantizer was trained on, probe recall decays — the new mass lives
   * in lists whose centroids no longer resolve it. This retrains the
   * quantizer FROM the accumulated index rows themselves ((cid, id, vec)
   * — the vectors are already there; the corpus is never re-read) on the
   * deterministic 1-in-`trainMod` id sample, re-keys every list row to
   * the new quantizer in one narrow assignment pass, and returns
   * (newCentroids, newLists).
   *
   * Deployment shape: run it as a scheduled job against lists v{n},
   * write the re-keyed lists as v{n+1} under the same
   * [[ChangelogStream]] overwrite+vacuum discipline, and swap the
   * serving centroids with the version flip — probes are a (centroids,
   * lists) PAIR, so the flip is atomic at the version boundary. Grow `k`
   * with the accumulated count (the [[graft.operators.Dedup.semanticKFor]]
   * dial) so list occupancy stays flat as the index accumulates.
   *
   * Deterministic end to end ([[Similarity.trainKMeans]]'s contract), so
   * the rebuilt index is engine-replayable like the original.
   */
  def rebuildIvf(lists: DataFrame, idCol: String, vecCol: String, k: Int,
      dim: Int, iters: Int, trainMod: Int = 4)
      : (Seq[(Long, Array[Float])], DataFrame) = {
    require(k > 0 && trainMod >= 1, "rebuildIvf: k > 0, trainMod >= 1")
    import org.apache.spark.sql.functions.col
    val rows = lists.select(col(idCol), col(vecCol))
    val cents = Similarity.trainKMeans(
      rows.where(col(idCol) % trainMod === 0), idCol, vecCol, k, dim, iters)
    (cents, Similarity.ivfAssignments(rows, idCol, vecCol, cents))
  }

  /**
   * [[incrementalIvf]] with the SCHEDULED REBUILD WIRED INTO the fold
   * (the `refreshEvery` pattern [[GraphStream.incrementalPagerank]]
   * established): every `rebuildEvery`-th batch, after folding its own
   * assignments, retrains the quantizer from the accumulated index rows
   * ([[rebuildIvf]] — k grown with the accumulated count via `rebuildK`)
   * and re-keys every list row, so probe recall tracks distribution
   * drift WITHOUT a separate maintenance job.
   *
   * Atomic version flip, replay-idempotent: probes need a MATCHED
   * (centroids, lists) pair, so centroids persist per version
   * (`cents_v{b}` — metadata-sized) alongside the `lists` delta chain.
   * A non-rebuild batch writes only its own `lists_d{b}` delta plus the
   * centroid copy — O(batch) I/O; a rebuild batch writes the re-keyed
   * rows as the new `lists_base{b}`: the rebuild IS the compaction, the
   * fold's only full-state write. A replayed batch re-reads its
   * untouched inputs (the previous base + deltas, which vacuum retains)
   * and lands bit-identically, rebuild included
   * ([[graft.operators.Similarity.trainKMeans]] is deterministic).
   *
   * Returns the final (centroids, lists) pair.
   */
  def incrementalIvfWithRebuild(spark: SparkSession, history: DataFrame,
      vecDir: String, schema: StructType, stateDir: String,
      idCol: String, vecCol: String,
      centroids0: Seq[(Long, Array[Float])], rebuildEvery: Int,
      rebuildK: Long => Int, dim: Int, iters: Int, trainMod: Int = 4,
      retainVersions: Int = 3): (Seq[(Long, Array[Float])], DataFrame) = {
    require(retainVersions >= 2,
      "incrementalIvfWithRebuild: retainVersions >= 2")
    require(rebuildEvery >= 1, "incrementalIvfWithRebuild: rebuildEvery >= 1")
    require(centroids0.nonEmpty,
      "incrementalIvfWithRebuild: empty initial quantizer")
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def writeCents(cents: Seq[(Long, Array[Float])], path: String): Unit =
      cents.map { case (c, v) => (c, v.toSeq) }.toDF("cid", "cvec")
        .coalesce(1).write.mode("overwrite").parquet(path)
    def readCents(path: String): Seq[(Long, Array[Float])] =
      spark.read.parquet(path).orderBy(col("cid")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    DeltaState.writeBase(
      Similarity.ivfAssignments(history, idCol, vecCol, centroids0),
      stateDir, "lists", 0L)
    writeCents(centroids0, s"$stateDir/cents_v0")
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(vecDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val cents = readCents(s"$stateDir/cents_v$id")
      DeltaState.writeDelta(
        Similarity.ivfAssignments(batch, idCol, vecCol, cents),
        stateDir, "lists", id + 1)
      if ((id + 1) % rebuildEvery == 0) {
        // The scheduled rebuild IS the compaction: re-keying already
        // rewrites every row, so this is the fold's ONLY full-state
        // write — non-rebuild batches cost O(batch) I/O. Training
        // re-reads the accumulated multi-path scan iters+1 times; the
        // output lands under a NEW base path, so no version is ever
        // read and overwritten in the same batch.
        // baseCap = id: a REPLAYED rebuild must re-read the previous
        // anchor, never the base it wrote last time (DeltaState.compact's
        // replay rule, hand-rolled because the merge is the re-key).
        val acc = DeltaState.read(spark, stateDir, "lists", id + 1, id)
        val (nc, nl) = rebuildIvf(acc, "id", "vec", rebuildK(acc.count()),
          dim, iters, trainMod)
        DeltaState.writeBase(nl, stateDir, "lists", id + 1)
        writeCents(nc, s"$stateDir/cents_v${id + 1}")
        DeltaState.vacuum(stateDir, "lists", retainVersions)
      } else {
        writeCents(cents, s"$stateDir/cents_v${id + 1}")
      }
      ChangelogStream.vacuum(stateDir, retainVersions, prefix = "cents_v")
      last = id + 1
    })
    (readCents(s"$stateDir/cents_v$last"),
      DeltaState.read(spark, stateDir, "lists", last))
  }

  /**
   * The IVF x PQ twin of [[incrementalIvf]]: the folded state is
   * [[Similarity.ivfPqAssignments]] rows (cid, id, m, code) — each
   * ingested vector is coarse-assigned AND PQ-encoded once, on arrival,
   * and only its CODES enter the index. Per-batch cost is one narrow
   * projection + an append, and the persisted state is ~m bytes per
   * vector instead of dim x 4: the index a billion-vector deployment can
   * actually hold. Probes go through [[Similarity.probePqIndex]] (ADC
   * re-rank from the broadcast LUT) — raw vectors never leave storage on
   * the probe path. Same versioning/vacuum contract as [[incrementalIvf]].
   */
  def incrementalIvfPq(spark: SparkSession, history: DataFrame,
      vecDir: String, schema: StructType, stateDir: String,
      idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])],
      codebooks: Seq[Seq[(Long, Array[Float])]], subDim: Int,
      retainVersions: Int = 3, compactEvery: Int = 256,
      packEvery: Int = 16): DataFrame = {
    require(retainVersions >= 2,
      "incrementalIvfPq: retainVersions >= 2 (current + replay anchor)")
    require(centroids.nonEmpty && codebooks.nonEmpty,
      "incrementalIvfPq: train the coarse quantizer and codebooks first")
    incrementalFold(spark, history, vecDir, schema, stateDir, "pq_lists",
      retainVersions,
      batch => Similarity.ivfPqAssignments(batch, idCol, vecCol, centroids,
        codebooks, subDim),
      compactEvery, packEvery)
  }

  /**
   * STREAMING IVF x SQ8 index: [[incrementalIvfPq]]'s fold with the SQ8
   * payload — each arriving vector is coarse-assigned and int8-quantized
   * once, and the persisted state is (cid, id, code, cmax): dim bytes +
   * one scale per vector (4× under raw lists) with near-exact estimates
   * (no codebook training, no LUT — the [[Similarity.probeSq8Index]]
   * probe is an exact-BIGINT dot per candidate). Same versioning/vacuum/
   * replay-idempotence contract as the sibling folds.
   */
  def incrementalIvfSq8(spark: SparkSession, history: DataFrame,
      vecDir: String, schema: StructType, stateDir: String,
      idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])],
      retainVersions: Int = 3, compactEvery: Int = 256,
      packEvery: Int = 16): DataFrame = {
    require(retainVersions >= 2,
      "incrementalIvfSq8: retainVersions >= 2 (current + replay anchor)")
    require(centroids.nonEmpty,
      "incrementalIvfSq8: train the coarse quantizer first")
    incrementalFold(spark, history, vecDir, schema, stateDir, "sq8_lists",
      retainVersions,
      batch => Similarity.ivfSq8Assignments(batch, idCol, vecCol, centroids),
      compactEvery, packEvery)
  }

  /**
   * STREAMING IVF x Matryoshka index: the [[incrementalIvfSq8]] fold
   * with the PREFIX payload — each arriving vector is coarse-assigned
   * and its first-pdim prefix stored once, so the persisted state is
   * (cid, id, prefix): dim/pdim of the raw-list bytes, probed by
   * [[Similarity.probeMatryoshkaIndex]]'s stored-prefix cosine with an
   * exact re-rank against corpus storage for the shortlist only. This
   * completes the streaming row of the serving matrix — every payload
   * the batch indexes support ({raw, PQ, SQ8, prefix}) now has its
   * incremental fold. Same versioning/vacuum/replay-idempotence
   * contract as the sibling folds.
   */
  def incrementalIvfMatryoshka(spark: SparkSession, history: DataFrame,
      vecDir: String, schema: StructType, stateDir: String,
      idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])], pdim: Int,
      retainVersions: Int = 3, compactEvery: Int = 256,
      packEvery: Int = 16): DataFrame = {
    require(retainVersions >= 2,
      "incrementalIvfMatryoshka: retainVersions >= 2 (current + replay anchor)")
    require(centroids.nonEmpty,
      "incrementalIvfMatryoshka: train the coarse quantizer first")
    incrementalFold(spark, history, vecDir, schema, stateDir, "mat_lists",
      retainVersions,
      batch => Similarity.ivfMatryoshkaAssignments(batch, idCol, vecCol,
        centroids, pdim),
      compactEvery, packEvery)
  }

  /**
   * [[rebuildIvf]] for the Matryoshka PREFIX index — retrain + re-key
   * FROM STORED PREFIXES ONLY. The accumulated state is (cid, id,
   * prefix); raw vectors never entered it, so the retrained quantizer
   * lives in PREFIX space (pdim-dimensional): k-means over the
   * deterministic 1-in-`trainMod` prefix sample, then one narrow
   * prefix-nearest re-key. The PAYLOAD is untouched — prefixes are
   * per-vector and centroid-independent, the [[rebuildIvfSq8]] recipe
   * verbatim.
   *
   * Approximation contract (the prefix-trained-quantizer approximation):
   * clustering structure in prefix space is exactly what matryoshka
   * training preserves — the prefix carries the representation's
   * coarse-to-fine signal — so a prefix-trained quantizer tracks drift
   * as a raw-vector retrain would at the coarse-assignment level (the
   * stream_ivfmat_rebuild gate pins the recovered-recall margin on the
   * planted-drift fixture; RebuildSweep measures it). Deterministic end
   * to end, engine-replayable.
   */
  def rebuildIvfMatryoshka(lists: DataFrame, k: Int, pdim: Int, iters: Int,
      trainMod: Int = 4): (Seq[(Long, Array[Float])], DataFrame) = {
    require(k > 0 && trainMod >= 1, "rebuildIvfMatryoshka: k > 0, trainMod >= 1")
    import org.apache.spark.sql.functions.{col, element_at}
    val cents = Similarity.trainKMeans(
      lists.where(col("id") % trainMod === 0), "id", "prefix", k, pdim, iters)
    val rekeyed = lists.select(
      element_at(Similarity.probeCids(col("prefix"), cents, 1), 1).as("cid"),
      col("id"), col("prefix"))
    (cents, rekeyed)
  }

  /**
   * [[incrementalIvfSq8WithRebuild]] with the PREFIX payload — the last
   * fold family gains its drift-recovery path. The fold's quantizer
   * lives in PREFIX space from the start (`centroids0` must be
   * pdim-dimensional — train it on sliced prefixes): arrivals
   * coarse-assign by their prefix, rebuilds retrain from the stored
   * prefixes ([[rebuildIvfMatryoshka]] — the corpus is never re-read)
   * and re-key with the payload untouched. A prefix-space quantizer also
   * means the FULL vector is needed nowhere on the coarse path — serve
   * with [[Similarity.probeMatryoshkaIndex]] passing queries pre-sliced
   * to pdim (slice(qvec, 1, pdim) — the query-side prefix is then both
   * the coarse probe key and the estimate side). Same atomic
   * (centroids, lists) version flip (`mat_cents_v{b}` metadata copies,
   * `mat_lists` delta chain with rebuild-as-compaction) and replay
   * idempotence as the SQ8 twin. Returns the final (centroids, lists).
   */
  def incrementalIvfMatryoshkaWithRebuild(spark: SparkSession,
      history: DataFrame, vecDir: String, schema: StructType,
      stateDir: String, idCol: String, vecCol: String,
      centroids0: Seq[(Long, Array[Float])], pdim: Int, rebuildEvery: Int,
      rebuildK: Long => Int, iters: Int, trainMod: Int = 4,
      retainVersions: Int = 3): (Seq[(Long, Array[Float])], DataFrame) = {
    require(retainVersions >= 2,
      "incrementalIvfMatryoshkaWithRebuild: retainVersions >= 2")
    require(rebuildEvery >= 1,
      "incrementalIvfMatryoshkaWithRebuild: rebuildEvery >= 1")
    require(centroids0.nonEmpty,
      "incrementalIvfMatryoshkaWithRebuild: empty initial quantizer")
    require(centroids0.forall(_._2.length == pdim),
      "incrementalIvfMatryoshkaWithRebuild: the quantizer lives in PREFIX " +
        s"space — train centroids0 on slice(vec, 1, $pdim) prefixes")
    import org.apache.spark.sql.functions.{col, element_at, slice}
    import spark.implicits._
    def writeCents(cents: Seq[(Long, Array[Float])], path: String): Unit =
      cents.map { case (c, v) => (c, v.toSeq) }.toDF("cid", "cvec")
        .coalesce(1).write.mode("overwrite").parquet(path)
    def readCents(path: String): Seq[(Long, Array[Float])] =
      spark.read.parquet(path).orderBy(col("cid")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    // Prefix-space assignment: cid by the PREFIX's nearest centroid, the
    // prefix itself as payload.
    def assign(df: DataFrame, cents: Seq[(Long, Array[Float])]): DataFrame = {
      val prefix = slice(col(vecCol), 1, pdim)
      df.select(
        element_at(Similarity.probeCids(prefix, cents, 1), 1).as("cid"),
        col(idCol).as("id"), prefix.as("prefix"))
    }
    DeltaState.writeBase(assign(history, centroids0), stateDir, "mat_lists", 0L)
    writeCents(centroids0, s"$stateDir/mat_cents_v0")
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(vecDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val cents = readCents(s"$stateDir/mat_cents_v$id")
      DeltaState.writeDelta(assign(batch, cents), stateDir, "mat_lists", id + 1)
      if ((id + 1) % rebuildEvery == 0) {
        // Rebuild == compaction (see incrementalIvfWithRebuild).
        val acc = DeltaState.read(spark, stateDir, "mat_lists", id + 1, id)
        val (nc, nl) = rebuildIvfMatryoshka(acc, rebuildK(acc.count()),
          pdim, iters, trainMod)
        DeltaState.writeBase(nl, stateDir, "mat_lists", id + 1)
        writeCents(nc, s"$stateDir/mat_cents_v${id + 1}")
        DeltaState.vacuum(stateDir, "mat_lists", retainVersions)
      } else {
        writeCents(cents, s"$stateDir/mat_cents_v${id + 1}")
      }
      ChangelogStream.vacuum(stateDir, retainVersions, prefix = "mat_cents_v")
      last = id + 1
    })
    (readCents(s"$stateDir/mat_cents_v$last"),
      DeltaState.read(spark, stateDir, "mat_lists", last))
  }

  // ---- Scheduled rebuild for the COMPRESSED folds ---------------------------

  /** SQ8 code rows decoded back to (approximate) vectors:
    * vec[j] ~ code[j] * cmax / 127 — the dequantization inverse of
    * [[graft.operators.VectorOps.quantizeInt8]], exact to within half a
    * quantization step (~7.9 effective bits/dim). One narrow codegen
    * projection; this is what makes the SQ8 index SELF-CONTAINED for
    * maintenance: the coarse quantizer can retrain from the index's own
    * state without ever re-reading the raw corpus. */
  private def sq8Reconstruct(code: org.apache.spark.sql.Column,
      cmax: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.transform(code,
      c => (c.cast("double") * cmax / org.apache.spark.sql.functions.lit(127.0))
        .cast("float"))

  /**
   * [[rebuildIvf]] for the SQ8 index — retrain + re-key FROM CODES ONLY.
   * The accumulated state is (cid, id, code, cmax); raw vectors never
   * entered it, so the rebuild runs on [[sq8Reconstruct]] dequantizations:
   * retrain the coarse quantizer on the deterministic 1-in-`trainMod`
   * reconstruction sample, then re-key every row by its reconstruction's
   * nearest new centroid in one narrow projection. The PAYLOAD (code,
   * cmax) is untouched — SQ8 codes are per-vector, centroid-independent,
   * so re-keying loses nothing: only the list structure changes.
   *
   * Approximation contract: reconstruction error is <= cmax/254 per
   * element, orders of magnitude below the inter-cluster distances that
   * make a rebuild worthwhile, so the retrained quantizer tracks the
   * drifted distribution as well as a raw-vector retrain would (the
   * stream_ivfsq8_rebuild gate pins the recovered-recall margin).
   * Deterministic end to end — [[Similarity.trainKMeans]]'s contract —
   * so the rebuilt index is engine-replayable.
   */
  def rebuildIvfSq8(lists: DataFrame, k: Int, dim: Int, iters: Int,
      trainMod: Int = 4): (Seq[(Long, Array[Float])], DataFrame) = {
    require(k > 0 && trainMod >= 1, "rebuildIvfSq8: k > 0, trainMod >= 1")
    import org.apache.spark.sql.functions.{col, element_at}
    val recon = lists.withColumn("rvec",
      sq8Reconstruct(col("code"), col("cmax")))
    val cents = Similarity.trainKMeans(
      recon.where(col("id") % trainMod === 0), "id", "rvec", k, dim, iters)
    val rekeyed = recon.select(
      element_at(Similarity.probeCids(col("rvec"), cents, 1), 1).as("cid"),
      col("id"), col("code"), col("cmax"))
    (cents, rekeyed)
  }

  /**
   * [[incrementalIvfWithRebuild]] with the SQ8 payload: the scheduled
   * retrain + re-key fires INSIDE the fold every `rebuildEvery`-th batch,
   * against the accumulated CODE state ([[rebuildIvfSq8]] — the corpus is
   * never re-read), with the same atomic (centroids, lists) version flip
   * and replay idempotence: a non-rebuild batch writes only its
   * `sq8_lists_d{b}` delta + the `sq8_cents_v{b}` metadata copy; the
   * rebuild writes the re-keyed rows as the new `sq8_lists_base{b}` —
   * rebuild == compaction. Returns the final (centroids, lists) pair.
   */
  def incrementalIvfSq8WithRebuild(spark: SparkSession, history: DataFrame,
      vecDir: String, schema: StructType, stateDir: String,
      idCol: String, vecCol: String,
      centroids0: Seq[(Long, Array[Float])], rebuildEvery: Int,
      rebuildK: Long => Int, dim: Int, iters: Int, trainMod: Int = 4,
      retainVersions: Int = 3): (Seq[(Long, Array[Float])], DataFrame) = {
    require(retainVersions >= 2,
      "incrementalIvfSq8WithRebuild: retainVersions >= 2")
    require(rebuildEvery >= 1, "incrementalIvfSq8WithRebuild: rebuildEvery >= 1")
    require(centroids0.nonEmpty,
      "incrementalIvfSq8WithRebuild: empty initial quantizer")
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def writeCents(cents: Seq[(Long, Array[Float])], path: String): Unit =
      cents.map { case (c, v) => (c, v.toSeq) }.toDF("cid", "cvec")
        .coalesce(1).write.mode("overwrite").parquet(path)
    def readCents(path: String): Seq[(Long, Array[Float])] =
      spark.read.parquet(path).orderBy(col("cid")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    DeltaState.writeBase(
      Similarity.ivfSq8Assignments(history, idCol, vecCol, centroids0),
      stateDir, "sq8_lists", 0L)
    writeCents(centroids0, s"$stateDir/sq8_cents_v0")
    @volatile var last = 0L
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(vecDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val cents = readCents(s"$stateDir/sq8_cents_v$id")
      DeltaState.writeDelta(
        Similarity.ivfSq8Assignments(batch, idCol, vecCol, cents),
        stateDir, "sq8_lists", id + 1)
      if ((id + 1) % rebuildEvery == 0) {
        // Rebuild == compaction (see incrementalIvfWithRebuild).
        val acc = DeltaState.read(spark, stateDir, "sq8_lists", id + 1, id)
        val (nc, nl) = rebuildIvfSq8(acc, rebuildK(acc.count()), dim, iters,
          trainMod)
        DeltaState.writeBase(nl, stateDir, "sq8_lists", id + 1)
        writeCents(nc, s"$stateDir/sq8_cents_v${id + 1}")
        DeltaState.vacuum(stateDir, "sq8_lists", retainVersions)
      } else {
        writeCents(cents, s"$stateDir/sq8_cents_v${id + 1}")
      }
      ChangelogStream.vacuum(stateDir, retainVersions, prefix = "sq8_cents_v")
      last = id + 1
    })
    (readCents(s"$stateDir/sq8_cents_v$last"),
      DeltaState.read(spark, stateDir, "sq8_lists", last))
  }

  /** PQ code rows decoded back to (approximate) vectors: the stored
    * (cid, id, m, code) rows join the broadcast codebook table and each
    * id's subvectors concatenate in subspace order — the ADC
    * reconstruction Σ_m books[m][code_m]. One broadcast join + one
    * per-id aggregate; coarser than [[sq8Reconstruct]] (PQ spends
    * log2(pqK)/subDim bits/dim) but still cluster-faithful, which is all
    * a coarse-quantizer retrain needs. */
  private[graft] def pqReconstruct(lists: DataFrame,
      codebooks: Seq[Seq[(Long, Array[Float])]]): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = lists.sparkSession
    import spark.implicits._
    val books = codebooks.zipWithIndex.flatMap { case (book, mi) =>
      book.map { case (code, sub) => (mi.toLong, code, sub.toSeq) }
    }.toDF("m", "code", "sub")
    lists.join(broadcast(books), Seq("m", "code"))
      .groupBy("id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("m"), col("sub")))),
        e => e.getField("sub"))).as("rvec"),
        count(lit(1)).as("__nsub"))
      .select(col("id"),
        reconChecked(col("rvec"), col("__nsub"), codebooks.length,
          "pqReconstruct"))
  }

  /** Per-row fail-fast that an id reconstructed from EXACTLY m subspace
    * rows: a duplicate ingest (or an id re-ingested across generations
    * in the unversioned path) would silently concatenate 2m subvectors
    * into a 2x-dim rvec and the re-key would mis-assign it with no
    * error. One codegen comparison on the count the aggregate already
    * produced. */
  private def reconChecked(rvec: org.apache.spark.sql.Column,
      nsub: org.apache.spark.sql.Column, m: Int,
      what: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(nsub === lit(m.toLong), rvec)
      .otherwise(raise_error(concat(
        lit(s"$what: id has "), nsub.cast("string"),
        lit(s" subspace code rows, expected exactly $m - duplicate " +
          "ingest of the same id (unique-id precondition violated)"))))
      .as("rvec")
  }

  /** [[pqReconstruct]] over a GENERATIONAL index: each (cid, id, m,
    * code, bv) row decodes against the codebooks of ITS OWN generation
    * `bv` — the broadcast book table just gains the bv key. */
  private[graft] def pqReconstructVersioned(lists: DataFrame,
      booksByVersion: Seq[(Long, Seq[Seq[(Long, Array[Float])]])])
      : DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = lists.sparkSession
    import spark.implicits._
    val books = booksByVersion.flatMap { case (bv, cbs) =>
      cbs.zipWithIndex.flatMap { case (book, mi) =>
        book.map { case (code, sub) => (bv, mi.toLong, code, sub.toSeq) }
      }
    }.toDF("bv", "m", "code", "sub")
    val m = booksByVersion.headOption.map(_._2.length).getOrElse(0)
    lists.join(broadcast(books), Seq("bv", "m", "code"))
      .groupBy("id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("m"), col("sub")))),
        e => e.getField("sub"))).as("rvec"),
        count(lit(1)).as("__nsub"))
      .select(col("id"),
        reconChecked(col("rvec"), col("__nsub"), m,
          "pqReconstructVersioned"))
  }

  /**
   * [[rebuildIvf]] for the IVF x PQ index — GENERATIONAL retrain + re-key.
   * The accumulated code state is (cid, id, m, code, bv) rows plus the
   * RAW TRAINING RESERVOIR `reservoir` (the deterministic 1-in-stride
   * (id, vec) slice the fold keeps beside the codes): the new coarse
   * quantizer AND the new codebook generation train on the reservoir's
   * raw, drift-faithful vectors; every list row is then re-keyed by its
   * RECONSTRUCTION's nearest new centroid with CODES KEPT, and the new
   * books serve FUTURE arrivals only.
   *
   * Both halves of that design are measured, not assumed (RebuildSweep,
   * r16, drift fixture, served-path recall at refine 150 of 640):
   *  - re-key-codes-kept 490 vs full re-encode 468 — a decode+re-encode
   *    DOUBLE-quantizes every old row; keeping codes holds payload noise
   *    at one step (stale floor 379, fresh-raw ceiling 521);
   *  - codebooks must train on RAW vectors: a codes-only retrain learns
   *    from data supported on the OLD codebook lattice, entries collapse
   *    onto popular lattice points, and the fixture run came back 420 —
   *    WORSE than not retraining at all. The reservoir is the
   *    information the codes fundamentally cannot supply, at
   *    dim*4/stride bytes per indexed vector of extra state.
   * Probes pay one broadcast LUT per generation
   * ([[Similarity.probePqIndexVersioned]]). Deterministic end to end,
   * engine-replayable.
   */
  def rebuildIvfPq(lists: DataFrame, reservoir: DataFrame,
      booksByVersion: Seq[(Long, Seq[Seq[(Long, Array[Float])]])],
      k: Int, dim: Int, iters: Int, subDim: Int, pqK: Int, pqIters: Int)
      : (Seq[(Long, Array[Float])], Seq[Seq[(Long, Array[Float])]],
         DataFrame) = {
    require(k > 0, "rebuildIvfPq: k > 0")
    require(booksByVersion.nonEmpty, "rebuildIvfPq: no codebook generations")
    import org.apache.spark.sql.functions.{col, element_at}
    val cents = Similarity.trainKMeans(reservoir, "id", "vec", k, dim, iters)
    val m = booksByVersion.head._2.length
    val newBooks = Similarity.trainPQ(reservoir, "id", "vec", m, subDim,
      pqK, pqIters)
    val recon = pqReconstructVersioned(lists, booksByVersion)
    val cidOf = recon.select(col("id"),
      element_at(Similarity.probeCids(col("rvec"), cents, 1), 1).as("__ncid"))
    val rekeyed = lists.drop("cid").join(cidOf, "id")
      .select(col("__ncid").as("cid"), col("id"), col("m"), col("code"),
        col("bv"))
    (cents, newBooks, rekeyed)
  }

  /**
   * [[incrementalIvfWithRebuild]] with the PQ payload, GENERATIONAL:
   * arriving vectors encode against the NEWEST codebook generation and
   * their list rows carry its `bv` tag; the fold ALSO keeps the raw
   * training reservoir (every `trainMod`-th id's (id, vec), the
   * `pq_res` delta chain — dim*4/trainMod bytes per indexed vector, the state
   * price of retrainable codebooks; see [[rebuildIvfPq]] for the
   * measurement that makes it non-optional). Every `rebuildEvery`-th
   * batch [[rebuildIvfPq]] retrains quantizer + a new codebook
   * generation from the reservoir, re-keys all rows (codes kept), and
   * generation bv+1 serves subsequent arrivals. Probes need a matched
   * (centroids, generations-map, lists) TRIPLE: the metadata sides
   * persist per version (`pq_cents_v{b}`, `pq_books_v{b}` — ALL
   * generations, keyed by bv) while the lists and the reservoir fold as
   * [[DeltaState]] chains (`pq_lists`, `pq_res`) whose bases flip at
   * the rebuild boundary — the triple still swaps atomically at the
   * version boundary, and a replayed batch re-reads its untouched
   * inputs and lands bit-identically. Returns the final triple; serve
   * it through [[Similarity.probePqIndexVersioned]].
   */
  def incrementalIvfPqWithRebuild(spark: SparkSession, history: DataFrame,
      vecDir: String, schema: StructType, stateDir: String,
      idCol: String, vecCol: String,
      centroids0: Seq[(Long, Array[Float])],
      codebooks0: Seq[Seq[(Long, Array[Float])]], subDim: Int,
      rebuildEvery: Int, rebuildK: Long => Int, dim: Int, iters: Int,
      pqK: Int, pqIters: Int, trainMod: Int = 4, retainVersions: Int = 3)
      : (Seq[(Long, Array[Float])],
         Seq[(Long, Seq[Seq[(Long, Array[Float])]])], DataFrame) = {
    require(retainVersions >= 2,
      "incrementalIvfPqWithRebuild: retainVersions >= 2")
    require(rebuildEvery >= 1, "incrementalIvfPqWithRebuild: rebuildEvery >= 1")
    require(centroids0.nonEmpty && codebooks0.nonEmpty,
      "incrementalIvfPqWithRebuild: train the initial quantizer + codebooks")
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    def writeCents(cents: Seq[(Long, Array[Float])], path: String): Unit =
      cents.map { case (c, v) => (c, v.toSeq) }.toDF("cid", "cvec")
        .coalesce(1).write.mode("overwrite").parquet(path)
    def readCents(path: String): Seq[(Long, Array[Float])] =
      spark.read.parquet(path).orderBy(col("cid")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    def writeBooks(gens: Seq[(Long, Seq[Seq[(Long, Array[Float])]])],
        path: String): Unit =
      gens.flatMap { case (bv, cbs) =>
        cbs.zipWithIndex.flatMap { case (book, mi) =>
          book.map { case (code, sub) => (bv, mi.toLong, code, sub.toSeq) }
        }
      }.toDF("bv", "m", "code", "sub")
        .coalesce(1).write.mode("overwrite").parquet(path)
    def readBooks(path: String)
        : Seq[(Long, Seq[Seq[(Long, Array[Float])]])] =
      spark.read.parquet(path).orderBy(col("bv"), col("m"), col("code"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getSeq[Float](3).toArray))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (bv, rows) =>
          (bv, rows.groupBy(_._2).toSeq.sortBy(_._1)
            .map(_._2.map(t => (t._3, t._4)).toSeq))
        }
    def resOf(df: DataFrame): DataFrame =
      df.where(col(idCol) % trainMod === 0)
        .select(col(idCol).as("id"), col(vecCol).as("vec"))
    DeltaState.writeBase(
      Similarity.ivfPqAssignments(history, idCol, vecCol, centroids0,
          codebooks0, subDim)
        .withColumn("bv", lit(0L)),
      stateDir, "pq_lists", 0L)
    writeCents(centroids0, s"$stateDir/pq_cents_v0")
    writeBooks(Seq((0L, codebooks0)), s"$stateDir/pq_books_v0")
    DeltaState.writeBase(resOf(history), stateDir, "pq_res", 0L)
    @volatile var last = 0L
    val m = codebooks0.length.toLong
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(vecDir)
    EventStream.runForeachBatch(spark, stream, (batch, id) => {
      val cents = readCents(s"$stateDir/pq_cents_v$id")
      val gens = readBooks(s"$stateDir/pq_books_v$id")
      val (newestBv, newestBooks) = gens.last
      DeltaState.writeDelta(
        Similarity.ivfPqAssignments(batch, idCol, vecCol, cents,
            newestBooks, subDim)
          .withColumn("bv", lit(newestBv)),
        stateDir, "pq_lists", id + 1)
      DeltaState.writeDelta(resOf(batch), stateDir, "pq_res", id + 1)
      if ((id + 1) % rebuildEvery == 0) {
        // Rebuild == compaction for the code lists; the raw reservoir
        // compacts physically on the same cadence (it is 1/trainMod of
        // the corpus — small beside the list rewrite happening anyway).
        val acc = DeltaState.read(spark, stateDir, "pq_lists", id + 1, id)
        val res = DeltaState.read(spark, stateDir, "pq_res", id + 1, id)
        // Code rows are per-(vector, subspace): nVecs = rows / m.
        val (nc, nb, nl) = rebuildIvfPq(acc, res, gens,
          rebuildK(acc.count() / m), dim, iters, subDim, pqK, pqIters)
        DeltaState.writeBase(nl, stateDir, "pq_lists", id + 1)
        DeltaState.compact(spark, stateDir, "pq_res", id + 1)
        writeCents(nc, s"$stateDir/pq_cents_v${id + 1}")
        writeBooks(gens :+ ((newestBv + 1L, nb)),
          s"$stateDir/pq_books_v${id + 1}")
        DeltaState.vacuum(stateDir, "pq_lists", retainVersions)
        DeltaState.vacuum(stateDir, "pq_res", retainVersions)
      } else {
        writeCents(cents, s"$stateDir/pq_cents_v${id + 1}")
        writeBooks(gens, s"$stateDir/pq_books_v${id + 1}")
      }
      ChangelogStream.vacuum(stateDir, retainVersions, prefix = "pq_cents_v")
      ChangelogStream.vacuum(stateDir, retainVersions, prefix = "pq_books_v")
      last = id + 1
    })
    (readCents(s"$stateDir/pq_cents_v$last"),
      readBooks(s"$stateDir/pq_books_v$last"),
      DeltaState.read(spark, stateDir, "pq_lists", last))
  }
}
