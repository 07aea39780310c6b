package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Per-batch DELTA chains for the streaming folds' growing state — the
 * write-amplification fix for the versioned full-rewrite discipline.
 *
 * The r6-era fold wrote state v{b+1} = fold(v{b}, batch b) as a FULL
 * parquet rewrite every micro-batch. That is exactly-once and
 * replay-idempotent, but batch b's I/O is O(accumulated state), so B
 * batches cost O(B²) total bytes — at 100 TB a daily ingest batch would
 * rewrite the whole 100 TB index. This module replaces it for every
 * GROWING state (inverted lists, band indexes, postings, scored rows,
 * membership tables, pair counts, CDC snapshots): batch b physically
 * writes ONLY its own delta; the accumulated state is a multi-path scan.
 *
 * Layout under a fold's `stateDir` (chain = "lists", "idx", "post", ...):
 *
 *   {chain}_base{c}   compacted state covering batches <= c
 *                     (the seed base written from history is _base0)
 *   {chain}_d{b}      batch b's delta rows, b >= 1
 *
 * Contract:
 *  - WRITE: batch b overwrites only `{chain}_d{b}` — per-batch ingest
 *    I/O is O(batch), never O(accumulated).
 *  - READ: serving state at version n = base{c} ∪ { d{b} : c < b <= n }
 *    for the newest c <= n — one multi-path parquet scan (parquet reads
 *    a path list natively; at rest every path is bucketed/partitioned
 *    the same way, so downstream co-location is unchanged). Folds whose
 *    rows merge rather than append (pair counts, CDC snapshots) apply
 *    their merge ON READ — the merge-on-read/compact-on-schedule split
 *    every log-structured table format (Delta/Iceberg/Hudi) uses.
 *  - COMPACT: rewriting the union as `{chain}_base{n}` is the ONLY
 *    full-state write in a fold's life, and it rides a scheduled cadence
 *    (the index folds' rebuild boundary, or an explicit `compactEvery`),
 *    amortizing to O(accumulated / cadence) per batch.
 *  - REPLAY: a replayed batch b re-overwrites only d{b} (and, if it
 *    compacted, base{b} — recomputed from the SAME inputs, which vacuum
 *    retains), landing bit-identically: exactly-once is preserved
 *    without reading, let alone rewriting, anything another batch owns.
 *  - VACUUM: keeps the newest `retain` (>= 2) bases plus every delta
 *    newer than the OLDEST retained base. The previous base and its
 *    trailing deltas are the replay anchors — a retried compaction
 *    batch must find its inputs intact, the same floor
 *    [[ChangelogStream.vacuum]] enforces for the constant-size chains.
 */
object DeltaState {

  private[streaming] def basePath(stateDir: String, chain: String,
      version: Long): String = s"$stateDir/${chain}_base$version"

  private[streaming] def deltaPath(stateDir: String, chain: String,
      batch: Long): String = s"$stateDir/${chain}_d$batch"

  /** Every chain write goes through one AQE REBALANCE exchange so the
    * at-rest file count tracks DATA SIZE, not the upstream task count
    * (guide §6 output sizing): a spread CPU-dense assign otherwise writes
    * one near-empty file per core into every delta, and the serving
    * multi-path scan then pays per-file listing/footer/open costs that
    * grow with cores × batches — the small-files anti-pattern built
    * directly into the state layout. AQE sizes the exchange's output to
    * advisoryPartitionSizeInBytes, so a tiny local delta lands as one
    * file while a 100 TB deployment's batch still writes many
    * right-sized files — scale-adaptive, not a local[32] constant. */
  private def sized(df: DataFrame): DataFrame = df.hint("rebalance")

  /** Seed or compacted full state for batches <= `version`. */
  def writeBase(df: DataFrame, stateDir: String, chain: String,
      version: Long): Unit =
    sized(df).write.mode("overwrite").parquet(basePath(stateDir, chain, version))

  /** Batch `batch`'s delta — the ONLY write a non-compacting batch does. */
  def writeDelta(df: DataFrame, stateDir: String, chain: String,
      batch: Long): Unit =
    sized(df).write.mode("overwrite").parquet(deltaPath(stateDir, chain, batch))

  private def listVersions(stateDir: String, chain: String,
      kind: String): Seq[Long] = {
    val pat = (java.util.regex.Pattern.quote(s"${chain}_$kind") + "(\\d+)").r
    StateFs.listDirNames(stateDir)
      .flatMap {
        case pat(v) => Some(v.toLong)
        case _ => None
      }.sorted
  }

  /** Newest base version <= `upTo`. A replayed compaction batch passes
    * upTo = its own version - 1, so the half-written base it is about to
    * re-overwrite can never be picked as its own input. */
  def baseVersion(stateDir: String, chain: String, upTo: Long): Long = {
    val bases = listVersions(stateDir, chain, "base").filter(_ <= upTo)
    require(bases.nonEmpty,
      s"DeltaState: no $chain base <= $upTo under $stateDir — seed base0 first")
    bases.max
  }

  /** Delta versions present in (from, to]. */
  def deltaVersionsIn(stateDir: String, chain: String, from: Long,
      to: Long): Seq[Long] =
    listVersions(stateDir, chain, "d").filter(b => b > from && b <= to)

  private[streaming] def packPath(stateDir: String, chain: String,
      version: Long): String = s"$stateDir/${chain}_p$version"

  /** Pack versions present in (from, to]. */
  def packVersionsIn(stateDir: String, chain: String, from: Long,
      to: Long): Seq[Long] =
    listVersions(stateDir, chain, "p").filter(p => p > from && p <= to)

  /** The newest cover point at or below `cap`: the end version of the
    * newest pack above the base, or the base itself — deltas at or
    * below it are already represented by a pack or the base. */
  private def coverEnd(stateDir: String, chain: String, base: Long,
      cap: Long): Long =
    (base +: packVersionsIn(stateDir, chain, base, cap)).max

  /** Serving state at `version` for an APPEND chain: base ∪ packs ∪
    * trailing deltas, one multi-path parquet scan. Merge-on-read chains
    * wrap this in their merge. `baseCap` (default: `version`) bounds
    * which base may be picked — a hand-rolled compaction passes its own
    * version - 1, [[compact]]'s replay rule, so a replayed compaction
    * never reads the base it is about to re-overwrite. */
  def read(spark: SparkSession, stateDir: String, chain: String,
      version: Long, baseCap: Long = -1L): DataFrame =
    spark.read.parquet(
      readPaths(stateDir, chain, version, baseCap): _*)

  private def readPaths(stateDir: String, chain: String, version: Long,
      baseCap: Long = -1L): Seq[String] = {
    val c = baseVersion(stateDir, chain, if (baseCap >= 0) baseCap else version)
    val packs = packVersionsIn(stateDir, chain, c, version)
    val cover = (c +: packs).max
    basePath(stateDir, chain, c) +:
      (packs.map(packPath(stateDir, chain, _)) ++
        deltaVersionsIn(stateDir, chain, cover, version)
          .map(deltaPath(stateDir, chain, _)))
  }

  /**
   * The L1 TIER between deltas and the base — what bounds COMPACTION
   * write amplification for folds with no rebuild boundary: a full base
   * compaction every E batches rewrites the whole accumulated state
   * B/E times over its life (O(B²/E) bytes); packing instead merges
   * ONLY the `packEvery` trailing deltas into one `{chain}_p{v}` pack
   * (O(batch · packEvery) bytes — never the accumulated state), with
   * the full base compaction demoted to a much longer cadence (or the
   * rebuild boundary). Two levels give ≤ 3 writes per row per base
   * epoch — the size-tiered LSM argument — while the read stays one
   * multi-path scan bounded by (packs since base) + (deltas since last
   * pack) paths.
   *
   * Replay rule: the pack covers deltas in (previous cover, version],
   * resolved with caps at version - 1, so a replayed packing batch
   * re-reads the same input deltas (vacuum retains one pack's worth of
   * anchors) and re-overwrites only its own pack. `merge` is the
   * chain's merge-on-read function (identity for pure appends).
   */
  def pack(spark: SparkSession, stateDir: String, chain: String,
      version: Long, merge: DataFrame => DataFrame = identity): Unit = {
    val c = baseVersion(stateDir, chain, version - 1)
    val cover = coverEnd(stateDir, chain, c, version - 1)
    val deltas = deltaVersionsIn(stateDir, chain, cover, version)
    require(deltas.nonEmpty, s"DeltaState.pack: no deltas past $cover")
    sized(merge(spark.read.parquet(
        deltas.map(deltaPath(stateDir, chain, _)): _*)))
      .write.mode("overwrite").parquet(packPath(stateDir, chain, version))
  }

  /** True when `version` has accumulated >= `every` deltas past the
    * newest cover (pack or base) strictly below it. */
  def packDue(stateDir: String, chain: String, version: Long,
      every: Int): Boolean = {
    if (every <= 0) return false
    val c = baseVersion(stateDir, chain, version - 1)
    version - coverEnd(stateDir, chain, c, version - 1) >= every
  }

  /** Physically rewrites the serving state at `version` as base{version}
    * (with the chain's merge applied — identity for append chains). The
    * scheduled full-state write; callers vacuum afterwards. */
  def compact(spark: SparkSession, stateDir: String, chain: String,
      version: Long, merge: DataFrame => DataFrame = identity): Unit =
    // Input base is resolved at version - 1: a REPLAYED compaction batch
    // must re-read the previous anchor, not the base it wrote last time.
    writeBase(merge(spark.read.parquet(
        readPaths(stateDir, chain, version, version - 1): _*)),
      stateDir, chain, version)

  /** True when `version` has accumulated >= `every` deltas past the
    * newest base STRICTLY BELOW it — the cadence test for folds without
    * a rebuild boundary. */
  def due(stateDir: String, chain: String, version: Long,
      every: Int): Boolean =
    every > 0 && version - baseVersion(stateDir, chain, version - 1) >= every

  /** Deletes deltas of `chain` with version <= `floor` — for PAIRED
    * chains whose deltas live under a different name than their bases
    * (the CDC snapshot keeps `snap_base{c}` bases but raw `log_d{b}`
    * deltas); the caller passes the oldest retained base version of the
    * OWNING chain as the floor. Returns deleted dir names. */
  def vacuumDeltas(stateDir: String, chain: String,
      floor: Long): Seq[String] = {
    val doomed = listVersions(stateDir, chain, "d").filter(_ <= floor)
      .map(b => s"${chain}_d$b")
    doomed.foreach(StateFs.deleteDir(stateDir, _))
    doomed
  }

  /** Oldest base version that [[vacuum]] with this `retain` would keep —
    * the safe floor for [[vacuumDeltas]] on a paired chain. */
  def retainedFloor(stateDir: String, chain: String, retain: Int): Long = {
    val bases = listVersions(stateDir, chain, "base")
    bases.drop(math.max(0, bases.length - retain)).headOption.getOrElse(0L)
  }

  /** Keeps the newest `retain` bases, every pack newer than the oldest
    * retained base, and every delta newer than the SECOND-newest cover
    * point (the newest pack's inputs are the replay anchor of the batch
    * that created it); deletes the rest. Returns deleted dir names. */
  def vacuum(stateDir: String, chain: String, retain: Int = 2): Seq[String] = {
    require(retain >= 2,
      "DeltaState.vacuum: retain >= 2 (current base + its replay anchor)")
    val bases = listVersions(stateDir, chain, "base")
    val keptBases = bases.drop(math.max(0, bases.length - retain))
    val floor = keptBases.headOption.getOrElse(0L)
    val doomedBases = bases.filterNot(keptBases.contains)
      .map(v => s"${chain}_base$v")
    val packs = listVersions(stateDir, chain, "p")
    val doomedPacks = packs.filter(_ <= floor).map(v => s"${chain}_p$v")
    // Delta floor: the cover point BELOW the newest surviving pack — a
    // replayed pack-creating batch must still find its input deltas.
    val keptPacks = packs.filter(_ > floor)
    val deltaFloor =
      if (keptPacks.isEmpty) floor
      else (floor +: keptPacks.filter(_ < keptPacks.max)).max
    val doomedDeltas = listVersions(stateDir, chain, "d")
      .filter(_ <= deltaFloor).map(b => s"${chain}_d$b")
    val doomed = doomedBases ++ doomedPacks ++ doomedDeltas
    doomed.foreach(StateFs.deleteDir(stateDir, _))
    doomed
  }
}
