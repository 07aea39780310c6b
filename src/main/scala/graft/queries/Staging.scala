package graft.queries

import org.apache.spark.sql.DataFrame

/**
 * Shared fixture staging for the streaming gates: every `stream_*` /
 * changelog gate feeds a file-source stream from slices of the test
 * tables, staged as one parquet file per micro-batch with deterministic
 * mtimes (arrival order). Staging is pure setup — it must not be paid
 * inside the timed query lambda on every invocation — so batch logs are
 * MEMOIZED: keyed by (gate, fixture dir, slice shape), built once into a
 * scratch dir and atomically moved into a stable tmpdir location.
 * Re-invocations (the bench's warmup + timed runs, repeated Verify
 * calls) resolve to the existing directory without touching Spark.
 *
 * State directories are the opposite: version-chain folds require a
 * FRESH root per run (replaying into yesterday's chain would corrupt
 * the exactly-once contract), so [[freshStateRoot]] never caches.
 */
object Staging {

  /** Builds (once) and returns the batch-log directory for `slices`:
    * file i is `<filePrefix>i%03d.parquet` with mtime epoch + i minutes.
    * Memoization key covers the gate name, fixture dir, and the slices'
    * count + schema, so a changed slicing re-stages instead of serving
    * stale bytes. Losing an atomic-move race to a concurrent builder is
    * fine — the winner's content is identical. */
  /** Size+mtime stamp of every parquet file in the fixture dir: a
    * regenerated fixture (same path, same schema, NEW content — the
    * round-7 failure mode) must miss the cache, not serve stale bytes. */
  private def dirStamp(dir: String): String = {
    val fs = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    fs.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|").hashCode.toHexString
  }

  def batchLog(name: String, dir: String, filePrefix: String,
      slices: Seq[DataFrame]): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // Key on every slice's analyzed plan, not just count + head schema:
    // two slicings with the same shape but different predicates (a moved
    // cut date, a flipped %2 split) must re-stage, and the cache dir
    // persists across JVMs so "same JVM" is no protection.
    // CANONICALIZED, not raw: the raw analyzed string embeds expression
    // IDs, which increment per plan built in a session — the same gate's
    // second invocation produced a different fingerprint, so the memo
    // NEVER hit and every bench/verify run re-staged every stream
    // fixture inside the timed lambda (confirmed r18: 13 content-identical
    // graft_log_scms_* dirs, staging jobs visible in timed runs).
    // Canonicalization normalizes exprIds and nothing else, so changed
    // predicates/literals still re-stage.
    val sliceFingerprint = slices
      .map(_.queryExecution.analyzed.canonicalized.toString.hashCode.toHexString)
      .mkString(",")
    val key = (dir, dirStamp(dir), slices.length, sliceFingerprint,
      slices.map(_.schema.simpleString).mkString(";")).hashCode.toHexString
    val target = Paths.get(sys.props("java.io.tmpdir"), s"graft_log_${name}_$key")
    if (Files.exists(target)) return target.toString
    val stageRoot = Files.createTempDirectory(
      Paths.get(sys.props("java.io.tmpdir")), s"graft_log_${name}_stage")
    try {
      val logDir = stageRoot.resolve("log")
      Files.createDirectories(logDir)
      slices.zipWithIndex.foreach { case (slice, i) =>
        val stage = stageRoot.resolve(s"stage$i").toString
        slice.coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet")).head.toPath
        val dst = logDir.resolve(f"$filePrefix$i%03d.parquet")
        Files.copy(part, dst)
        Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(
            1000000000000L + i * 60000L))
      }
      try Files.move(logDir, target, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException => ()
        case _: java.nio.file.DirectoryNotEmptyException => ()
      }
    } finally deleteRecursively(stageRoot)
    target.toString
  }

  /** A fresh, never-cached root for a fold's versioned state chain. */
  def freshStateRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Builds (once) and returns a MATERIALIZED parquet directory for
    * `df` — the at-rest index-layout staging the serving gates need:
    * a probe-only gate must time the PROBE against a stored layout, not
    * re-pay the build every invocation (which conflates build with
    * serve in every scale fit — the r17 sim_ivfsq8_filtered_topk
    * lesson). Memoization mirrors [[batchLog]]: keyed on the fixture
    * dir's content stamp + the plan fingerprint, built into a scratch
    * dir and atomically moved, so re-invocations (bench warmup + timed
    * runs) resolve without touching Spark, while a regenerated fixture
    * or a changed build plan re-stages. */
  def materialized(name: String, dir: String, version: String)(
      build: => DataFrame): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // `build` must stay UNEVALUATED on a hit (constructing the plan may
    // itself train a quantizer), so the key cannot fingerprint the plan:
    // `version` is the caller's recipe stamp — bump it when the build
    // logic changes, or yesterday's tmpdir serves yesterday's layout.
    val key = (dir, dirStamp(dir), version).hashCode.toHexString
    val target = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_mat_${name}_$key")
    if (Files.exists(target)) return target.toString
    val stageRoot = Files.createTempDirectory(
      Paths.get(sys.props("java.io.tmpdir")), s"graft_mat_${name}_stage")
    try {
      val out = stageRoot.resolve("out").toString
      build.write.mode("overwrite").parquet(out)
      try Files.move(Paths.get(out), target, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException => ()
        case _: java.nio.file.DirectoryNotEmptyException => ()
      }
    } finally deleteRecursively(stageRoot)
    target.toString
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val st = Files.list(p)
        try st.forEach(c => deleteRecursively(c)) finally st.close()
      }
      Files.deleteIfExists(p)
    }
  }
}
