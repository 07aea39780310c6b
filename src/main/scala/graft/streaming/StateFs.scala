package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * The streaming folds' ONLY filesystem seam: every state-chain
 * discovery (list version directories under a `stateDir`) and vacuum
 * (recursive delete of an aged version directory) goes through the
 * Hadoop FileSystem API, never `java.io.File` — so a fold's `stateDir`
 * can be a plain local path, a `file:///` URI, or any Hadoop-supported
 * scheme (`hdfs://`, `s3a://`, ...), the same resolution
 * `spark.read.parquet` already applies to the data inside those
 * directories. Before r18 the discovery side was `java.io.File`-only,
 * which pinned the whole delta-chain fold family's state to one
 * machine's POSIX filesystem — the write path scaled, the metadata
 * path didn't deploy.
 *
 * The Hadoop `Configuration` is taken from the active SparkSession
 * (so `fs.s3a.*`/`fs.defaultFS` settings flow through); a bare
 * `new Configuration()` fallback keeps the helpers usable from
 * non-Spark contexts (tests, tools) where only `file:` paths occur.
 */
private[graft] object StateFs {

  private def conf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fs(dir: Path): FileSystem = dir.getFileSystem(conf)

  /** Names of the immediate child DIRECTORIES of `stateDir` (the
    * version dirs of every chain living under it); empty if the dir
    * does not exist yet — a fold's first batch creates it. */
  def listDirNames(stateDir: String): Seq[String] = {
    val dir = new Path(stateDir)
    val f = fs(dir)
    try f.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .toIndexedSeq
    catch { case _: java.io.FileNotFoundException => Nil }
  }

  /** Recursively deletes `stateDir/name` — the vacuum primitive. */
  def deleteDir(stateDir: String, name: String): Unit = {
    val p = new Path(stateDir, name)
    fs(p).delete(p, true)
  }
}
