package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{Decimal, StringType}

import graft.functions.{RandgenFunctions, TextFunctions}

/**
 * Cluster install path (SURVEY.md §3 EP1): makes the whole `randgen_*`
 * family available in every session via
 * `--conf spark.sql.extensions=graft.GraftExtensions`, the idiomatic way
 * to ship a function library to a cluster where user code never calls
 * `registerAll` explicitly. Functions land in the session registry exactly
 * as the reference's `add_udfs(&mut SessionContext)` does
 * (`/root/reference/src/lib.rs:8-10`).
 *
 * Also installs the [[graft.plans.RangeJoinRewrite]] optimizer rule
 * (inactive until `spark.graft.rangeJoin.binWidth` is set), and the
 * pipeline TABLE functions ([[GraftExtensions.tableFunctions]]) that put
 * the two most user-facing layer-C pipelines on the pure-SQL surface:
 *
 *   SELECT * FROM graft_minhash_neardup('docs', 'doc_id', 'text', 0.5)
 *   SELECT * FROM graft_lsh_neardup_auto('emb', 'vec_id', 'embedding', 0.45)
 *
 * Each resolves its first argument against the session catalog (temp view
 * or table) and expands to the exact logical plan the Scala API builds —
 * SQL and Scala results are identical row-for-row (PipelineTvfSpec pins
 * it). The auto-LSH variant runs its corpus count() during resolution
 * (the same metadata-cheap job the Scala call runs up front).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    (RandgenFunctions.all ++ TextFunctions.all).foreach { case (name, builder) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    GraftExtensions.tableFunctions.foreach { case (name, builder) =>
      extensions.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    extensions.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    extensions.injectPlannerStrategy(_ => graft.plans.GraftTopKStrategy)
  }
}

object GraftExtensions {

  private def strArg(fn: String, what: String, e: Expression): String =
    e match {
      case Literal(v, StringType) if v != null => v.toString
      case _ => throw new IllegalArgumentException(
        s"$fn: $what must be a string literal, got $e")
    }

  private def lngArg(fn: String, what: String, e: Expression): Long =
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $e")
    else e.eval() match {
      case n: java.lang.Number
          if n.doubleValue() == math.floor(n.doubleValue()) =>
        n.longValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be an integer, got $other")
    }

  /** [[lngArg]] bounded to Int — TVF args that feed Int parameters must
    * reject out-of-range values, not wrap via .toInt. */
  private def intArg(fn: String, what: String, e: Expression): Int = {
    val v = lngArg(fn, what, e)
    require(v >= Int.MinValue && v <= Int.MaxValue,
      s"$fn: $what out of Int range: $v")
    v.toInt
  }

  private def dblArg(fn: String, what: String, e: Expression): Double =
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: $what must be a numeric literal, got $e")
    else e.eval() match {
      case d: Decimal => d.toDouble
      case n: java.lang.Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be numeric, got $other")
    }

  /** SQL table functions wrapping whole pipelines (name -> plan builder).
    * The builder runs at ANALYSIS time in the active session: it reads
    * the named relation from the catalog and returns the Scala
    * operator's logical plan verbatim, so every scale property
    * (bucketing, hot-bucket split, broadcast shapes) carries over to the
    * SQL surface unchanged. */
  /** LRU-bounded memo of TVF-trained Markov models. Key = (table, col,
    * file-set fingerprint): `inputFiles` enumerates every backing file
    * (driver-side metadata, no scan), and the on-disk snapshot hash
    * folds each path's name/size/mtime — data replaced under the same
    * table name changes the fingerprint and re-trains. Bounded at 4
    * models; each model is a capped driver sketch (maxVocab × maxFanout),
    * so the cache's worst case is a few MB. */
  private val markovCache =
    new java.util.LinkedHashMap[String, graft.operators.TextGen.MarkovModel](
        8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, graft.operators.TextGen.MarkovModel])
          : Boolean = size() > 4
    }

  /** Training events since JVM start — a test hook: MarkovCacheSpec
    * asserts hit-on-unchanged (count stays flat across re-resolutions)
    * and retrain-on-replace (count bumps after the backing files
    * change). Incremented only on the TVF path, never by direct
    * `TextGen.trainBigrams` calls. */
  private[graft] val markovTrainCount =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private[graft] def markovCacheReset(): Unit =
    markovCache.synchronized { markovCache.clear() }

  private def markovModelFor(spark: SparkSession, tableName: String,
      textCol: String, docs: org.apache.spark.sql.DataFrame)
      : graft.operators.TextGen.MarkovModel = {
    val files = docs.inputFiles
    if (files.isEmpty) {
      // No file-backed fingerprint (temp view over generated data, etc.)
      // — no safe staleness signal, so train fresh every resolution.
      markovTrainCount.incrementAndGet()
      return graft.operators.TextGen.trainBigrams(docs, textCol)
    }
    // Full cryptographic digest of the file-set snapshot (count + each
    // path@size:mtime). A 32-bit String.hashCode here would make a
    // collision — or a same-name/same-size overwrite within mtime
    // granularity colliding with a stale entry — serve an outdated
    // model silently; SHA-256 of the joined string leaves only the
    // mtime-granularity window, which is inherent to metadata-only
    // fingerprints and documented on the TVF.
    val snapshot = files.length.toString + "|" + files.sorted.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = try {
        val s = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getFileStatus(p)
        s"${s.getLen}:${s.getModificationTime}"
      } catch { case _: java.io.IOException => "?" }
      s"$f@$st"
    }.mkString("|")
    val fp = java.security.MessageDigest.getInstance("SHA-256")
      .digest(snapshot.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val key = s"$tableName#$textCol#$fp"
    markovCache.synchronized {
      val hit = markovCache.get(key)
      if (hit != null) return hit
    }
    markovTrainCount.incrementAndGet()
    val model = graft.operators.TextGen.trainBigrams(docs, textCol)
    markovCache.synchronized { markovCache.put(key, model) }
    model
  }

  val tableFunctions: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "graft_minhash_neardup" -> { (args: Seq[Expression]) =>
      val fn = "graft_minhash_neardup"
      require(args.length == 4,
        s"$fn expects (table, idCol, textCol, threshold), got ${args.length} args")
      val spark = SparkSession.active
      graft.operators.Dedup.minhashNearDuplicates(
          spark.table(strArg(fn, "table", args(0))),
          strArg(fn, "idCol", args(1)), strArg(fn, "textCol", args(2)),
          dblArg(fn, "threshold", args(3)))
        .queryExecution.logical
    },
    "graft_lsh_neardup_auto" -> { (args: Seq[Expression]) =>
      val fn = "graft_lsh_neardup_auto"
      require(args.length == 4,
        s"$fn expects (table, idCol, vecCol, threshold), got ${args.length} args")
      val spark = SparkSession.active
      graft.operators.Similarity.lshNearDuplicatesAuto(
          spark.table(strArg(fn, "table", args(0))),
          strArg(fn, "idCol", args(1)), strArg(fn, "vecCol", args(2)),
          dblArg(fn, "threshold", args(3)))
        .queryExecution.logical
    },
    // SELECT * FROM graft_markov_text('documents', 'text', 2000, 97, 30)
    // Trains the bigram model during resolution (bounded driver sketch)
    // and expands to the seeded-walk generation plan: (gen_id, text).
    // Training is corpus-linear (explode + two keyed counts), so unlike
    // the auto-LSH precedent's metadata-cheap count() a per-resolution
    // retrain is real money — EXPLAIN-then-run would train twice.
    // Models memoize keyed by (table, textCol, CURRENT FILE SET): the
    // fingerprint covers path/size/mtime of every backing file, so
    // replacing the data re-trains while a re-resolution of unchanged
    // data hits the cache. Non-file-backed relations (in-memory views,
    // generators) have no stable fingerprint and retrain every time —
    // train once via the Scala API (trainBigrams + generate) there.
    "graft_markov_text" -> { (args: Seq[Expression]) =>
      val fn = "graft_markov_text"
      require(args.length == 5,
        s"$fn expects (table, textCol, rows, seed, len), got ${args.length} args")
      val spark = SparkSession.active
      val tableName = strArg(fn, "table", args(0))
      val textCol = strArg(fn, "textCol", args(1))
      val docs = spark.table(tableName)
      val model = markovModelFor(spark, tableName, textCol, docs)
      graft.operators.TextGen.generate(spark, model,
          lngArg(fn, "rows", args(2)), lngArg(fn, "seed", args(3)),
          intArg(fn, "len", args(4)))
        .queryExecution.logical
    },
    // SELECT * FROM graft_copula_pair(100000, 7, 0.6) — (a, b) standard
    // normals at Pearson correlation r, the SQL door into
    // TableGen.correlated.
    "graft_copula_pair" -> { (args: Seq[Expression]) =>
      val fn = "graft_copula_pair"
      require(args.length == 3,
        s"$fn expects (rows, seed, r), got ${args.length} args")
      val spark = SparkSession.active
      val r = dblArg(fn, "r", args(2))
      graft.TableGen.correlated(spark,
          lngArg(fn, "rows", args(0)), lngArg(fn, "seed", args(1)),
          Seq(Seq(1.0, r), Seq(r, 1.0)),
          "a" -> graft.Gen.Float64Normal(0.0, 1.0),
          "b" -> graft.Gen.Float64Normal(0.0, 1.0))
        .queryExecution.logical
    },
    // SELECT * FROM graft_fuzz_battery(42, 24) — run the differential
    // battery against the catalog's TPC-H views: (qid, n_rows, digest).
    "graft_fuzz_battery" -> { (args: Seq[Expression]) =>
      val fn = "graft_fuzz_battery"
      require(args.length == 2,
        s"$fn expects (seed, nQueries), got ${args.length} args")
      val spark = SparkSession.active
      spark.sql(graft.fuzz.QueryFuzz.differentialSql(
          graft.fuzz.QueryFuzz.FuzzConfig(lngArg(fn, "seed", args(0)),
            intArg(fn, "nQueries", args(1)))))
        .queryExecution.logical
    })
}
