package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (SURVEY.md §2.5):
 * brute-force cosine top-k as the exactness baseline, and a deterministic
 * signed-random-projection (SRP) LSH index as the scale path.
 *
 * Scale design:
 *  - Brute force broadcasts the (small) query set against the corpus —
 *    a map-side O(n*q) scan with NO shuffle of the corpus; the only
 *    shuffle is the per-query top-k window over the scored rows. Right
 *    whenever q is bounded (ad-hoc search, eval sets).
 *  - SRP-LSH: each vector gets `numTables` integer bucket codes (sign bits
 *    of projections onto Rademacher +-1 hyperplanes). Candidates come from
 *    an equi-join on (table, code) — linear shuffle, no cross join — then
 *    exact cosine re-ranks candidates. More tables => higher recall;
 *    fewer planes => bigger buckets. Works unchanged at corpus scale.
 *
 * Hyperplanes are derived from md5(seed:table:plane:dim) at PLAN time, so
 * the whole index is reproducible with no RNG state, stable under retry,
 * and replayable by the DuckDB oracle (the +-1 plane literals embed into
 * the plan on both engines).
 */
object Similarity {

  /** Planes per table for a target expected bucket occupancy: a table
    * with p planes has 2^p buckets, so p = ceil(log2(n / targetOccupancy))
    * keeps mean occupancy near the target as the corpus grows — the
    * candidate join stays linear-ish instead of going quadratic inside
    * ever-fuller buckets (a fixed plane count's failure mode at 100x the
    * fixture). Raising planes lowers per-table recall for a given cosine,
    * so pair growth here with more tables (SURVEY §8.1 documents the
    * fixture config's dial positions). Clamped to [1, 30]. */
  def planesForOccupancy(n: Long, targetOccupancy: Long = 64L): Int = {
    require(n > 0 && targetOccupancy > 0, "planesForOccupancy: n, target > 0")
    val p = math.ceil(
      math.log(n.toDouble / targetOccupancy) / math.log(2.0)).toInt
    math.min(30, math.max(1, p))
  }

  /** Tables needed so P(some table collides) >= recall for a pair AT the
    * cosine threshold: per-plane agreement for SRP is p = 1 - acos(t)/pi,
    * a table of b planes collides with p^b, so T = ceil(ln(1-recall) /
    * ln(1-p^b)) (epsilon-guarded so exact integer ratios don't round
    * up). More planes (smaller buckets) cost more tables — the standard
    * LSH trade, n^rho overall. */
  def tablesForRecall(threshold: Double, planes: Int,
      recall: Double = 0.92): Int = {
    require(threshold > -1.0 && threshold < 1.0,
      s"tablesForRecall: threshold in (-1, 1), got $threshold")
    require(planes >= 1 && recall > 0 && recall < 1,
      "tablesForRecall: planes >= 1, recall in (0, 1)")
    val p = 1.0 - math.acos(threshold) / math.Pi
    val perTable = math.pow(p, planes)
    math.max(1, math.ceil(
      math.log(1.0 - recall) / math.log(1.0 - perTable) - 1e-9).toInt)
  }

  /** Default per-bucket occupancy cap for [[lshNearDuplicates]]'s
    * in-memory bucket groups: 65536 rows x (dim x 4 B vector + ~40 B row
    * overhead) ≈ 20 MB per in-flight group at dim=64 — comfortable
    * against a multi-GB executor heap even with one group per core. */
  val MaxBucketDefault: Long = 65536L

  /** Largest plane count whose per-table collision probability at the
    * cosine threshold still reaches `recall` within `maxTables` tables:
    * perTable must be >= 1 - (1-recall)^(1/maxTables), and perTable =
    * q^planes with q = 1 - acos(t)/pi, so planes = floor(ln(needed) /
    * ln(q)) (epsilon-guarded for exact ratios). The FEASIBILITY bound
    * the tables budget imposes — more planes than this and no affordable
    * table count recovers the recall. Clamped to [1, 30]. */
  def planesForTables(threshold: Double, recall: Double,
      maxTables: Int): Int = {
    require(threshold > -1.0 && threshold < 1.0 && recall > 0 && recall < 1,
      "planesForTables: threshold in (-1,1), recall in (0,1)")
    require(maxTables >= 1, s"planesForTables: maxTables >= 1, got $maxTables")
    val q = 1.0 - math.acos(threshold) / math.Pi
    val perTableNeeded = 1.0 - math.pow(1.0 - recall, 1.0 / maxTables)
    val p = math.floor(math.log(perTableNeeded) / math.log(q) + 1e-9).toInt
    math.min(30, math.max(1, p))
  }

  /** Joint (planes, tables) solve under an explicit TABLES BUDGET:
    * planes = min(occupancy-driven, tables-budget-feasible), tables =
    * min(recall-driven, maxTables). Unbudgeted, the recall formula's
    * table count grows like n^rho once planes track log2(n) — at n=1e9 /
    * threshold 0.45 that is ~24 planes and ~74k tables, i.e. a
    * multi-hundred-MB plane literal shipped per task and 74k exploded
    * code rows per vector: a cliff, not a dial. The budget instead
    * SHRINKS planes until recall is affordable (n=1e9 resolves to 9
    * planes x ~120 tables — a 276 KB literal), trading bucket occupancy
    * (now above target, so per-bucket pair work grows; [[lshNearDuplicates]]'s
    * maxBucket split bounds the MEMORY side) for a bounded index size.
    * Small corpora are unaffected: the occupancy term binds and resolves
    * exactly as before. */
  def lshAutoConfig(n: Long, threshold: Double, targetOccupancy: Long = 64L,
      recall: Double = 0.92, maxTables: Int = 128): (Int, Int) = {
    val p = math.min(planesForOccupancy(n, targetOccupancy),
      planesForTables(threshold, recall, maxTables))
    (p, math.min(tablesForRecall(threshold, p, recall), maxTables))
  }

  /** [[lshNearDuplicates]] with the scale dial APPLIED: planes from
    * [[planesForOccupancy]] (bucket count grows with the corpus, so
    * expected occupancy — and with it per-bucket pair work and group
    * memory — stays flat) and tables from [[tablesForRecall]] (recall
    * held as planes rise), both under [[lshAutoConfig]]'s `maxTables`
    * budget so the index size is a dial too. One count() of the input (a
    * metadata-cheap aggregate, same class as the k-means training
    * collects) picks the config; everything downstream is
    * [[lshNearDuplicates]] verbatim. Total candidate work scales
    * ~n^(1+rho) instead of n^2/2^planes — the difference between a dial
    * and a cliff at 100x the fixture. */
  def lshNearDuplicatesAuto(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, targetOccupancy: Long = 64L, recall: Double = 0.92,
      seed: Int = 42, dim: Int = 64, maxTables: Int = 128,
      maxBucket: Long = MaxBucketDefault): DataFrame = {
    val n = emb.count()
    val (numPlanes, numTables) =
      lshAutoConfig(n, threshold, targetOccupancy, recall, maxTables)
    // Budget-saturation diagnostic (measured r12, SCALE_overrides_r12):
    // when `maxTables` caps planes below the occupancy target, bucket
    // occupancy — and with it per-bucket pair work — grows with n
    // instead of staying flat (sf3→sf10 exponent 1.27 under the default
    // 128-table budget vs 0.92-0.95 while the dial still tracked n).
    // Memory stays bounded either way (hot-bucket salting); this warns
    // that TIME has left the occupancy-flat regime and names the dial.
    if (numPlanes < planesForOccupancy(n, targetOccupancy)) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"lshNearDuplicatesAuto: maxTables=$maxTables budget caps planes " +
          s"at $numPlanes (occupancy target wants " +
          s"${planesForOccupancy(n, targetOccupancy)} at n=$n) - expected " +
          s"bucket occupancy ~${n >> numPlanes} exceeds target " +
          s"$targetOccupancy, so candidate-pair work grows super-linearly " +
          "from here; raise maxTables (higher index cost) or the " +
          "threshold to restore occupancy-flat scaling")
    }
    lshNearDuplicates(emb, idCol, vecCol, threshold, numTables, numPlanes,
      seed, dim, maxBucket)
  }

  /** Deterministic Rademacher hyperplane: +-1.0 per dimension. */
  def planes(numTables: Int, numPlanes: Int, dim: Int, seed: Int)
      : Array[Array[Array[Double]]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(numTables, numPlanes, dim) { (t, p, j) =>
      val h = md.digest(s"$seed:$t:$p:$j".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1.0 else -1.0
    }
  }

  /** Integer SRP bucket code of `vec` for one table's plane set — the
    * REFERENCE form the SrpCodes loop expression is spec-held
    * bit-identical to (SimilaritySpec); production call sites use
    * SrpCodes, whose single loop survives table×plane configs that would
    * blow the 64 KB codegen method limit unrolled. Each projection is the
    * codegen'd FloatVecDot against the plane as a FLOAT literal array —
    * +-1.0 is exact in float, each term promotes to the identical double
    * product, and the fold order matches. */
  def srpCode(vec: Column, tablePlanes: Array[Array[Double]]): Column =
    tablePlanes.zipWithIndex.map { case (plane, p) =>
      val proj = VectorOps.dot(vec, typedLit(plane.map(_.toFloat).toSeq))
      when(proj > 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** All tables' codes as ONE array column via the SrpCodes loop-codegen
    * expression — the declarative per-table srpCode form inlines
    * numTables x numPlanes dots and overflows the 64 KB codegen method
    * limit once the occupancy/recall dial raises the config (123 x 9 at
    * sf1), dropping the stage to interpreted evaluation (measured 10x).
    * The expression also carries the dim fail-fast (zip_with would
    * silently null-pad a mismatched vector, collapsing codes to 0). */
  private def srpCodesCol(vecCol: String, numTables: Int, numPlanes: Int,
      seed: Int, dim: Int): Column = {
    val flat = planes(numTables, numPlanes, dim, seed)
      .flatten.flatten.map(_.toFloat)
    org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
      graft.functions.SrpCodes(
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(col(vecCol)),
        numTables, numPlanes, dim, flat))
  }

  /** (id, table, code) bucket assignments for every vector. All tables'
    * codes are computed in ONE scan (array + posexplode) — a per-table
    * union would rescan the source numTables times, which at corpus scale
    * multiplies the dominant IO cost. */
  def lshCodes(emb: DataFrame, idCol: String, vecCol: String,
      numTables: Int = 8, numPlanes: Int = 3, seed: Int = 42,
      dim: Int = 64): DataFrame =
    emb.select(col(idCol).as("vec_id"),
        posexplode(srpCodesCol(vecCol, numTables, numPlanes, seed, dim)))
      .select(col("vec_id"), col("pos").cast("long").as("tbl"),
        col("col").as("code"))


  /**
   * Johnson–Lindenstrauss random projection: reduces `dim`-d vectors to
   * `outDim`-d via deterministic Rademacher (+-1) planes scaled by
   * 1/sqrt(outDim) — the standard JL map, which preserves pairwise
   * Euclidean distances in expectation (E||y_a-y_b||^2 = ||x_a-x_b||^2)
   * with distortion O(1/sqrt(outDim)). The cheap first stage before ANN
   * at corpus scale: a 4x dimension cut is a 4x cut in every downstream
   * dot product, shuffle byte, and cache miss.
   *
   * One narrow codegen projection per row (planes are plan literals from
   * the same md5 scheme as [[planes]] — no RNG state, engine-replayable);
   * output is exploded (vec_id, j, y) rows, y rounded to 6 dp.
   */
  def randomProject(vecs: DataFrame, idCol: String, vecCol: String,
      outDim: Int, seed: Int = 42, dim: Int = 64): DataFrame = {
    require(outDim > 0, "randomProject: outDim > 0")
    val ps = planes(1, outDim, dim, seed)(0)
    val checked = when(size(col(vecCol)) === dim, col(vecCol))
      .otherwise(raise_error(concat(
        lit(s"randomProject: expected vector dim=$dim, got "),
        size(col(vecCol)).cast("string"))))
    val scale = lit(math.sqrt(outDim.toDouble))
    vecs.select(col(idCol).as("vec_id"),
        posexplode(array(ps.map(p =>
          round(VectorOps.dot(checked, typedLit(p.map(_.toFloat).toSeq)) /
            scale, 6)): _*)))
      .select(col("vec_id"), col("pos").cast("long").as("j"),
        col("col").as("y"))
  }

  /** Shared ranking tail: trims the scored candidate stream to k rows per
    * query with the heap-bounded [[TopK]] physical operator (map-side trim
    * BEFORE the exchange — the window form would shuffle and fully sort
    * every scored row), then ranks the tiny queries x k result. Total
    * order (score desc, id) keeps the output identical to the window
    * form, row for row. */
  private def rankTopKPerQuery(scored: DataFrame, k: Int,
      scoreCol: String): DataFrame = {
    val trimmed = TopK.perKey(scored, Seq(col("qid")),
      Seq(col(scoreCol).desc, col("id")), k)
    val w = Window.partitionBy("qid").orderBy(col(scoreCol).desc, col("id"))
    trimmed.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("qid"), col("id"), col("rank"),
        round(col(scoreCol), 6).as(scoreCol))
  }

  /**
   * Hard-negative mining for contrastive training: per query, the k
   * HIGHEST-cosine corpus vectors with a DIFFERENT label — the negatives
   * that sit closest to the decision boundary, which is what makes a
   * contrastive batch informative. Corpus (id, vec, label) streams;
   * queries (qid, qvec, qlabel) broadcast; the label filter rides the
   * scored scan, then the heap top-k trims map-side like every other
   * ranking tail. Swap the crossJoin for an LSH/IVF candidate join at
   * corpus scale — the filter + rank tail is unchanged.
   */
  def hardNegativesTopK(corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val c = corpus.withColumn("nrm", VectorOps.norm(col("vec")))
    val q = queries.withColumn("qnrm", VectorOps.norm(col("qvec")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("label") =!= col("qlabel"))
      .withColumn("score",
        VectorOps.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
    rankTopKPerQuery(scored, k, "score")
  }

  /**
   * [[hardNegativesTopK]]'s corpus-scale twin: SRP-LSH bucket equi-join
   * for candidates (the [[lshTopK]] shape) instead of the all-pairs
   * crossJoin, then the identical label-inequality filter + exact cosine
   * + heap top-k tail — so at equal table/plane settings its recall vs
   * the brute baseline matches [[lshTopK]]'s vs [[bruteForceTopK]]
   * (SimilaritySpec holds it to the same bar).
   *
   * Scale shape: the corpus is touched by ONE code projection (narrow,
   * codegen) + one equi-shuffle on (tbl, code) against the tiny query
   * code table; candidates are the only rows that reach the scorer, and
   * the heap trims to k per query map-side. More tables / fewer planes
   * dial recall against candidate volume, exactly like [[lshTopK]].
   */
  def hardNegativesTopKLsh(corpus: DataFrame, queries: DataFrame, k: Int,
      numTables: Int = 8, numPlanes: Int = 3, seed: Int = 42,
      dim: Int = 64): DataFrame = {
    val qCodes = lshCodes(queries.select(col("qid").as("vec_id"), col("qvec")),
      "vec_id", "qvec", numTables, numPlanes, seed, dim)
      .select(col("vec_id").as("qid"), col("tbl"), col("code"))
    val cCodes = lshCodes(corpus.select(col("id").as("vec_id"), col("vec")),
      "vec_id", "vec", numTables, numPlanes, seed, dim)
      .select(col("vec_id").as("id"), col("tbl"), col("code"))
    val cand = cCodes.join(broadcast(qCodes), Seq("tbl", "code"))
      .select("qid", "id").distinct()
    val scored = cand
      .join(broadcast(queries.withColumn("qnrm", VectorOps.norm(col("qvec")))),
        "qid")
      .join(corpus.withColumn("nrm", VectorOps.norm(col("vec"))), "id")
      .where(col("label") =!= col("qlabel"))
      .withColumn("score",
        VectorOps.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
    rankTopKPerQuery(scored, k, "score")
  }

  /** Exact top-k neighbors per query by brute-force cosine.
    * `queries` (qid, qvec) is broadcast; corpus (id, vec) streams. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // Norms once per side; the per-pair work is one codegen'd dot product.
    val c = corpus.withColumn("nrm", VectorOps.norm(col("vec")))
    val q = queries.withColumn("qnrm", VectorOps.norm(col("qvec")))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("score",
        VectorOps.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
    rankTopKPerQuery(scored, k, "score")
  }

  /**
   * SQ8 (symmetric int8 scalar-quantized) top-k: the serving path where
   * the corpus rides as 1-byte-per-dim codes and the raw floats are only
   * touched by a final exact re-rank of a `refine`-sized shortlist.
   *
   * Scoring: per-vector symmetric quantization q_i = floor(x_i·127/max|x|
   * + 0.5) ([[VectorOps.quantizeInt8]] — the established engine-replayable
   * contract), so dot(x, y) ≈ (maxx/127)·(maxy/127)·Σ qx_i·qy_i. The Σ is
   * EXACT BIGINT arithmetic ([[VectorOps.dotInt]] — order-independent, no
   * IEEE contract at all); the two scalar factors multiply in a fixed
   * order ((cmax/127)·(qmax/127), then ·dot), so the estimate replays
   * bit-for-bit on the oracle. Shortlist rank: (est DESC, id) — the
   * IvfPqRefine convention; final rank: exact cosine over shortlist rows
   * only.
   *
   * Scale shape: corpus codes are computed in one narrow codegen scan
   * (and in a real deployment live in their own 4×-smaller column — at
   * int8 the scan is dim bytes/row vs dim·4); queries broadcast; the
   * integer-dot hot loop is one codegen multiply-add per element with no
   * division or sqrt; only `refine` rows per query ever touch the float
   * vectors again. Composes with the IVF lists exactly like PQ (store
   * codes in the list payload) when a coarse index is wanted too.
   */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      refine: Int): DataFrame = {
    require(k > 0 && refine >= k,
      s"sq8TopK: need refine >= k > 0, got k=$k refine=$refine")
    val c = corpus.select(col("id"), col("vec"),
      VectorOps.quantizeInt8(col("vec")).as("ccode"),
      VectorOps.maxAbs(col("vec")).as("cmax"))
    val q = queries.select(col("qid"), col("qvec"),
      VectorOps.quantizeInt8(col("qvec")).as("qcode"),
      VectorOps.maxAbs(col("qvec")).as("qmax"))
    val est = (col("cmax") / lit(127.0)) * (col("qmax") / lit(127.0)) *
      VectorOps.dotInt(col("ccode"), col("qcode")).cast("double")
    val shortlist = TopK.perKey(
      c.crossJoin(broadcast(q)).withColumn("est", est)
        .select(col("qid"), col("id"), col("est")),
      Seq(col("qid")), Seq(col("est").desc, col("id")), refine)
      .select("qid", "id")
    val scored = shortlist
      .join(broadcast(queries.withColumn("qnrm", VectorOps.norm(col("qvec")))),
        "qid")
      .join(corpus.withColumn("nrm", VectorOps.norm(col("vec"))), "id")
      .withColumn("score",
        VectorOps.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
    rankTopKPerQuery(scored, k, "score")
  }

  /**
   * Matryoshka (prefix-dimension) top-k: coarse-rank on the FIRST `pdim`
   * dimensions' cosine, exact full-dim re-rank of the top-`refine`
   * shortlist. The serving pattern for matryoshka-trained embeddings,
   * where prefixes are themselves valid low-dim embeddings; at rest the
   * prefix lives as its own narrow column, so the coarse scan reads
   * dim/pdim less data — the IO cut is the whole point at 100 TB.
   *
   * Arithmetic contract: the prefix dot is FloatVecDot's sequential
   * double fold truncated at `pdim` ([[VectorOps.dotPrefix]]), so the
   * DuckDB replay is duckDot over list_slice; shortlist rank breaks ties
   * (coarse DESC, id); final rank is exact full cosine.
   */
  def matryoshkaTopK(corpus: DataFrame, queries: DataFrame, pdim: Int,
      k: Int, refine: Int): DataFrame = {
    require(pdim > 0 && k > 0 && refine >= k,
      s"matryoshkaTopK: need pdim > 0, refine >= k > 0, " +
        s"got pdim=$pdim k=$k refine=$refine")
    val coarse = corpus.select(col("id"), col("vec"))
      .crossJoin(broadcast(queries.select(col("qid"), col("qvec"))))
      .withColumn("est", VectorOps.cosinePrefix(col("qvec"), col("vec"), pdim))
      .select(col("qid"), col("id"), col("est"))
    val shortlist = TopK.perKey(coarse, Seq(col("qid")),
        Seq(col("est").desc, col("id")), refine)
      .select("qid", "id")
    val scored = shortlist
      .join(broadcast(queries.withColumn("qnrm", VectorOps.norm(col("qvec")))),
        "qid")
      .join(corpus.withColumn("nrm", VectorOps.norm(col("vec"))), "id")
      .withColumn("score",
        VectorOps.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
    rankTopKPerQuery(scored, k, "score")
  }

  /** Corpus-scale embedding near-duplicate pairs: SRP-LSH bucket
    * candidates, exact cosine >= threshold refilter. The scale path that
    * replaces Dedup.embeddingNearDuplicates' O(n^2) all-pairs baseline;
    * more tables/fewer planes raise recall.
    *
    * Dataflow: ONE shuffle of the (vec_id, vec, norm, tbl, code) rows
    * keyed by bucket, then pairs are enumerated INSIDE each bucket group
    * with a primitive-array loop emitting only rows that pass the
    * threshold. The relational alternatives both die at scale, and the
    * r9 sf1 evidence run measured it: distinct-candidates-then-rejoin
    * shuffles two full vectors per CANDIDATE (x124 for 10x data, ~200 GB
    * of vector movement); a self-equi-join with the cosine in the join
    * filter still MATERIALIZES two copied vectors into every joined row
    * before filtering (~1 us/candidate of UnsafeRow copying — 240 s at
    * sf1). The bucket-local loop touches each candidate for exactly one
    * fused dot product (4 flops/dim), no row materialization — the same
    * reason decode runs in mapPartitions, this runs in flatMapGroups.
    *
    * Contracts: dot/norm arithmetic mirrors FloatVecDot bit-for-bit
    * (norms are computed by the codegen expression BEFORE the shuffle and
    * ride with the row), so results are engine-replayable and identical
    * to the join form, pair for pair. A bucket group must fit in executor
    * memory: expected occupancy is n/2^planes — hold it flat as the
    * corpus grows via [[planesForOccupancy]] (with more tables to buy
    * per-table recall back), which also keeps total candidate work
    * sub-quadratic (~n^1.6 at this threshold). `idCol` must be
    * BIGINT-castable (the typed group encoder is Long-keyed); string ids
    * should map through a surrogate — the id is the ONLY per-row payload
    * this operator moves besides the vector, so keeping it 8 bytes is
    * also the right scale choice.
    *
    * Hot-bucket guard: [[planesForOccupancy]] holds EXPECTED occupancy
    * flat but not adversarial skew — a pre-cleaning web corpus has
    * exact-duplicate floods whose vectors share every bucket in every
    * table (and all-zero vectors always code to 0), so one group could
    * otherwise buffer an unbounded `it.toArray`. A cheap census pass
    * (codes only — 16-byte rows, map-side partial count) finds buckets
    * over `maxBucket`; their rows are salted by id-hash into
    * ceil(n/maxBucket) sub-buckets and every pair is still enumerated
    * exactly once via triangle cells: a row with salt s joins cell
    * (min(s,t), max(s,t)) for every t, cell (i,i) pairs within salt i,
    * cell (i,j) pairs only across salts — so group memory is bounded by
    * ~2x maxBucket while the output stays identical pair-for-pair
    * (SimilaritySpec plants a flood and asserts it). Pair WORK for a
    * flood is still quadratic — that is the semantics (every pair IS a
    * duplicate); the guard bounds memory, not output. A sub-bucket that
    * still exceeds 4x maxBucket fails fast (duplicate ids all hash to
    * one salt — dedupe ids first or raise maxBucket). */
  def lshNearDuplicates(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numTables: Int = 8, numPlanes: Int = 3,
      seed: Int = 42, dim: Int = 64,
      maxBucket: Long = MaxBucketDefault): DataFrame = {
    require(maxBucket > 1, s"lshNearDuplicates: maxBucket > 1, got $maxBucket")
    import emb.sparkSession.implicits._
    val codeCol = srpCodesCol(vecCol, numTables, numPlanes, seed, dim)
    // Census: re-derives the (narrow, codegen) code projection so only
    // (tbl, code) pairs shuffle; the over-cap result set is tiny (one row
    // per FLOOD bucket, not per bucket) and broadcasts back.
    val hot = emb.select(posexplode(codeCol))
      .select(col("pos").cast("long").as("tbl"), col("col").as("code"))
      .groupBy("tbl", "code").agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxBucket)
      .select(col("tbl"), col("code"),
        ceil(col("__n").cast("double") / maxBucket).cast("long").as("__nsub"))
    val salted = emb.select(col(idCol).as("vec_id"),
        col(vecCol).as("v"), VectorOps.norm(col(vecCol)).as("nrm"),
        posexplode(codeCol))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("pos").cast("long").as("tbl"), col("col").as("code"))
      .join(broadcast(hot), Seq("tbl", "code"), "left")
      .withColumn("__nsub", coalesce(col("__nsub"), lit(1L)))
      .withColumn("__salt", pmod(xxhash64(col("vec_id")), col("__nsub")))
      .select(col("vec_id"), col("v"), col("nrm"), col("tbl"), col("code"),
        col("__salt"),
        explode(transform(sequence(lit(0L), col("__nsub") - 1L),
          t => struct(least(col("__salt"), t).as("ci"),
            greatest(col("__salt"), t).as("cj")))).as("__cell"))
      .select(col("vec_id"), col("v"), col("nrm"), col("tbl"), col("code"),
        col("__salt"), col("__cell.ci"), col("__cell.cj"))
      .as[(Long, Array[Float], Double, Long, Long, Long, Long, Long)]
    salted.groupByKey { case (_, _, _, tbl, code, _, ci, cj) =>
        (tbl, code, ci, cj) }
      .flatMapGroups { (key, it) =>
        val rows = it.toArray
        // Enforced memory contract: a cell holds two salt classes of an
        // over-cap bucket (expected <= 2x maxBucket + hash variance).
        // Blowing 4x means the salt could not spread the rows — which
        // only duplicate ids (same hash -> same salt) do.
        if (rows.length > 4L * maxBucket)
          throw new IllegalStateException(
            s"lshNearDuplicates: sub-bucket (tbl=${key._1}, code=${key._2}, " +
            s"cell=${key._3}/${key._4}) holds ${rows.length} rows " +
            s"(> 4 x maxBucket=$maxBucket) — duplicate ids defeat the " +
            "salt split; dedupe ids first or raise maxBucket")
        java.util.Arrays.sort(rows,
          Ordering.by((r: (Long, Array[Float], Double, Long, Long, Long,
            Long, Long)) => r._1))
        // Cross cells (ci != cj) pair only ACROSS the two salt classes —
        // within-class pairs belong to the (s, s) cell, which both rows
        // also join, so each pair is enumerated exactly once per table.
        val cross = key._3 != key._4
        // Lazy (i, j) walk: matches stream out as found — heap stays
        // bounded by the bucket array even when most pairs pass (a hot
        // bucket at a low threshold would otherwise buffer O(occupancy^2)
        // tuples before emitting the first row).
        new Iterator[(Long, Long)] {
          private var i = 0
          private var j = 1
          private var nextPair: (Long, Long) = null
          private def advance(): Unit = {
            nextPair = null
            while (nextPair == null && i < rows.length - 1) {
              val (ida, va, na, _, _, sa, _, _) = rows(i)
              while (nextPair == null && j < rows.length) {
                val (idb, vb, nb, _, _, sb, _, _) = rows(j)
                j += 1
                if (!cross || sa != sb) {
                  // Same fold as FloatVecDot: left-to-right double acc.
                  var acc = 0.0
                  var k = 0
                  while (k < va.length) {
                    acc += va(k).toDouble * vb(k).toDouble; k += 1
                  }
                  // idb != ida mirrors the join form's STRICT x.id < y.id:
                  // duplicate ids in one bucket must not emit a self-pair.
                  if (idb != ida && acc >= na * nb * threshold)
                    nextPair = (ida, idb)
                }
              }
              if (nextPair == null) { i += 1; j = i + 1 }
            }
          }
          advance()
          override def hasNext: Boolean = nextPair != null
          override def next(): (Long, Long) = {
            val r = nextPair; advance(); r
          }
        }
      }
      .toDF("id_a", "id_b")
      .distinct()
  }

  /** Sequential-fold double norm of a centroid — the Scala-side mirror of
    * VectorOps.norm (identical fold order, so scores stay bit-comparable
    * with the DuckDB oracle). */
  private def normOf(v: Array[Float]): Double =
    math.sqrt(v.foldLeft(0.0)((acc, f) => acc + f.toDouble * f.toDouble))

  /** Per-centroid (negated score, cid) structs — ascending sort =
    * descending score with ties to the lower cid, the same order the
    * DuckDB oracle's ROW_NUMBER uses. TEST ORACLE ONLY since r13: the
    * production probe path is [[probeCids]] (one loop expression);
    * this declarative twin inlines k dots + a k-struct sort and
    * overflows the 64 KB codegen limit past ~a hundred centroids. */
  private[graft] def probeEntriesOf(vec: Column,
      centroids: Seq[(Long, Array[Float])]): Seq[Column] = {
    val n = VectorOps.norm(vec)
    centroids.map { case (cid, cv) =>
      val score = VectorOps.dot(vec, typedLit(cv.toSeq)) /
        (n * lit(normOf(cv)))
      struct((lit(0.0) - score).as("neg"), lit(cid).as("cid"))
    }
  }

  /** Declarative twin of [[probeCids]] — the spec's oracle. */
  private[graft] def probeCidsDeclarative(vec: Column,
      centroids: Seq[(Long, Array[Float])], nprobe: Int): Column =
    transform(
      slice(sort_array(array(probeEntriesOf(vec, centroids): _*)), 1, nprobe),
      e => e.getField("cid"))

  /** Top-`nprobe` probe cids as ONE loop codegen expression
    * (array<long>, cosine DESC, ties -> lower cid) — the
    * PqEncode/SrpCodes 64 KB lesson applied to centroid assignment:
    * with the auto-k dial (k ~ sqrt(n)) the declarative form's
    * projection overflows the method limit past ~a hundred centroids
    * and drops the whole assignment stage (and every Lloyd training
    * round) to interpreted evaluation. Bit-identical to
    * [[probeCidsDeclarative]]: same folds, same nan-safe (neg, cid)
    * order (spec-pinned on random vectors, ties, and a zero vector). */
  /** Past this many bytes of quantizer array payload the probe/encode
    * expressions switch from plan-embedded reference objects (one copy
    * serialized into EVERY task closure, re-shipped per stage) to a
    * Spark broadcast (one torrent-distributed copy per executor) — the
    * [[graft.functions.BloomMightContainLongBcast]] discipline applied
    * to centroid/codebook arrays. At the auto dial's k ~ 22,000 x
    * dim 64 the floats alone are ~5.6 MB; the 4 MB default catches
    * that while keeping gate-scale quantizers (a few KB) plan-local.
    * Conf `spark.graft.quantizer.bcastFromBytes` overrides (specs pin
    * bit-identity and the switch itself by forcing it low). */
  private[graft] val QuantizerBcastDefaultBytes: Long = 4L << 20

  private def quantizerBcastFromBytes: Long =
    org.apache.spark.sql.internal.SQLConf.get.getConfString(
      "spark.graft.quantizer.bcastFromBytes",
      QuantizerBcastDefaultBytes.toString).toLong

  private def quantizerBytes(nFloats: Int, nDoubles: Int, nLongs: Int,
      nInts: Int): Long =
    4L * nFloats + 8L * nDoubles + 8L * nLongs + 4L * nInts

  private[graft] def probeCids(vec: Column,
      centroids: Seq[(Long, Array[Float])], nprobe: Int): Column = {
    require(centroids.nonEmpty, "probeCids: empty centroids")
    val dim = centroids.head._2.length
    require(centroids.forall(_._2.length == dim),
      "probeCids: centroids must share one dimension")
    val cids = centroids.map(_._1).toArray
    val norms = centroids.map(c => normOf(c._2)).toArray
    val cents = centroids.toArray.flatMap(_._2)
    val ve = org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(vec)
    val expr =
      if (quantizerBytes(cents.length, norms.length, cids.length, 0) >=
          quantizerBcastFromBytes) {
        val bc = org.apache.spark.sql.SparkSession.active.sparkContext
          .broadcast(graft.functions.CentroidArrays(cids, norms, cents))
        graft.functions.NearestCentroidsBcast(ve, nprobe, dim, bc)
      } else {
        graft.functions.NearestCentroids(ve, nprobe, dim, cids, norms, cents)
      }
    org.apache.spark.sql.graftbridge.GraftSqlBridge.column(expr)
  }

  /** Nearest codebook entry (highest cosine, ties -> lower cid) for an
    * arbitrary vector expression — a single narrow projection. */
  private def nearestCid(vec: Column,
      centroids: Seq[(Long, Array[Float])]): Column =
    element_at(probeCids(vec, centroids, 1), 1)

  // ---- Two-level (coarse-then-fine) centroid assignment --------------------

  /** Coarse group count for a k-entry quantizer: ceil(sqrt(k)), so with
    * the auto dial's k ~ sqrt(n) the per-row assignment cost
    * O(sqrt(k) * (1 + wprobe)) is ~n^(1/4) — effectively flat where the
    * flat scan's O(k) grows with the corpus. */
  def hierGroupsFor(k: Int): Int = {
    require(k >= 1, s"hierGroupsFor: k >= 1, got $k")
    math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
  }

  /** Driver-side Lloyd over an in-memory vector list — the SUPER-centroid
    * trainer for the two-level index ([[probeCidsHier]]): the input is
    * the k trained centroids themselves (already a driver literal), so
    * clustering them is pure local arithmetic mirroring [[trainKMeans]]'s
    * determinism contract exactly: k lowest-id seeding, highest-cosine
    * assignment with the [[graft.functions.IvfOps.nearestCentroids]]
    * nan-safe (neg, cid) tie rule, exact floor(x * 2^20) integer mean
    * sums rounded once to float, fixed `iters` rounds, empty clusters
    * dropped, output sorted by cid. */
  private[graft] def trainKMeansLocal(vecs: Seq[(Long, Array[Float])],
      c: Int, iters: Int): Seq[(Long, Array[Float])] = {
    require(vecs.nonEmpty && c > 0 && iters >= 0,
      "trainKMeansLocal: nonempty input, c > 0, iters >= 0")
    val dim = vecs.head._2.length
    val sorted = vecs.sortBy(_._1)
    var cents: Seq[(Long, Array[Float])] =
      sorted.take(c).map { case (id, v) => (id, v.clone()) }
    for (_ <- 0 until iters) {
      val cn = cents.map(e => normOf(e._2)).toArray
      val sums = scala.collection.mutable.LinkedHashMap
        .empty[Long, (Array[Long], Array[Long])] // cid -> (dimSums, n-box)
      sorted.foreach { case (_, v) =>
        val a = assignLocal(v, cents, cn)
        val (sm, nn) = sums.getOrElseUpdate(cents(a)._1,
          (new Array[Long](dim), new Array[Long](1)))
        var j = 0
        while (j < dim) {
          sm(j) += math.floor(v(j).toDouble * KMeansScale).toLong
          j += 1
        }
        nn(0) += 1L
      }
      cents = sums.toSeq.map { case (cid, (sm, nn)) =>
        (cid, Array.tabulate(dim)(j =>
          (sm(j) / (KMeansScale * nn(0))).toFloat))
      }.sortBy(_._1)
    }
    cents
  }

  /** Index of `v`'s assigned centroid under the exact
    * [[graft.functions.IvfOps.nearestCentroids]] rule (nan-safe compare,
    * ties to the lower cid), computed driver-side. */
  private def assignLocal(v: Array[Float], cents: Seq[(Long, Array[Float])],
      cn: Array[Double]): Int = {
    val nrm = normOf(v)
    require(nrm > 0.0, "hier index: zero-norm (or NaN) centroid — cosine " +
      "grouping is undefined; the quantizer must not contain zero vectors")
    var best = -1
    var bestNeg = 0.0
    var e = 0
    while (e < cents.length) {
      var acc = 0.0
      val cv = cents(e)._2
      val n = math.min(v.length, cv.length)
      var j = 0
      while (j < n) { acc += v(j).toDouble * cv(j).toDouble; j += 1 }
      val neg = 0.0 - acc / (nrm * cn(e))
      if (best < 0) { best = e; bestNeg = neg }
      else {
        val c = if (neg == bestNeg) 0 else java.lang.Double.compare(neg, bestNeg)
        if (c < 0 || (c == 0 && cents(e)._1 < cents(best)._1)) {
          best = e; bestNeg = neg
        }
      }
      e += 1
    }
    best
  }

  /** The two-level index of a trained quantizer: ceil(sqrt(k)) coarse
    * super-centroids Lloyd-trained over the k centroid VECTORS (all
    * driver-side — the centroids are already plan literals), each fine
    * centroid grouped under its nearest coarse entry (same nan-safe
    * tie rule), empty groups dropped, groups ordered by coarse cid and
    * members by cid. Deterministic end to end, so the same quantizer
    * always yields the same index. */
  private[graft] def hierIndexOf(centroids: Seq[(Long, Array[Float])],
      iters: Int = 2)
      : (Seq[Array[Float]], IndexedSeq[Seq[(Long, Array[Float])]]) = {
    require(centroids.nonEmpty, "hierIndexOf: empty centroids")
    val coarse = trainKMeansLocal(centroids, hierGroupsFor(centroids.length),
      iters)
    val cn = coarse.map(e => normOf(e._2)).toArray
    val byGroup = centroids.groupBy(f => assignLocal(f._2, coarse, cn))
    val groupIdx = byGroup.keys.toIndexedSeq.sortBy(coarse(_)._1)
    (groupIdx.map(coarse(_)._2),
      groupIdx.map(g => byGroup(g).sortBy(_._1)))
  }

  /** Top-`nprobe` probe cids through the TWO-LEVEL index — the
    * [[probeCids]] form whose per-row cost is O(sqrt(k) * (1 + wprobe))
    * instead of O(k): score the ~sqrt(k) coarse super-centroids, descend
    * into the `wprobe` best groups, score only their fine members. With
    * `wprobe` >= the group count every fine centroid is scored and the
    * result is BIT-IDENTICAL to [[probeCids]] (the global (neg, cid)
    * selection rule — HierCentroidsSpec holds it); smaller wprobe is the
    * standard IVF approximation dial (spec'd for agreement on clustered
    * corpora, where the auto-k family actually operates). */
  private[graft] def probeCidsHier(vec: Column,
      centroids: Seq[(Long, Array[Float])], nprobe: Int,
      wprobe: Int): Column = {
    require(centroids.nonEmpty, "probeCidsHier: empty centroids")
    require(wprobe >= 1, s"probeCidsHier: wprobe >= 1, got $wprobe")
    val dim = centroids.head._2.length
    require(centroids.forall(_._2.length == dim),
      "probeCidsHier: centroids must share one dimension")
    val (coarseVecs, groups) = hierIndexOf(centroids)
    val coarseNorms = coarseVecs.map(normOf).toArray
    require(coarseNorms.forall(_ > 0.0),
      "probeCidsHier: zero-norm super-centroid — cosine grouping is " +
        "undefined; the quantizer must not contain zero vectors")
    val flat = groups.flatten
    val coarseCents = coarseVecs.toArray.flatten
    val offsets = groups.scanLeft(0)(_ + _.length).toArray
    val cids = flat.map(_._1).toArray
    val norms = flat.map(e => normOf(e._2)).toArray
    val cents = flat.toArray.flatMap(_._2)
    val w = math.min(wprobe, groups.length)
    val ve = org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(vec)
    val expr =
      if (quantizerBytes(coarseCents.length + cents.length,
          coarseNorms.length + norms.length, cids.length, offsets.length) >=
          quantizerBcastFromBytes) {
        val bc = org.apache.spark.sql.SparkSession.active.sparkContext
          .broadcast(graft.functions.HierArrays(coarseNorms, coarseCents,
            offsets, cids, norms, cents))
        graft.functions.NearestCentroidsHierBcast(ve, nprobe, w, dim, bc)
      } else {
        graft.functions.NearestCentroidsHier(ve, nprobe, w, dim,
          coarseNorms, coarseCents, offsets, cids, norms, cents)
      }
    org.apache.spark.sql.graftbridge.GraftSqlBridge.column(expr)
  }

  /** [[ivfProbes]] through the two-level index. */
  def ivfProbesHier(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])], nprobe: Int,
      wprobe: Int): DataFrame =
    vecs.select(col(idCol),
      explode(probeCidsHier(col(vecCol), centroids, nprobe, wprobe))
        .as("cid"))

  /** [[ivfAssignments]] through the two-level index — the assignment
    * form the auto-k SemDeDup path uses once its k outgrows the flat
    * scan ([[graft.operators.Dedup.semanticDedupAuto]]'s `hierFromK`
    * dial). */
  def ivfAssignmentsHier(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])], wprobe: Int): DataFrame =
    vecs.select(
      element_at(probeCidsHier(col(vecCol), centroids, 1, wprobe), 1)
        .as("cid"),
      col(idCol).as("id"), col(vecCol).as("vec"))

  /** Sequential-fold squared norm of a centroid (no sqrt) — same fold
    * order as the DuckDB oracle's list_reduce, so L2 distances stay
    * bit-comparable across engines. */
  private def sqNormOf(v: Array[Float]): Double =
    v.foldLeft(0.0)((acc, f) => acc + f.toDouble * f.toDouble)

  /** All m minimum-L2 subspace codes of `vec` as one array<long> — the
    * standard product-quantization assignment (||c||^2 - 2 dot(v,c)
    * ranking, ||v||^2 constant per row; ties -> lower cid). Cosine
    * assignment (magnitude-blind) must NOT feed an additive dot-product
    * estimator: a subvector snapped to a direction-aligned but
    * wrong-magnitude centroid corrupts every ADC partial.
    *
    * Delegates to the PqEncode codegen expression: the declarative
    * sort_array-of-structs form generates O(m*k) inline code and
    * overflows the 64 KB method limit at m=32, dropping the whole stage
    * to interpreted evaluation. */
  private def pqEncodeCol(vec: Column,
      codebooks: Seq[Seq[(Long, Array[Float])]], subDim: Int): Column = {
    require(codebooks.forall(_.nonEmpty), "pqEncodeCol: empty codebook")
    val offsets = codebooks.scanLeft(0)(_ + _.length).toArray
    val cids = codebooks.flatMap(_.map(_._1)).toArray
    val norms2 = codebooks.flatMap(_.map(e => sqNormOf(e._2))).toArray
    val cents = codebooks.toArray.flatMap(_.flatMap(_._2))
    val ve = org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(vec)
    val expr =
      if (quantizerBytes(cents.length, norms2.length, cids.length,
          offsets.length) >= quantizerBcastFromBytes) {
        val bc = org.apache.spark.sql.SparkSession.active.sparkContext
          .broadcast(graft.functions.PqArrays(offsets, cids, norms2, cents))
        graft.functions.PqEncodeBcast(ve, subDim, bc)
      } else {
        graft.functions.PqEncode(ve, subDim, offsets, cids, norms2, cents)
      }
    org.apache.spark.sql.graftbridge.GraftSqlBridge.column(expr)
  }

  /** IVF probe assignment: each vector's `nprobe` highest-cosine coarse
    * centroids (ties -> lower cid). Centroids are driver-side literals
    * (the trained coarse quantizer — k entries of dim floats), so the
    * scoring is ONE narrow projection per row: k codegen'd dot products,
    * an in-row sort, no shuffle and no join. Output: (idCol, cid). */
  def ivfProbes(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])], nprobe: Int): DataFrame =
    vecs.select(col(idCol),
      explode(probeCids(col(vecCol), centroids, nprobe)).as("cid"))

  /** Fixed-point scale for the k-means update sums: per-dimension values
    * are accumulated as floor(x * 2^20) integers, making the cluster sum
    * EXACT and order-independent — a double accumulator would make the
    * trained centroids depend on partial-aggregation order (flaky across
    * runs AND engines). 2^20 fraction bits cover unit-normish embedding
    * coordinates; the long headroom (2^63/2^20 = 2^43 rows per cluster)
    * is ample at any realistic scale. */
  val KMeansScale: Double = 1048576.0

  /**
   * In-engine Lloyd k-means over a float-vector column — the coarse-
   * quantizer trainer for [[ivfTopK]], returning centroids as driver-side
   * plan literals (cid = the seeding vector's id).
   *
   * Deterministic by construction, so the DuckDB oracle replays training
   * bit-for-bit: seeding takes the `k` lowest-id vectors; assignment
   * breaks score ties toward the lower cid; per-cluster means are built
   * from exact scaled-integer sums (see [[KMeansScale]]) and rounded once
   * to float. Runs a FIXED `iters` Lloyd rounds (no early-stop — the
   * replayed oracle must unroll the same count). A cluster that loses all
   * members is dropped (standard Lloyd alternative to re-seeding, and the
   * behavior SQL replay matches naturally).
   *
   * Scale shape: each round is one narrow pass (k codegen dot products
   * per row, no join — centroids ride in the plan) into one groupBy(cid)
   * with dim+1 map-side-partial sums; only k*(dim+1) aggregated values
   * ever reach the driver. Train on a hash-sampled subset at corpus scale
   * (`vecs.where(pmod(xxhash64(id), N) === 0)`) — Lloyd on a sample is
   * the standard IVF recipe; the full corpus is only ever touched by the
   * final nprobe=1 list assignment.
   *
   * `hierWprobe = Some(w)`: each round's assignment rides the TWO-LEVEL
   * index of the CURRENT centroids ([[probeCidsHier]] — the hier index
   * is rebuilt per round, driver-side O(k*sqrt(k)) over the k centroid
   * literals), so the per-row scan is O(sqrt(k)*(1+w)) dots instead of
   * O(k) — with the auto dial's k ~ sqrt(n) that cuts a Lloyd round
   * from O(sample*sqrt(n)) to ~O(sample*n^(1/4)). With w >= the group
   * count the round is BIT-IDENTICAL to the flat scan (the global
   * (neg, cid) selection rule — HierCentroidsSpec pins trained
   * equality), so oracle-replayed gates stay on None/flat semantics
   * for free; a smaller w is the documented at-scale dial (Lloyd is a
   * heuristic — an occasionally-one-group-over assignment perturbs the
   * means it was already approximating).
   */
  def trainKMeans(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, iters: Int,
      hierWprobe: Option[Int] = None): Seq[(Long, Array[Float])] = {
    require(k > 0 && iters >= 0, "trainKMeans: k > 0, iters >= 0")
    var cents: Seq[(Long, Array[Float])] =
      vecs.orderBy(col(idCol)).limit(k)
        .select(col(idCol), col(vecCol)).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val sums = (0 until dim).map(j =>
      sum(floor(element_at(col(vecCol), j + 1).cast("double") *
        KMeansScale).cast("long")).as(s"s$j"))
    for (_ <- 0 until iters) {
      val nearest = hierWprobe match {
        case Some(w) =>
          element_at(probeCidsHier(col(vecCol), cents, 1, w), 1)
        case None => nearestCid(col(vecCol), cents)
      }
      val rows = vecs.select(nearest.as("cid"), col(vecCol))
        .groupBy("cid")
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
      cents = rows.map { r =>
        val n = r.getLong(1)
        (r.getLong(0), Array.tabulate(dim)(j =>
          (r.getLong(j + 2) / (KMeansScale * n)).toFloat))
      }.sortBy(_._1).toSeq
    }
    cents
  }

  /** nprobe=1 inverted-list assignment CARRYING the vector — the
    * materialized-index row shape (cid, id, vec) a persisted IVF index
    * stores, so probes re-rank straight from the index without joining
    * back to the corpus. One narrow projection, no shuffle.
    * `hierWprobe = Some(w)` routes through the two-level index
    * ([[ivfAssignmentsHier]] — O(sqrt(k)*(1+w)) dots per row instead of
    * O(k); bit-identical at w >= the group count, the at-scale
    * approximation dial below it). */
  def ivfAssignments(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])],
      hierWprobe: Option[Int] = None): DataFrame =
    hierWprobe match {
      case Some(w) => ivfAssignmentsHier(vecs, idCol, vecCol, centroids, w)
      case None =>
        vecs.select(nearestCid(col(vecCol), centroids).as("cid"),
          col(idCol).as("id"), col(vecCol).as("vec"))
    }

  /** Query top-k against a MATERIALIZED inverted-list table
    * ([[ivfAssignments]] rows, e.g. the accumulated state of
    * [[graft.streaming.EmbeddingIndexStream]]): probe `nprobe` lists,
    * exact-cosine re-rank, heap top-k — the corpus itself is never
    * touched. Lists equi-join on cid; at scale the index lives bucketed
    * by cid so the probe co-locates. */
  def probeIndex(lists: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[(Long, Array[Float])], nprobe: Int): DataFrame = {
    val probes = ivfProbes(queries.select(col("qid"), col("qvec")), "qid",
      "qvec", centroids, nprobe)
    val scored = probes.join(lists, "cid")
      .join(broadcast(queries.withColumn("qnrm", VectorOps.norm(col("qvec")))),
        "qid")
      .withColumn("score", VectorOps.dot(col("qvec"), col("vec")) /
        (col("qnrm") * VectorOps.norm(col("vec"))))
    rankTopKPerQuery(scored, k, "score")
  }

  /** IVF approximate top-k: corpus vectors live in inverted lists keyed by
    * their nearest centroid (nprobe=1 assignment); each query probes its
    * `nprobe` nearest lists and exact-cosine re-ranks the candidates.
    *
    * Scale: assignment is a narrow map (centroids broadcast as literals),
    * the inverted-list join is an equi-join on cid (shuffle linear in
    * corpus + probed lists), and re-ranking touches ~nprobe/k of the
    * corpus per query instead of all of it — the standard IVF recall/cost
    * dial. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[(Long, Array[Float])], nprobe: Int): DataFrame = {
    val lists = ivfProbes(corpus.select(col("id"), col("vec")), "id", "vec",
      centroids, 1)
    val probes = ivfProbes(queries.select(col("qid"), col("qvec")), "qid",
      "qvec", centroids, nprobe)
    val cand = probes.join(lists, "cid").select("qid", "id").distinct()
    val scored = cand
      .join(queries.withColumn("qnrm", VectorOps.norm(col("qvec"))), "qid")
      .join(corpus.withColumn("nrm", VectorOps.norm(col("vec"))), "id")
      .withColumn("score",
        VectorOps.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
    rankTopKPerQuery(scored, k, "score")
  }

  /** Approximate top-k via SRP-LSH: bucket-join candidates, exact cosine
    * re-rank. Same output shape as bruteForceTopK (minus missed vectors). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numTables: Int = 8, numPlanes: Int = 3, seed: Int = 42,
      dim: Int = 64): DataFrame = {
    val qCodes = lshCodes(queries.select(col("qid").as("vec_id"), col("qvec")),
      "vec_id", "qvec", numTables, numPlanes, seed, dim)
      .select(col("vec_id").as("qid"), col("tbl"), col("code"))
    val cCodes = lshCodes(corpus.select(col("id").as("vec_id"), col("vec")),
      "vec_id", "vec", numTables, numPlanes, seed, dim)
      .select(col("vec_id").as("id"), col("tbl"), col("code"))
    val cand = qCodes.join(cCodes, Seq("tbl", "code"))
      .select("qid", "id").distinct()
    val scored = cand
      .join(queries.withColumn("qnrm", VectorOps.norm(col("qvec"))), "qid")
      .join(corpus.withColumn("nrm", VectorOps.norm(col("vec"))), "id")
      .withColumn("score",
        VectorOps.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
    rankTopKPerQuery(scored, k, "score")
  }

  // ---- PCA (power iteration) ----------------------------------------------

  /**
   * Top-`k` principal directions trained IN-ENGINE: one bounded
   * [[graft.functions.GramAggregator]] pass accumulates the exact
   * scaled-integer second moments (dim^2 longs of state per partition —
   * the corpus is never exploded), then the driver centers the matrix
   * and runs FIXED-round power iteration with deflation on the 64x64
   * doubles. Deterministic end to end: integer sums are order-free, the
   * driver math is sequential, the start vector is e_0 — same discipline
   * as [[trainKMeans]]. Returned directions are unit-norm, mutually
   * orthogonal, sign-fixed (first nonzero coordinate positive).
   */
  def trainTopPCs(vecs: DataFrame, vecCol: String, dim: Int, k: Int,
      iters: Int = 30): Array[Array[Double]] = {
    require(k > 0 && k <= dim && iters > 0, "trainTopPCs: bad k/iters")
    import vecs.sparkSession.implicits._
    val agg = org.apache.spark.sql.functions.udaf(
      graft.functions.GramAggregator(dim))
    val st = vecs.select(agg(col(vecCol).cast("array<float>")).as("s"))
      .select(col("s.gram"), col("s.sums"), col("s.n"))
      .as[(Seq[Long], Seq[Long], Long)].head()
    val (tri, sums, n) = (st._1.toArray, st._2.toArray, st._3)
    require(n > 1, "trainTopPCs: need more than one vector")
    val scale = 1048576.0
    val mean = sums.map(_ / (scale * n))
    // centered covariance C = E[xx^T] - mu mu^T (driver-side doubles)
    val c = Array.ofDim[Double](dim, dim)
    var idx = 0
    for (i <- 0 until dim; j <- i until dim) {
      val e = tri(idx) / (scale * n) - mean(i) * mean(j)
      c(i)(j) = e; c(j)(i) = e
      idx += 1
    }
    val dirs = new Array[Array[Double]](k)
    for (pc <- 0 until k) {
      var v = Array.tabulate(dim)(i => if (i == pc) 1.0 else 0.0)
      for (_ <- 0 until iters) {
        val w = Array.tabulate(dim)(i =>
          (0 until dim).foldLeft(0.0)((acc, j) => acc + c(i)(j) * v(j)))
        // re-orthogonalize against found directions (deflation-stable)
        for (d <- 0 until pc) {
          val proj = (0 until dim).foldLeft(0.0)((acc, j) =>
            acc + w(j) * dirs(d)(j))
          for (j <- 0 until dim) w(j) -= proj * dirs(d)(j)
        }
        val nrm = math.sqrt(w.foldLeft(0.0)((a, x) => a + x * x))
        v = if (nrm > 0) w.map(_ / nrm) else v
      }
      val lead = v.indexWhere(math.abs(_) > 1e-12)
      dirs(pc) = if (lead >= 0 && v(lead) < 0) v.map(-_) else v
    }
    dirs
  }

  /** Projects vectors onto trained directions: (vec_id, pc, coord) —
    * directions ride the plan as literals, one narrow codegen projection
    * per row. Coordinates are centered on the training mean implicitly
    * only if the caller centered; this projects raw vectors. */
  def pcProject(vecs: DataFrame, idCol: String, vecCol: String,
      dirs: Array[Array[Double]]): DataFrame =
    vecs.select(col(idCol).as("vec_id"),
        posexplode(array(dirs.map(d =>
          round(VectorOps.dot(col(vecCol),
            typedLit(d.map(_.toFloat).toSeq)), 6)): _*)))
      .select(col("vec_id"), col("pos").cast("long").as("pc"),
        col("col").as("coord"))

  // ---- Product quantization ------------------------------------------------

  /**
   * PQ codebook training: one Lloyd codebook per contiguous `subDim`-wide
   * subspace (m of them), assigned by MINIMUM L2 per subspace (the
   * standard PQ objective — see [[nearestCidL2]] for why cosine
   * assignment breaks the ADC estimator). Same determinism contract as
   * the IVF coarse quantizer — lowest-id seeding, ties to the lower cid,
   * exact scaled-integer mean sums, fixed rounds — so the DuckDB oracle
   * replays every codebook bit-for-bit. Train on a sample at corpus
   * scale, like IVF.
   *
   * All m codebooks train in ONE scan per Lloyd round: PqEncode assigns
   * every subspace's code in one narrow codegen call, the (subspace,
   * cid, subvector) rows posexplode out, and one groupBy(subspace, cid)
   * accumulates every codebook's exact sums together — iters+1 jobs
   * total instead of m*(iters+1).
   */
  def trainPQ(vecs: DataFrame, idCol: String, vecCol: String, m: Int,
      subDim: Int, k: Int, iters: Int): Seq[Seq[(Long, Array[Float])]] = {
    require(m > 0 && subDim > 0 && k > 0 && iters >= 0,
      "trainPQ: m, subDim, k > 0, iters >= 0")
    val seedRows = vecs.orderBy(col(idCol)).limit(k)
      .select(col(idCol), col(vecCol)).collect()
    var books: IndexedSeq[Seq[(Long, Array[Float])]] = (0 until m).map { mi =>
      seedRows.map(r => (r.getLong(0),
        r.getSeq[Float](1).slice(mi * subDim, (mi + 1) * subDim).toArray))
        .toSeq
    }
    val sums = (0 until subDim).map(j =>
      sum(floor(element_at(col("sv"), j + 1).cast("double") *
        KMeansScale).cast("long")).as(s"s$j"))
    for (_ <- 0 until iters) {
      val rows = vecs
        .select(col(vecCol), posexplode(pqEncodeCol(col(vecCol), books, subDim)))
        .select(col("pos").as("mi"), col("col").as("cid"),
          slice(col(vecCol), col("pos") * subDim + 1, lit(subDim)).as("sv"))
        .groupBy("mi", "cid")
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
      books = (0 until m).map { mi =>
        rows.filter(_.getInt(0) == mi).map { r =>
          val n = r.getLong(2)
          (r.getLong(1), Array.tabulate(subDim)(j =>
            (r.getLong(j + 3) / (KMeansScale * n)).toFloat))
        }.sortBy(_._1).toSeq
      }
    }
    books
  }

  /**
   * PQ encoding: each vector compresses to `m` codebook ids — at dim=64,
   * m=4, k<=256 that is 4 bytes instead of 256, the memory step that
   * makes billion-vector search fit RAM. One narrow projection per row
   * (codebooks ride in the plan as literals), exploded to
   * (id, m, cid) rows.
   */
  def pqCodes(vecs: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[Seq[(Long, Array[Float])]], subDim: Int): DataFrame =
    vecs.select(col(idCol).as("id"),
        posexplode(pqEncodeCol(col(vecCol), codebooks, subDim)))
      .select(col("id"), col("pos").cast("long").as("m"),
        col("col").as("cid"))

  /** Per-query ADC lookup table (qid, m, cid, p): p = dot(q's subvector
    * m, codebook centroid cid) — the m x k table every ADC scan consults.
    * Tiny (queries x m x k rows), always broadcast by callers. */
  private def adcLut(queries: DataFrame,
      codebooks: Seq[Seq[(Long, Array[Float])]], subDim: Int): DataFrame = {
    val offsets = codebooks.scanLeft(0)(_ + _.length).toArray
    val cids = codebooks.flatMap(_.map(_._1)).toArray
    val cents = codebooks.toArray.flatMap(_.flatMap(_._2))
    val lutCol = org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
      graft.functions.PqLut(
        org.apache.spark.sql.graftbridge.GraftSqlBridge.expression(col("qvec")),
        subDim, offsets, cids, cents))
    queries.select(col("qid"), explode(lutCol).as("e"))
      .select(col("qid"), col("e.m").as("m"), col("e.cid").as("cid"),
        col("e.p").as("p"))
  }

  /** Shared ADC estimator over (…, id, m, cid) code rows: joins the
    * broadcast LUT on `joinKeys`, then sums the m partials per (qid, id)
    * in a FIXED expression-tree order (max-per-slot then left-fold adds
    * — ((p0 + p1) + p2) + …), keeping the doubles engine-replayable.
    * Returns (qid, id, est). */
  private def adcEstimate(codeRows: DataFrame, lut: DataFrame, m: Int,
      joinKeys: Seq[String], extraGroup: Seq[String] = Nil): DataFrame = {
    val slots = (0 until m).map(mi =>
      max(when(col("m") === mi.toLong, col("p"))).as(s"__p$mi"))
    val est = (0 until m).map(mi => col(s"__p$mi")).reduce(_ + _)
    codeRows.join(broadcast(lut), joinKeys)
      .groupBy("qid", (Seq("id") ++ extraGroup): _*)
      .agg(slots.head, slots.tail: _*)
      .withColumn("est", est)
      .select("qid", (Seq("id") ++ extraGroup :+ "est"): _*)
  }

  /**
   * PQ asymmetric-distance top-k (ADC): the dot product is additive over
   * subspaces, so dot(q, v) is estimated as sum_m dot(q_m, codebook
   * centroid of v's code in subspace m). Per query the partials form a
   * tiny (m x k) lookup table; the corpus side only ever moves its CODE
   * rows — the full vectors stay in storage, which is the entire point
   * of PQ at scale.
   */
  def pqAdcTopK(corpusCodes: DataFrame, queries: DataFrame,
      codebooks: Seq[Seq[(Long, Array[Float])]], subDim: Int,
      k: Int): DataFrame =
    rankTopKPerQuery(
      adcEstimate(corpusCodes, adcLut(queries, codebooks, subDim),
        codebooks.length, Seq("m", "cid")),
      k, "est")

  // ---- IVF x PQ composed index --------------------------------------------

  /**
   * IVF x PQ inverted lists: (cid, id, m, code) rows — the layout every
   * billion-vector deployment stores. Each list entry carries the
   * vector's PQ CODES (m small ints ≈ m bytes), never the raw vector, so
   * a probe reads ~m bytes per candidate instead of dim x 4: at dim=64 /
   * m=32 that is an 8x cut in probe-path IO, and the raw vectors never
   * leave storage until (optionally) a final top-`refine` exact re-rank
   * touches just those rows.
   *
   * One narrow projection per vector (coarse centroids AND codebooks ride
   * the plan as literals — [[nearestCid]] + the PqEncode codegen
   * expression), no shuffle. At rest the lists live bucketed by `cid`, so
   * probes co-locate with zero exchange on the index side.
   */
  def ivfPqAssignments(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])],
      codebooks: Seq[Seq[(Long, Array[Float])]], subDim: Int,
      hierWprobe: Option[Int] = None): DataFrame = {
    // hierWprobe = Some(w): the coarse-list pick rides the two-level
    // index (O(sqrt(k)*(1+w)) dots per row vs O(k)) — at the auto dial's
    // k ~ 22,000 for 1e9 docs the flat scan was the encode path's
    // dominant per-row cost, NOT the PQ codes (m fixed-size codebooks).
    // Bit-identical at w >= the group count (HierCentroidsSpec's rule).
    val cid = hierWprobe match {
      case Some(w) =>
        element_at(probeCidsHier(col(vecCol), centroids, 1, w), 1)
      case None => nearestCid(col(vecCol), centroids)
    }
    vecs.select(cid.as("cid"), col(idCol).as("id"),
        posexplode(pqEncodeCol(col(vecCol), codebooks, subDim)))
      .select(col("cid"), col("id"), col("pos").cast("long").as("m"),
        col("col").as("code"))
  }

  /** Probe-side candidate codes: queries pick their `nprobe` nearest
    * coarse lists, the list equi-join yields (qid, id, m, cid) code rows
    * — cid here is the PQ code, renamed to meet [[adcEstimate]]'s LUT
    * join key. Only code rows move; vectors stay in storage. */
  private def ivfPqCandidates(lists: DataFrame, queries: DataFrame,
      centroids: Seq[(Long, Array[Float])], nprobe: Int): DataFrame =
    ivfProbes(queries.select(col("qid"), col("qvec")), "qid", "qvec",
        centroids, nprobe)
      .join(lists, "cid")
      .select(col("qid"), col("id"), col("m"), col("code").as("cid"))

  /**
   * Query top-k against a MATERIALIZED IVF x PQ index
   * ([[ivfPqAssignments]] rows, e.g. the accumulated state of
   * [[graft.streaming.EmbeddingIndexStream.incrementalIvfPq]]): probe
   * `nprobe` lists, rank candidates by the broadcast-LUT ADC estimate.
   * The PURE code path — neither the corpus nor the index ever ships a
   * raw vector; returns (qid, id, rank, est).
   */
  def probePqIndex(lists: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[(Long, Array[Float])],
      codebooks: Seq[Seq[(Long, Array[Float])]], subDim: Int,
      nprobe: Int): DataFrame =
    rankTopKPerQuery(
      adcEstimate(ivfPqCandidates(lists, queries, centroids, nprobe),
        adcLut(queries, codebooks, subDim), codebooks.length,
        Seq("qid", "m", "cid")),
      k, "est")

  /**
   * [[probePqIndex]] over a GENERATIONAL index: list rows carry a `bv`
   * codebook-generation tag and each generation has its own codebooks —
   * the layout [[graft.streaming.EmbeddingIndexStream.incrementalIvfPqWithRebuild]]
   * maintains, where a scheduled rebuild retrains codebooks for FUTURE
   * arrivals but old rows keep the codes (and books) that encoded them.
   * Why generations instead of re-encoding: a codes-only re-encode
   * DOUBLE-quantizes every old row (decode with gen-g books, re-encode
   * with gen-g+1), and on the drift fixture that measurably LOSES recall
   * — 468/640 re-encoded vs 490/640 re-keyed-codes-kept at refine 150
   * (RebuildSweep, r16). The probe just keys the broadcast ADC LUT by
   * (bv, m, cid): one tiny LUT per generation, same single code-row scan.
   *
   * RANKING CONTRACT — top-k PER (query, GENERATION), not per query: ADC
   * estimates are calibrated only WITHIN a codebook generation. Across
   * generations they are incommensurable — books trained after drift
   * reconstruct the drifted mass more faithfully, so their rows' dot
   * estimates systematically beat older generations' for the same true
   * similarity, and a shared shortlist starves the old rows (measured on
   * the drift fixture: a cross-generation 150-deep shortlist gave gen-0
   * rows 1966 of 9600 slots and 45% hit rate vs gen-1's 91% —
   * RebuildSweep r16 diag). Callers exact-re-rank the union, paying
   * k x generations candidates per query; the rebuild cadence bounds the
   * generation count. Returns (qid, id, bv, rank, est) with rank within
   * (qid, bv).
   */
  def probePqIndexVersioned(lists: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[(Long, Array[Float])],
      booksByVersion: Seq[(Long, Seq[Seq[(Long, Array[Float])]])],
      subDim: Int, nprobe: Int): DataFrame = {
    require(booksByVersion.nonEmpty, "probePqIndexVersioned: no codebooks")
    val m = booksByVersion.head._2.length
    require(booksByVersion.forall(_._2.length == m),
      "probePqIndexVersioned: all generations must share the subspace count")
    val lut = booksByVersion.map { case (bv, books) =>
      adcLut(queries, books, subDim).withColumn("bv", lit(bv))
    }.reduce(_ unionByName _)
    val cand = ivfProbes(queries.select(col("qid"), col("qvec")), "qid",
        "qvec", centroids, nprobe)
      .join(lists, "cid")
      .select(col("qid"), col("id"), col("bv"), col("m"),
        col("code").as("cid"))
    val est = adcEstimate(cand, lut, m, Seq("qid", "bv", "m", "cid"),
      extraGroup = Seq("bv"))
    val trimmed = TopK.perKey(est, Seq(col("qid"), col("bv")),
      Seq(col("est").desc, col("id")), k)
    val w = Window.partitionBy("qid", "bv")
      .orderBy(col("est").desc, col("id"))
    trimmed.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("qid"), col("id"), col("bv"), col("rank"),
        round(col("est"), 6).as("est"))
  }

  /**
   * IVF x PQ top-k with exact refinement: ADC-rank the probed lists'
   * code rows, shortlist the top `refine` candidates per query (heap
   * top-k, map-side trim), then exact-cosine re-rank ONLY the shortlist
   * against the corpus — per query just `refine` full vectors are ever
   * read back from storage, vs every probed-list member in [[ivfTopK]].
   *
   * Precondition (shared with [[ivfTopK]]/[[bruteForceTopK]]): vectors
   * have nonzero norm — a zero vector's cosine divides 0/0, which Spark's
   * non-ANSI Divide nulls out, silently dropping it from the ranking
   * rather than erroring. The embedding fixtures contain none.
   *
   * At 100 TB the refine join's corpus side should be the bucketed-by-id
   * store (io_bucketed_join's layout): the per-query shortlist is tiny
   * (AQE broadcasts it), so a bucketed corpus makes the refine read a
   * point lookup per candidate instead of a full-scan shuffle.
   *
   * At equal (centroids, nprobe) the candidate pool matches [[ivfTopK]]'s;
   * `refine` dials how much of that pool the exact pass sees — once the
   * ADC top-`refine` covers the pool's true top-k (the common case well
   * before refine reaches the pool size), the output EQUALS [[ivfTopK]]'s
   * at a fraction of the vector IO (SimilaritySpec holds recall to that
   * bar on the fixture).
   */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[(Long, Array[Float])],
      codebooks: Seq[Seq[(Long, Array[Float])]], subDim: Int,
      nprobe: Int, refine: Int): DataFrame = {
    require(refine >= k, s"ivfPqTopK: refine ($refine) must be >= k ($k)")
    val lists = ivfPqAssignments(corpus.select(col("id"), col("vec")), "id",
      "vec", centroids, codebooks, subDim)
    val est = adcEstimate(ivfPqCandidates(lists, queries, centroids, nprobe),
      adcLut(queries, codebooks, subDim), codebooks.length,
      Seq("qid", "m", "cid"))
    val shortlist = TopK.perKey(est, Seq(col("qid")),
        Seq(col("est").desc, col("id")), refine)
      .select("qid", "id")
    val scored = shortlist
      .join(broadcast(queries.withColumn("qnrm", VectorOps.norm(col("qvec")))),
        "qid")
      .join(corpus.withColumn("nrm", VectorOps.norm(col("vec"))), "id")
      .withColumn("score",
        VectorOps.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
    rankTopKPerQuery(scored, k, "score")
  }

  /**
   * [[matryoshkaTopK]] against a MATERIALIZED (id, prefix, vec) layout —
   * the at-rest shape the operator's scaladoc promises: the coarse pass
   * references ONLY (id, prefix), so the parquet scan reads the narrow
   * prefix column (dim/pdim less IO — `ReadSchema` proves it, spec'd),
   * and the full vectors are scanned only by the refine join over
   * `refine` rows per query. Bit-identical to [[matryoshkaTopK]] on the
   * same data: dot over the stored pdim-length prefix IS FloatVecDot's
   * fold over the first pdim elements (Sq8MatryoshkaSpec pins the
   * slice/prefix equality).
   */
  def matryoshkaTopKFromPrefix(stored: DataFrame, queries: DataFrame,
      pdim: Int, k: Int, refine: Int): DataFrame = {
    require(pdim > 0 && k > 0 && refine >= k,
      s"matryoshkaTopKFromPrefix: need pdim > 0, refine >= k > 0, " +
        s"got pdim=$pdim k=$k refine=$refine")
    val qp = queries.select(col("qid"),
      slice(col("qvec"), 1, pdim).as("qprefix"))
    val coarse = stored.select(col("id"),
        pdimChecked(col("prefix"), pdim,
          "matryoshkaTopKFromPrefix: stored prefix").as("prefix"))
      .crossJoin(broadcast(qp))
      .withColumn("est", VectorOps.cosine(col("qprefix"), col("prefix")))
      .select(col("qid"), col("id"), col("est"))
    val shortlist = TopK.perKey(coarse, Seq(col("qid")),
        Seq(col("est").desc, col("id")), refine)
      .select("qid", "id")
    val scored = shortlist
      .join(broadcast(queries.withColumn("qnrm", VectorOps.norm(col("qvec")))),
        "qid")
      .join(stored.select(col("id"), col("vec"))
        .withColumn("nrm", VectorOps.norm(col("vec"))), "id")
      .withColumn("score",
        VectorOps.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
    rankTopKPerQuery(scored, k, "score")
  }

  /** Per-row fail-fast that a stored prefix/pcode column was materialized
    * at THIS pdim. The dot folds over min(stored length, pdim) while the
    * query-side norm/scale uses all pdim elements, so a layout (or an
    * externally materialized list table — e.g. an
    * [[graft.streaming.EmbeddingIndexStream]] fold read back from
    * parquet) built at a DIFFERENT prefix dimension would silently score
    * a non-cosine and degrade recall with no error. One codegen
    * comparison on a column the probe already reads. */
  private def pdimChecked(c: Column, pdim: Int, what: String): Column =
    when(size(c) === lit(pdim), c)
      .otherwise(raise_error(concat(
        lit(s"$what length "), size(c).cast("string"),
        lit(s" != pdim $pdim - layout was materialized at a " +
          "different prefix dimension"))))

  // ---- IVF x Matryoshka composed index ------------------------------------

  /**
   * IVF x Matryoshka inverted lists: (cid, id, prefix) rows — the coarse
   * index composed with the prefix-serving payload, filling the
   * {IVF}x{prefix} cell of the serving matrix ({raw, PQ, SQ8, prefix}
   * each have their composed form now). List entries carry only the
   * first `pdim` dimensions (a dim/pdim cut in list bytes, the same
   * lever as the at-rest prefix column of [[matryoshkaTopKFromPrefix]]);
   * full vectors stay in corpus storage until the final refine. One
   * narrow codegen projection per vector, no shuffle; at rest bucket by
   * `cid` like the other list layouts.
   *
   * `hierWprobe` is the same two-level coarse-pick dial as the PQ/SQ8
   * twins (bit-identical at w >= the group count).
   */
  def ivfMatryoshkaAssignments(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])], pdim: Int,
      hierWprobe: Option[Int] = None): DataFrame = {
    require(pdim > 0, s"ivfMatryoshkaAssignments: pdim > 0, got $pdim")
    val cid = hierWprobe match {
      case Some(w) =>
        element_at(probeCidsHier(col(vecCol), centroids, 1, w), 1)
      case None => nearestCid(col(vecCol), centroids)
    }
    vecs.select(cid.as("cid"), col(idCol).as("id"),
      slice(col(vecCol), 1, pdim).as("prefix"))
  }

  /**
   * Query top-k against a MATERIALIZED IVF x Matryoshka index
   * ([[ivfMatryoshkaAssignments]] rows): probe `nprobe` lists, rank
   * candidates by prefix cosine — [[matryoshkaTopKFromPrefix]]'s
   * arithmetic (stored-prefix dot vs the query's sliced prefix, both
   * sides' norms over exactly pdim elements) applied to probed-list
   * candidates only. No full vector is touched. Returns
   * (qid, id, rank, est).
   */
  def probeMatryoshkaIndex(lists: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[(Long, Array[Float])], pdim: Int,
      nprobe: Int): DataFrame = {
    val qp = queries.select(col("qid"),
      slice(col("qvec"), 1, pdim).as("qprefix"))
    val cand = ivfProbes(queries.select(col("qid"), col("qvec")), "qid",
        "qvec", centroids, nprobe)
      .join(lists, "cid")
      .join(broadcast(qp), "qid")
      .withColumn("est", VectorOps.cosine(col("qprefix"),
        pdimChecked(col("prefix"), pdim, "probeMatryoshkaIndex: stored prefix")))
      .select(col("qid"), col("id"), col("est"))
    rankTopKPerQuery(cand, k, "est")
  }

  /**
   * IVF x Matryoshka top-k with exact refinement: prefix-cosine-rank the
   * probed lists' entries, shortlist `refine` per query, exact full-dim
   * cosine re-rank only those — [[ivfSq8TopK]]'s dataflow with the
   * prefix payload. Same nonzero-norm precondition (on prefixes too: an
   * all-zero prefix nulls its coarse estimate); same bucketed-corpus
   * refine advice.
   *
   * Exactness dial: at equal (centroids, nprobe) the candidate pool is
   * [[ivfTopK]]'s, so once `refine` covers the pool the output is
   * BIT-IDENTICAL to [[ivfTopK]] (Sq8MatryoshkaSpec pins it); below
   * that, recall degrades only through prefix-vs-full rank disagreement
   * inside the pool — the matryoshka training objective's own promise.
   */
  def ivfMatryoshkaTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[(Long, Array[Float])], pdim: Int, nprobe: Int,
      refine: Int): DataFrame = {
    require(refine >= k, s"ivfMatryoshkaTopK: refine ($refine) must be >= k ($k)")
    val lists = ivfMatryoshkaAssignments(corpus.select(col("id"), col("vec")),
      "id", "vec", centroids, pdim)
    val shortlist = probeMatryoshkaIndex(lists, queries, refine, centroids,
        pdim, nprobe)
      .select("qid", "id")
    val scored = shortlist
      .join(broadcast(queries.withColumn("qnrm", VectorOps.norm(col("qvec")))),
        "qid")
      .join(corpus.withColumn("nrm", VectorOps.norm(col("vec"))), "id")
      .withColumn("score",
        VectorOps.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
    rankTopKPerQuery(scored, k, "score")
  }

  /**
   * IVF x Matryoshka x SQ8 — the COMPOUND payload: list entries carry
   * the int8-quantized PREFIX ((cid, id, pcode, pmax): pdim bytes + one
   * scale per vector — at dim 64 / pdim 32 that is 8x under raw lists
   * and 2x under full-dim SQ8), so the coarse pass pays prefix-IO AND
   * code-arithmetic at once. Ranking follows the SQ8 family convention:
   * the scaled exact-BIGINT dot ESTIMATE of the prefix dot (not the
   * prefix cosine — [[sq8TopK]]'s contract), with the exact full-dim
   * cosine re-rank restoring the final order over `refine` rows.
   */
  def ivfMatryoshkaSq8Assignments(vecs: DataFrame, idCol: String,
      vecCol: String, centroids: Seq[(Long, Array[Float])], pdim: Int,
      hierWprobe: Option[Int] = None): DataFrame = {
    require(pdim > 0, s"ivfMatryoshkaSq8Assignments: pdim > 0, got $pdim")
    val cid = hierWprobe match {
      case Some(w) =>
        element_at(probeCidsHier(col(vecCol), centroids, 1, w), 1)
      case None => nearestCid(col(vecCol), centroids)
    }
    val prefix = slice(col(vecCol), 1, pdim)
    vecs.select(cid.as("cid"), col(idCol).as("id"),
      VectorOps.quantizeInt8(prefix).as("pcode"),
      VectorOps.maxAbs(prefix).as("pmax"))
  }

  /** Query top-k against a MATERIALIZED compound index
    * ([[ivfMatryoshkaSq8Assignments]] rows): probe `nprobe` lists, rank
    * candidates by the scaled integer PREFIX-dot estimate — no raw or
    * float prefix is ever touched. Returns (qid, id, rank, est). */
  def probeMatryoshkaSq8Index(lists: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[(Long, Array[Float])], pdim: Int,
      nprobe: Int): DataFrame = {
    val qprefix = slice(col("qvec"), 1, pdim)
    val q = queries.select(col("qid"),
      VectorOps.quantizeInt8(qprefix).as("qpcode"),
      VectorOps.maxAbs(qprefix).as("qpmax"))
    val est = (col("pmax") / lit(127.0)) * (col("qpmax") / lit(127.0)) *
      VectorOps.dotInt(
        pdimChecked(col("pcode"), pdim, "probeMatryoshkaSq8Index: stored pcode"),
        col("qpcode")).cast("double")
    val cand = ivfProbes(queries.select(col("qid"), col("qvec")), "qid",
        "qvec", centroids, nprobe)
      .join(lists, "cid")
      .join(broadcast(q), "qid")
      .withColumn("est", est)
      .select(col("qid"), col("id"), col("est"))
    rankTopKPerQuery(cand, k, "est")
  }

  /** Compound top-k with exact refinement: integer-prefix-dot-rank the
    * probed lists, shortlist `refine` per query, exact full-dim cosine
    * re-rank only those — [[ivfSq8TopK]]'s dataflow at an 8x list-byte
    * cut. Same nonzero-norm precondition; same bucketed-corpus advice. */
  def ivfMatryoshkaSq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[(Long, Array[Float])], pdim: Int, nprobe: Int,
      refine: Int): DataFrame = {
    require(refine >= k,
      s"ivfMatryoshkaSq8TopK: refine ($refine) must be >= k ($k)")
    val lists = ivfMatryoshkaSq8Assignments(
      corpus.select(col("id"), col("vec")), "id", "vec", centroids, pdim)
    val shortlist = probeMatryoshkaSq8Index(lists, queries, refine,
        centroids, pdim, nprobe)
      .select("qid", "id")
    val scored = shortlist
      .join(broadcast(queries.withColumn("qnrm", VectorOps.norm(col("qvec")))),
        "qid")
      .join(corpus.withColumn("nrm", VectorOps.norm(col("vec"))), "id")
      .withColumn("score",
        VectorOps.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
    rankTopKPerQuery(scored, k, "score")
  }

  // ---- IVF x SQ8 composed index -------------------------------------------

  /**
   * IVF x SQ8 inverted lists: (cid, id, code, cmax) rows — the middle
   * point between [[ivfProbes]]' raw-vector lists (dim·4 B per entry) and
   * [[ivfPqAssignments]]' m-byte PQ codes. SQ8 keeps ~7.9 effective
   * bits/dim (near-exact dot estimates — recall ≈ 1 at shallow refines,
   * where PQ at the same fixture needs a 50-deep one) for a 4× cut in
   * list bytes, and a probe still never touches a raw vector until the
   * final refine. One narrow codegen projection per vector, no shuffle;
   * at rest bucket the lists by `cid` like the PQ layout.
   *
   * `hierWprobe` is the same two-level coarse-pick dial as
   * [[ivfPqAssignments]]' (bit-identical at w >= the group count).
   */
  def ivfSq8Assignments(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])],
      hierWprobe: Option[Int] = None): DataFrame = {
    val cid = hierWprobe match {
      case Some(w) =>
        element_at(probeCidsHier(col(vecCol), centroids, 1, w), 1)
      case None => nearestCid(col(vecCol), centroids)
    }
    vecs.select(cid.as("cid"), col(idCol).as("id"),
      VectorOps.quantizeInt8(col(vecCol)).as("code"),
      VectorOps.maxAbs(col(vecCol)).as("cmax"))
  }

  /**
   * Query top-k against a MATERIALIZED IVF x SQ8 index
   * ([[ivfSq8Assignments]] rows): probe `nprobe` lists, rank candidates
   * by the scaled integer-dot estimate (exact BIGINT Σ — the
   * [[sq8TopK]] arithmetic), no raw vector touched. Returns
   * (qid, id, rank, est).
   */
  def probeSq8Index(lists: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[(Long, Array[Float])], nprobe: Int): DataFrame = {
    val q = queries.select(col("qid"),
      VectorOps.quantizeInt8(col("qvec")).as("qcode"),
      VectorOps.maxAbs(col("qvec")).as("qmax"))
    val est = (col("cmax") / lit(127.0)) * (col("qmax") / lit(127.0)) *
      VectorOps.dotInt(col("code"), col("qcode")).cast("double")
    val cand = ivfProbes(queries.select(col("qid"), col("qvec")), "qid",
        "qvec", centroids, nprobe)
      .join(lists, "cid")
      .join(broadcast(q), "qid")
      .withColumn("est", est)
      .select(col("qid"), col("id"), col("est"))
    rankTopKPerQuery(cand, k, "est")
  }

  /**
   * IVF x SQ8 top-k with exact refinement: integer-dot-rank the probed
   * lists' code rows, shortlist `refine` per query, exact-cosine re-rank
   * only those — [[ivfPqTopK]]'s dataflow with the SQ8 payload. Same
   * nonzero-norm precondition; same bucketed-corpus refine advice.
   */
  def ivfSq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[(Long, Array[Float])], nprobe: Int,
      refine: Int): DataFrame = {
    require(refine >= k, s"ivfSq8TopK: refine ($refine) must be >= k ($k)")
    val lists = ivfSq8Assignments(corpus.select(col("id"), col("vec")),
      "id", "vec", centroids)
    val shortlist = probeSq8Index(lists, queries, refine, centroids, nprobe)
      .select("qid", "id")
    val scored = shortlist
      .join(broadcast(queries.withColumn("qnrm", VectorOps.norm(col("qvec")))),
        "qid")
      .join(corpus.withColumn("nrm", VectorOps.norm(col("vec"))), "id")
      .withColumn("score",
        VectorOps.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
    rankTopKPerQuery(scored, k, "score")
  }

  // ---- Filtered (predicate-aware) ANN serving -------------------------------

  /**
   * [[ivfAssignments]] that CARRY filterable attribute columns:
   * (cid, id, vec, attrs...) — the attribute-carrying index layout that
   * makes "top-k WHERE lang = 'en' AND date > X" a PRE-filter (predicate
   * evaluated inside the probed lists, before any ranking or trimming)
   * instead of a post-filter over an already-trimmed shortlist. One
   * narrow projection; at rest bucket by cid like every list layout —
   * the attribute bytes ride the same partition as the payload they
   * qualify, so the filtered probe stays a co-located scan.
   */
  /** Column names the filtered-ANN dataflow owns internally — an
    * attribute with one of these names would silently corrupt the
    * probe join / ranking instead of erroring, so attrs must be
    * disjoint (rename on the way in). */
  private val filteredAnnReserved =
    Set("cid", "id", "vec", "qid", "qvec", "est", "score", "qnrm", "nrm",
      "code", "cmax", "qcode", "qmax", "m", "pos", "col", "bv")

  private def requireAttrsDisjoint(attrCols: Seq[String], who: String): Unit = {
    val clash = attrCols.filter(filteredAnnReserved.contains)
    require(clash.isEmpty,
      s"$who: attribute column(s) ${clash.mkString(", ")} collide with " +
        s"internal names (${filteredAnnReserved.toSeq.sorted.mkString(", ")})" +
        " — rename them before indexing")
  }

  def ivfAssignmentsWithAttrs(vecs: DataFrame, idCol: String,
      vecCol: String, centroids: Seq[(Long, Array[Float])],
      attrCols: Seq[String]): DataFrame = {
    requireAttrsDisjoint(attrCols, "ivfAssignmentsWithAttrs")
    vecs.select(nearestCid(col(vecCol), centroids).as("cid") +:
      col(idCol).as("id") +: col(vecCol).as("vec") +:
      attrCols.map(col): _*)
  }

  /**
   * Predicate-aware top-k against a MATERIALIZED attribute-carrying
   * index ([[ivfAssignmentsWithAttrs]] rows): probe `nprobe` lists,
   * apply `predicate` to the candidates FIRST, exact-cosine rank the
   * survivors, heap top-k. Because the filter runs before the trim,
   * the answer is k MATCHING rows whenever the probed lists hold >= k
   * matches — the pre-filter recall contract (a post-filter over a
   * k-deep unfiltered shortlist returns however many of those k happen
   * to match: strictly worse, possibly zero on selective predicates).
   *
   * Recall semantics: at nprobe = |centroids| the probe covers every
   * list and the output is BIT-IDENTICAL to
   * [[bruteForceTopK]](corpus.where(predicate)) (FilteredAnnSpec pins
   * it); below that, misses come only from the query's unprobed lists —
   * the same dial as the unfiltered [[probeIndex]], unchanged by filter
   * selectivity.
   */
  def probeIndexFiltered(lists: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[(Long, Array[Float])], nprobe: Int,
      predicate: Column): DataFrame = {
    val probes = ivfProbes(queries.select(col("qid"), col("qvec")), "qid",
      "qvec", centroids, nprobe)
    val scored = probes.join(lists, "cid")
      .where(predicate) // PRE-filter: before ranking, before any trim
      .join(broadcast(queries.withColumn("qnrm", VectorOps.norm(col("qvec")))),
        "qid")
      .withColumn("score", VectorOps.dot(col("qvec"), col("vec")) /
        (col("qnrm") * VectorOps.norm(col("vec"))))
    rankTopKPerQuery(scored, k, "score")
  }

  /** One-shot filtered IVF top-k: builds the attribute-carrying lists
    * from `corpus` (every non-(id, vec) column rides along as a
    * filterable attribute) and serves [[probeIndexFiltered]]. */
  def ivfFilteredTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[(Long, Array[Float])], nprobe: Int,
      predicate: Column): DataFrame = {
    val attrs = corpus.columns.filterNot(Set("id", "vec")).toSeq
    val lists = ivfAssignmentsWithAttrs(corpus, "id", "vec", centroids, attrs)
    probeIndexFiltered(lists, queries, k, centroids, nprobe, predicate)
  }

  /**
   * Filtered top-k on the COMPRESSED (SQ8) index — the shape where the
   * pre-filter contract really matters: the coarse pass ranks int8 code
   * estimates and keeps only a `refine`-deep shortlist, so the predicate
   * MUST be applied before that trim ("refine counted AFTER the filter")
   * or selective predicates starve the exact re-rank below k survivors.
   * Dataflow: probe `nprobe` lists of (cid, id, code, cmax, attrs...)
   * rows, filter, integer-dot rank the SURVIVORS, shortlist `refine` per
   * query, exact full-dim cosine re-rank against corpus storage. At
   * nprobe = |centroids| and refine >= the filtered candidate count the
   * output is bit-identical to [[bruteForceTopK]] over the filtered
   * corpus (FilteredAnnSpec).
   */
  /** The attribute-carrying SQ8 list layout [[ivfSq8FilteredTopK]]
    * builds — (cid, id, code, cmax, attrs...) — exposed so serving
    * deployments (and probe-only benchmarks) can MATERIALIZE it once
    * and pay only [[probeSq8IndexFiltered]] per query batch. */
  def ivfSq8AssignmentsWithAttrs(corpus: DataFrame,
      centroids: Seq[(Long, Array[Float])]): DataFrame = {
    val attrs = corpus.columns.filterNot(Set("id", "vec")).toSeq
    requireAttrsDisjoint(attrs, "ivfSq8AssignmentsWithAttrs")
    corpus.select(
      nearestCid(col("vec"), centroids).as("cid") +: col("id") +:
        VectorOps.quantizeInt8(col("vec")).as("code") +:
        VectorOps.maxAbs(col("vec")).as("cmax") +: attrs.map(col): _*)
  }

  /** Filtered SQ8 probe against a MATERIALIZED attribute-carrying list
    * table ([[ivfSq8AssignmentsWithAttrs]] rows): the serving half of
    * [[ivfSq8FilteredTopK]] — predicate INSIDE the probed lists, refine
    * counts filtered candidates, exact re-rank reads raw vectors from
    * `corpusVecs` (id, vec). */
  def probeSq8IndexFiltered(lists: DataFrame, corpusVecs: DataFrame,
      queries: DataFrame, k: Int, centroids: Seq[(Long, Array[Float])],
      nprobe: Int, refine: Int, predicate: Column): DataFrame = {
    require(refine >= k,
      s"probeSq8IndexFiltered: refine ($refine) must be >= k ($k)")
    val q = queries.select(col("qid"),
      VectorOps.quantizeInt8(col("qvec")).as("qcode"),
      VectorOps.maxAbs(col("qvec")).as("qmax"))
    val est = (col("cmax") / lit(127.0)) * (col("qmax") / lit(127.0)) *
      VectorOps.dotInt(col("code"), col("qcode")).cast("double")
    val cand = ivfProbes(queries.select(col("qid"), col("qvec")), "qid",
        "qvec", centroids, nprobe)
      .join(lists, "cid")
      .where(predicate) // PRE-filter: refine counts FILTERED candidates
      .join(broadcast(q), "qid")
      .withColumn("est", est)
      .select(col("qid"), col("id"), col("est"))
    val shortlist = TopK.perKey(cand, Seq(col("qid")),
        Seq(col("est").desc, col("id")), refine)
      .select("qid", "id")
    val scored = shortlist
      .join(broadcast(queries.withColumn("qnrm", VectorOps.norm(col("qvec")))),
        "qid")
      .join(corpusVecs.select(col("id"), col("vec"))
        .withColumn("nrm", VectorOps.norm(col("vec"))), "id")
      .withColumn("score",
        VectorOps.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
    rankTopKPerQuery(scored, k, "score")
  }

  def ivfSq8FilteredTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[(Long, Array[Float])], nprobe: Int, refine: Int,
      predicate: Column): DataFrame =
    probeSq8IndexFiltered(ivfSq8AssignmentsWithAttrs(corpus, centroids),
      corpus.select(col("id"), col("vec")), queries, k, centroids, nprobe,
      refine, predicate)

  /**
   * Filtered top-k on the IVF x PQ index — the [[ivfSq8FilteredTopK]]
   * contract on the PQ path: the predicate is applied to the probed
   * lists BEFORE the ADC estimate and its `refine`-deep trim, so the
   * shortlist counts FILTERED candidates and a selective predicate can
   * never starve the exact re-rank below k survivors the probed lists
   * hold. At-rest layout: the PQ code rows stay attribute-FREE ((cid,
   * id, m, code) — ~m bytes/vector, the billion-vector shape), and the
   * attributes live once per id in a (cid, id, attrs...) sidecar sharing
   * the cid bucketing, so filtering costs one co-located membership
   * join, not m copies of every attribute byte.
   *
   * Dataflow: probes x attr-sidecar (equi-join on cid) -> predicate ->
   * allowed (qid, id) pairs; code rows join `allowed` on id (bucketed at
   * rest, co-locates); ADC-rank the survivors via the broadcast LUT;
   * `refine`-deep shortlist; exact cosine re-rank reads `refine` raw
   * vectors per query. At nprobe = |centroids| and refine >= the
   * filtered candidate count the output is bit-identical to
   * [[bruteForceTopK]] over the filtered corpus (FilteredAnnSpec).
   */
  def ivfPqFilteredTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Seq[(Long, Array[Float])],
      codebooks: Seq[Seq[(Long, Array[Float])]], subDim: Int,
      nprobe: Int, refine: Int, predicate: Column): DataFrame = {
    require(refine >= k,
      s"ivfPqFilteredTopK: refine ($refine) must be >= k ($k)")
    val attrs = corpus.columns.filterNot(Set("id", "vec")).toSeq
    requireAttrsDisjoint(attrs, "ivfPqFilteredTopK")
    // One coarse assignment feeds both layouts.
    val assigned = ivfAssignmentsWithAttrs(corpus, "id", "vec", centroids,
      attrs)
    val lists = assigned
      .select(col("cid"), col("id"),
        posexplode(pqEncodeCol(col("vec"), codebooks, subDim)))
      .select(col("cid"), col("id"), col("pos").cast("long").as("m"),
        col("col").as("code"))
    val attrTable = assigned.drop("vec")
    val allowed = ivfProbes(queries.select(col("qid"), col("qvec")), "qid",
        "qvec", centroids, nprobe)
      .join(attrTable, "cid")
      .where(predicate) // PRE-filter: before the estimate, before any trim
      .select("qid", "id")
    val cand = allowed
      .join(lists.select(col("id"), col("m"), col("code").as("cid")), "id")
    val est = adcEstimate(cand, adcLut(queries, codebooks, subDim),
      codebooks.length, Seq("qid", "m", "cid"))
    val shortlist = TopK.perKey(est, Seq(col("qid")),
        Seq(col("est").desc, col("id")), refine)
      .select("qid", "id")
    val scored = shortlist
      .join(broadcast(queries.withColumn("qnrm", VectorOps.norm(col("qvec")))),
        "qid")
      .join(corpus.select(col("id"), col("vec"))
        .withColumn("nrm", VectorOps.norm(col("vec"))), "id")
      .withColumn("score",
        VectorOps.dot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
    rankTopKPerQuery(scored, k, "score")
  }
}
