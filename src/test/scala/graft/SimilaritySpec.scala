package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends GraftSuite {
  private val dir = SparkTestBase.sf001
  private lazy val emb = Tables.load(spark, dir, "embeddings")
  private lazy val queries = emb.where(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private lazy val corpus = emb.where(col("vec_id") >= 10)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("randomProject preserves pairwise squared distances in expectation (JL)") {
    // Reduce 64d -> 16d; over many pairs the mean ratio of projected to
    // original squared distance must sit near 1 (single-pair distortion
    // ~1/sqrt(16) = 25%, but the MEAN over ~100 pairs concentrates hard).
    val reduced = Similarity.randomProject(emb, "vec_id", "embedding", 16)
      .groupBy("vec_id").agg(array_sort(collect_list(
        struct(col("j"), col("y")))).as("ys"))
      .select(col("vec_id"), transform(col("ys"), s => s.getField("y")).as("y"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    val orig = emb.where(col("vec_id") < 30)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      (ia, va) <- orig; (ib, vb) <- orig if ia < ib
      d0 = sq(va, vb) if d0 > 1e-9
    } yield sq(reduced(ia), reduced(ib)) / d0
    val mean = ratios.sum / ratios.length
    assert(ratios.length > 100)
    assert(mean > 0.85 && mean < 1.15, s"mean distance ratio $mean")
  }

  test("trainTopPCs recovers a planted dominant axis; deterministic across partitioning") {
    import spark.implicits._
    // Planted anisotropy in 8d: coordinate 2 has 10x the spread of the
    // rest (deterministic pseudo-noise from index arithmetic, no RNG).
    def noise(i: Int, j: Int): Float = (((i * 31 + j * 17) % 11) - 5) / 50.0f
    val rows = (0 until 200).map { i =>
      val v = Array.tabulate(8)((j: Int) => noise(i, j))
      v(2) = v(2) + (i % 21 - 10) / 5.0f
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val dirs = Similarity.trainTopPCs(rows, "embedding", 8, 2)
    assert(math.abs(dirs(0)(2)) > 0.95,
      s"top PC should align with axis 2, got ${dirs(0).mkString(",")}")
    assert(math.abs(1.0 - math.sqrt(dirs(0).map(x => x * x).sum)) < 1e-9)
    assert(math.abs(dirs(0).zip(dirs(1)).map { case (a, b) => a * b }.sum) < 1e-6)
    // exact scaled-integer gram sums => identical under repartitioning
    val again = Similarity.trainTopPCs(rows.repartition(13), "embedding", 8, 2)
    assert(dirs(0).toSeq == again(0).toSeq && dirs(1).toSeq == again(1).toSeq)
  }

  test("hardNegativesTopK: every mined negative has a different label") {
    val e = Tables.load(spark, dir, "embeddings")
    val c = e.where(col("vec_id") >= 10).select(col("vec_id").as("id"),
      col("embedding").as("vec"), col("label"))
    val q = e.where(col("vec_id") < 10).select(col("vec_id").as("qid"),
      col("embedding").as("qvec"), col("label").as("qlabel"))
    val negs = graft.operators.Similarity.hardNegativesTopK(c, q, 5)
    assert(negs.count() == 50) // 10 queries x 5
    val labels = e.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    negs.select("qid", "id").collect().foreach { r =>
      assert(labels(r.getLong(0)) != labels(r.getLong(1)),
        s"negative ${r.getLong(1)} shares label with query ${r.getLong(0)}")
    }
    // hard negatives rank BELOW the same-label nearest hit only if that
    // hit is nearer — i.e. scores are the max over the different-label
    // subset: spot-check against brute force restricted by label.
    val brute = graft.operators.Similarity.bruteForceTopK(c, q, 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val got = negs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    got.foreach { case (qid, id, s) =>
      assert(math.abs(brute((qid, id)) - s) < 1e-9)
    }
  }

  test("brute-force top-k: k rows per query, ranks 1..k, scores descending") {
    val tk = Similarity.bruteForceTopK(corpus, queries, 10).collect()
    assert(tk.length == 100) // 10 queries x 10
    tk.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(2))
      assert(byRank.map(_.getLong(2)).toSeq == (1L to 10L))
      val scores = byRank.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("scores are valid cosines in [-1, 1]") {
    val s = Similarity.bruteForceTopK(corpus, queries, 5)
      .agg(min("score"), max("score")).collect()(0)
    assert(s.getDouble(0) >= -1.0 - 1e-9 && s.getDouble(1) <= 1.0 + 1e-9)
  }

  test("LSH hard negatives: recall vs brute >= the lshTopK bar; labels differ; subset scores exact") {
    val e = Tables.load(spark, dir, "embeddings")
    val c = e.where(col("vec_id") >= 10).select(col("vec_id").as("id"),
      col("embedding").as("vec"), col("label"))
    val q = e.where(col("vec_id") < 10).select(col("vec_id").as("qid"),
      col("embedding").as("qvec"), col("label").as("qlabel"))
    val truth = graft.operators.Similarity.hardNegativesTopK(c, q, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.operators.Similarity.hardNegativesTopKLsh(c, q, 5)
    val got = lsh.collect()
    val pairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(pairs).size.toDouble / truth.size
    // Same bar the plain ANN path (lshTopK vs bruteForceTopK) is held to.
    assert(recall > 0.6, s"hard-negative recall@5 = $recall")
    // Every mined negative carries a different label than its query.
    val labels = e.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    pairs.foreach { case (qid, id) =>
      assert(labels(qid) != labels(id), s"negative $id shares label with $qid")
    }
    // Scores of returned pairs are the exact cosines (brute agrees).
    val brute = graft.operators.Similarity.bruteForceTopK(c, q, 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    got.foreach(r => assert(math.abs(
      brute((r.getLong(0), r.getLong(1))) - r.getDouble(3)) < 1e-9))
    // Candidate join shape: no all-pairs nested loop anywhere in the plan.
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"must stay an equi-join:\n$plan")
  }

  test("LSH ANN recall@5 vs brute force is useful (> 0.6 with 8x3-bit tables)") {
    val truth = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.lshTopK(corpus, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(ann).size.toDouble / truth.size
    assert(recall > 0.6, s"recall@5 = $recall")
    // ANN returns only true cosine-ranked candidates, never junk ranks.
    assert(ann.nonEmpty)
  }

  test("more tables -> recall does not decrease") {
    val truth = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(tables: Int): Double = {
      val ann = Similarity.lshTopK(corpus, queries, 5, numTables = tables)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.intersect(ann).size.toDouble / truth.size
    }
    assert(recall(4) >= recall(1) - 1e-9)
  }

  test("brute-force plan broadcasts the query side (no corpus shuffle join)") {
    val plan = Similarity.bruteForceTopK(corpus, queries, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"queries must broadcast:\n$plan")
  }

  test("IVF: probing more lists does not lose recall; full probe == brute force") {
    val centroids = emb.where(col("vec_id") < 16).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val truth = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nprobe: Int): Double = {
      val got = Similarity.ivfTopK(corpus, queries, 5, centroids, nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    assert(recall(4) >= recall(1) - 1e-9)
    // Probing every list degenerates to exact search.
    assert(recall(16) == 1.0)
  }

  test("planesForOccupancy keeps mean bucket occupancy near target as N grows") {
    // Pure-function shape: doubling the corpus adds one plane (halving
    // per-bucket share), so expected occupancy n / 2^planes stays within
    // [target/2, target] (up to the clamp).
    for (n <- Seq(1000L, 10000L, 1000000L, 1000000000L)) {
      val p = Similarity.planesForOccupancy(n, 64)
      val occ = n.toDouble / (1L << p)
      assert(occ <= 64.0 + 1e-9 && occ >= 32.0 - 1e-9, s"n=$n p=$p occ=$occ")
    }
    assert(Similarity.planesForOccupancy(10, 64) == 1, "clamped low")
    // Measured occupancy on the fixture: auto planes keep the mean bucket
    // near the target where the fixed fixture config (3 planes = 8
    // buckets) would overfill at larger N.
    val n = emb.count()
    val p = Similarity.planesForOccupancy(n, 64)
    val occ = Similarity.lshCodes(emb, "vec_id", "embedding", numPlanes = p)
      .groupBy("tbl", "code").count()
      .agg(avg("count")).collect()(0).getDouble(0)
    assert(occ < 3 * 64.0, s"mean measured occupancy $occ far above target")
  }

  test("trained k-means centroids: recall >= lowest-id seed centroids") {
    val truth = Similarity.bruteForceTopK(corpus, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(cents: Seq[(Long, Array[Float])]): Double = {
      val got = Similarity.ivfTopK(corpus, queries, 5, cents, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    val seed = corpus.orderBy("id").limit(16).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val trained = Similarity.trainKMeans(corpus, "id", "vec", 16, 64, 2)
    assert(trained.size == 16, "no cluster may empty out on this fixture")
    val (rSeed, rTrained) = (recall(seed), recall(trained))
    assert(rTrained >= rSeed - 1e-9,
      s"trained recall $rTrained < seed recall $rSeed")
  }

  test("k-means training is deterministic and improves within-cluster cost") {
    def cost(cents: Seq[(Long, Array[Float])]): Double = {
      // Mean best-centroid cosine over the corpus (higher = tighter).
      val entries = cents.map { case (_, cv) =>
        val n = math.sqrt(cv.foldLeft(0.0)((a, f) => a + f.toDouble * f))
        graft.operators.VectorOps.dot(col("vec"), typedLit(cv.toSeq)) /
          (graft.operators.VectorOps.norm(col("vec")) * lit(n))
      }
      corpus.select(greatest(entries: _*).as("best"))
        .agg(avg("best")).collect()(0).getDouble(0)
    }
    val t1 = Similarity.trainKMeans(corpus, "id", "vec", 16, 64, 2)
    val t2 = Similarity.trainKMeans(corpus, "id", "vec", 16, 64, 2)
    assert(t1.map(_._1) == t2.map(_._1))
    assert(t1.zip(t2).forall { case ((_, a), (_, b)) => a.sameElements(b) },
      "two training runs must produce bit-identical centroids")
    val seed = corpus.orderBy("id").limit(16).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    assert(cost(t1) >= cost(seed) - 1e-9,
      "Lloyd rounds must not worsen mean best-centroid cosine")
  }

  test("LSH near-dup pairs are a subset of brute force with useful recall") {
    import graft.operators.Dedup
    val brute = Dedup.embeddingNearDuplicates(emb, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearDuplicates(emb, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "exact refilter must never emit a false pair")
    assert(brute.isEmpty || lsh.size >= brute.size / 2,
      s"recall too low: ${lsh.size}/${brute.size}")
  }

  test("SrpCodes loop expression is bit-identical to the unrolled srpCode form") {
    // srpCode (the declarative per-table column) stays as the REFERENCE
    // implementation: the loop expression must match it code-for-code on
    // every (vector, table) — this is what licenses swapping it into all
    // LSH call sites (and into the oracle contract) without re-deriving
    // the DuckDB replay.
    import org.apache.spark.sql.functions._
    val ps = Similarity.planes(8, 3, 64, 42)
    val unrolled = emb.select(col("vec_id"),
        posexplode(array((0 until 8).map(t =>
          Similarity.srpCode(col("embedding"), ps(t))): _*)))
      .select(col("vec_id"), col("pos").cast("long").as("tbl"),
        col("col").as("code"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val looped = Similarity.lshCodes(emb, "vec_id", "embedding", 8, 3, 42)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(looped == unrolled)
  }

  test("auto dial resolves to the fixed gate's config at the fixture size") {
    // The sim_lsh_neardup_auto oracle REUSES the fixed gate's SQL, valid
    // only while auto(n=500) == (8 tables, 3 planes). Pin it here so a
    // fixture resize breaks this spec loudly instead of the oracle
    // silently.
    assert(Similarity.planesForOccupancy(500, 64) == 3)
    assert(Similarity.tablesForRecall(0.45, 3, 0.92) == 8)
    // Exact-ratio robustness: recall exactly 1-(1-p^b)^T must give T,
    // not T+1 (the epsilon guard's job).
    val p = 1.0 - math.acos(0.45) / math.Pi
    val r8 = 1.0 - math.pow(1.0 - math.pow(p, 3), 8)
    assert(Similarity.tablesForRecall(0.45, 3, r8) == 8)
  }

  test("hot-bucket split: planted exact-duplicate flood, pairs identical") {
    // A pre-cleaning web corpus's worst case: a large cluster of
    // IDENTICAL vectors shares every bucket of every table, so without
    // the guard one flatMapGroups group buffers the whole flood. With
    // maxBucket=50 a 260-row flood splits into ceil(260/50)=6 salt
    // classes (~43 rows each, cells <= ~90 rows) yet the triangle-cell
    // enumeration must emit EXACTLY the pairs the unguarded run does.
    import spark.implicits._
    val base = emb.limit(40).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val floodVec = base.head._2
    val flood = (1000L until 1260L).map(i => (i, floodVec.clone()))
    val df = (base ++ flood).toSeq.toDF("vec_id", "embedding")
    def pairs(cap: Long) = Similarity.lshNearDuplicates(
        df, "vec_id", "embedding", 0.45, maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val guarded = pairs(50L)
    val unguarded = pairs(1L << 40) // cap far above any bucket: no split
    assert(guarded == unguarded,
      s"split changed the pair set: ${guarded.size} vs ${unguarded.size}")
    // The flood itself must be fully paired (identical vectors, cosine 1).
    val floodPairs = guarded.filter { case (a, b) => a >= 1000L && b >= 1000L }
    assert(floodPairs.size == 260 * 259 / 2,
      s"flood pairs incomplete: ${floodPairs.size}")
  }

  test("hot-bucket split fails fast when duplicate ids defeat the salt") {
    // Rows sharing ONE id all hash to the same salt class, so no split
    // can spread them: the operator must throw with the offending cell's
    // size, not OOM silently at scale.
    import spark.implicits._
    val v = emb.limit(1).collect().head.getSeq[Float](1).toArray
    val df = (0 until 250).map(_ => (7L, v.clone()))
      .toDF("vec_id", "embedding")
    val ex = intercept[org.apache.spark.SparkException] {
      Similarity.lshNearDuplicates(df, "vec_id", "embedding", 0.45,
        maxBucket = 50L).collect()
    }
    def rootMsg(t: Throwable): String =
      if (t.getCause == null) String.valueOf(t.getMessage)
      else rootMsg(t.getCause) + String.valueOf(t.getMessage)
    assert(rootMsg(ex).contains("duplicate ids") ||
      ex.getMessage.contains("duplicate ids"),
      s"wrong failure: ${ex.getMessage.take(300)}")
  }

  test("lshAutoConfig: tables budget turns the n^rho table cliff into a dial") {
    // Unbudgeted, occupancy-tracking planes at n=1e9 demand ~74k tables
    // for recall 0.92 at threshold 0.45 — a multi-hundred-MB plane
    // literal per task. The joint solve must land planes where the
    // budget is feasible and never exceed it.
    val (p9, t9) = Similarity.lshAutoConfig(1000000000L, 0.45)
    assert(t9 <= 128, s"tables over budget: $t9")
    assert(p9 == 9, s"expected 9 planes at n=1e9 under a 128-table budget, got $p9")
    // plane literal stays task-shippable: tables x planes x dim floats
    assert(t9 * p9 * 64 * 4 < 2 * 1024 * 1024, "plane literal over 2 MB")
    // And the recall identity holds at the solved config: 1-(1-q^p)^T >= 0.92.
    val q = 1.0 - math.acos(0.45) / math.Pi
    assert(1.0 - math.pow(1.0 - math.pow(q, p9), t9) >= 0.92)
    // Small corpora are untouched by the budget: fixture resolution pins.
    assert(Similarity.lshAutoConfig(500L, 0.45) == (3, 8))
  }

  test("lshNearDuplicates: duplicate ids never emit a self-pair") {
    // The bucket-local loop must mirror the join form's STRICT id < id:
    // two rows sharing an id land adjacent in the same bucket with
    // cosine ~1.0, and a self-edge would poison cluster resolution.
    import spark.implicits._
    val base = emb.limit(4).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val withDup = (base ++ Array((base.head._1, base.head._2.clone())))
      .toSeq.toDF("vec_id", "embedding")
    val pairs = Similarity.lshNearDuplicates(
        withDup, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => a != b },
      s"self-pair emitted: ${pairs.mkString(", ")}")
  }

  test("IVF x PQ: refine >= pool size makes ivfPqTopK equal ivfTopK exactly") {
    // At equal (centroids, nprobe) the two operators see the SAME probed
    // candidate pool; once the ADC shortlist covers the whole pool the
    // exact re-rank is ivfTopK's scoring verbatim — outputs must match
    // bit-for-bit (same dot/(|q||v|) arithmetic, same tie order).
    val centroids = Similarity.trainKMeans(corpus, "id", "vec", 16, 64, 2)
    val books = Similarity.trainPQ(corpus, "id", "vec", 32, 2, 16, 5)
    val poolCeil = corpus.count().toInt // refine can never trim below this
    val viaPq = Similarity.ivfPqTopK(corpus, queries, 5, centroids, books,
        2, 3, poolCeil)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val viaIvf = Similarity.ivfTopK(corpus, queries, 5, centroids, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(viaPq == viaIvf)
  }

  test("IVF x PQ: refine=50 holds recall against ivfTopK at equal nprobe") {
    // The production shape: a small exact re-rank budget. The ADC
    // shortlist must surface (nearly) all of the exact pool top-5 —
    // recall vs ivfTopK's answer is the bar the scaladoc promises.
    val centroids = Similarity.trainKMeans(corpus, "id", "vec", 16, 64, 2)
    val books = Similarity.trainPQ(corpus, "id", "vec", 32, 2, 16, 5)
    val ivf = Similarity.ivfTopK(corpus, queries, 5, centroids, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.ivfPqTopK(corpus, queries, 5, centroids, books,
        2, 3, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(pq).size.toDouble / ivf.size
    assert(recall >= 0.8, s"ivfPqTopK recall vs ivfTopK: $recall")
  }

  test("IVF x PQ probe path moves only code rows (LUT broadcast, no vectors)") {
    val centroids = Similarity.trainKMeans(corpus, "id", "vec", 16, 64, 2)
    val books = Similarity.trainPQ(corpus, "id", "vec", 32, 2, 16, 5)
    val lists = Similarity.ivfPqAssignments(corpus, "id", "vec", centroids,
      books, 2)
    // The index never holds a vector column at all — the probe path is
    // structurally incapable of shipping one.
    assert(lists.columns.toSeq == Seq("cid", "id", "m", "code"))
    val probed = Similarity.probePqIndex(lists, queries, 5, centroids,
      books, 2, 3)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"ADC LUT must broadcast:\n$plan")
    assert(probed.count() > 0)
  }

  test("int8 quantization: values bounded, max-magnitude element hits +-127") {
    import graft.operators.VectorOps
    val q = emb.select(col("vec_id"),
      VectorOps.quantizeInt8(col("embedding")).as("q"))
    val bad = q.where(exists(col("q"), x => abs(x) > 127)).count()
    assert(bad == 0)
    val noPeak = q.where(!exists(col("q"), x => abs(x) === 127)).count()
    assert(noPeak == 0, "every vector's max-|x| element must quantize to 127")
  }

  test("codegen quantizeInt8 == HOF form; zero vector fails fast") {
    import graft.operators.VectorOps
    val diff = emb.where(
      VectorOps.quantizeInt8(col("embedding")) =!=
        VectorOps.quantizeInt8Hof(col("embedding"))).count()
    assert(diff == 0)
    import spark.implicits._
    val zero = Seq(Array.fill(4)(0.0f)).toDF("embedding")
    val e = intercept[Exception] {
      zero.select(VectorOps.quantizeInt8(col("embedding"))).collect()
    }
    assert(e.getMessage != null)
  }
}
