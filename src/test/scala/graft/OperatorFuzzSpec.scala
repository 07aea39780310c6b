package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Joins, Sketches, TopK}

/**
 * Operator-level differential fuzzing — the reference's purpose (random
 * data for engine testing, `/root/reference/Cargo.toml:5`) closed on
 * this engine's own operators: every property generates seeded random
 * inputs with [[TableGen]] and checks an optimized operator against an
 * INDEPENDENT formulation of the same semantics (aggregate vs window,
 * binned equi-join vs brute cross product, capped two-pass vs full
 * shuffle). Three seeds per property; any row diff fails with the seed
 * in the message.
 */
class OperatorFuzzSpec extends GraftSuite {

  private val seeds = Seq(11L, 42L, 1337L)

  private def same(a: DataFrame, b: DataFrame, what: String): Unit = {
    val extra = a.exceptAll(b).count()
    val missing = b.exceptAll(a).count()
    assert(extra == 0 && missing == 0,
      s"$what: +$extra unexpected / -$missing missing rows")
  }

  private def leftEvents(seed: Long) = TableGen.table(spark, 2000L, seed,
    "lid" -> Gen.SeqId,
    "key" -> Gen.Int64Uniform(0, 20),
    "lts" -> Gen.TimestampUniform("2024-01-01 00:00:00",
      "2024-01-08 00:00:00"))

  private def rightEvents(seed: Long) = TableGen.table(spark, 1500L, seed,
    "rid" -> Gen.SeqId,
    "key" -> Gen.Int64Uniform(0, 20),
    "rts" -> Gen.TimestampUniform("2024-01-01 00:00:00",
      "2024-01-08 00:00:00"),
    "v" -> Gen.Int64Uniform(0, 1000))

  test("asof joins match a max_by/min_by aggregate formulation") {
    for (seed <- seeds; tolMs <- Seq(-1L, 6L * 3600 * 1000)) {
      val l = leftEvents(seed)
      val r = rightEvents(seed + 7)
      def brute(backward: Boolean): DataFrame = {
        val time =
          if (backward) {
            val base = col("rts") <= col("lts")
            if (tolMs >= 0) base &&
              col("rts") >= col("lts") - expr(s"INTERVAL $tolMs MILLISECOND")
            else base
          } else {
            val base = col("rts") >= col("lts")
            if (tolMs >= 0) base &&
              col("rts") <= col("lts") + expr(s"INTERVAL $tolMs MILLISECOND")
            else base
          }
        val pick =
          if (backward) max_by(struct(col("rts"), col("v")),
            struct(col("rts"), col("rid")))
          else min_by(struct(col("rts"), col("v")),
            struct(col("rts"), col("rid")))
        val best = l.join(r, Seq("key")).where(time)
          .groupBy("lid").agg(pick.as("m"))
          .select(col("lid"), col("m.rts").as("asof_ts"),
            col("m.v").as("r_v"))
        l.select("lid").join(best, Seq("lid"), "left")
      }
      val opB = Joins.asofBackward(l, r, Seq("key"), "lts", "rts", "lid",
          Seq("v"), tolMs, Seq("rid"))
        .select(col("lid"), col("asof_ts"), col("r_v"))
      same(opB, brute(backward = true), s"asofBackward seed=$seed tol=$tolMs")
      val opF = Joins.asofForward(l, r, Seq("key"), "lts", "rts", "lid",
          Seq("v"), tolMs, Seq("rid"))
        .select(col("lid"), col("asof_ts"), col("r_v"))
      same(opF, brute(backward = false), s"asofForward seed=$seed tol=$tolMs")
    }
  }

  test("TopKPerKey physical operator matches the window-rank formulation") {
    for (seed <- seeds) {
      val df = TableGen.table(spark, 3000L, seed,
        "id" -> Gen.SeqId,
        "g" -> Gen.Int64Uniform(0, 15),
        "s" -> Gen.Int64Uniform(0, 10000))
      val op = TopK.perKey(df, Seq(col("g")),
        Seq(col("s").desc, col("id")), 5)
      val win = df.withColumn("__rn", row_number().over(
          Window.partitionBy("g").orderBy(col("s").desc, col("id"))))
        .where(col("__rn") <= 5).drop("__rn")
      same(op.select("id", "g", "s"), win.select("id", "g", "s"),
        s"topKPerKey seed=$seed")
    }
  }

  test("binned range join matches the brute cross product at any bin width") {
    for (seed <- seeds) {
      val points = TableGen.table(spark, 600L, seed,
        "pid" -> Gen.SeqId,
        "p" -> Gen.Float64Uniform(0, 100))
      // ~1 in 10 ranges planted REVERSED (hi < lo): must match nothing
      // and must not blow up the bin explode.
      val ranges = TableGen.table(spark, 150L, seed + 3,
        "rid" -> Gen.SeqId,
        "lo" -> Gen.Float64Uniform(0, 100),
        "span" -> Gen.Float64Exponential(0.2),
        "hi" -> Gen.SqlExpr(
          "CASE WHEN rid % 10 = 0 THEN lo - 1.0 ELSE lo + span END"))
      val brute = points.crossJoin(ranges)
        .where(col("lo") <= col("p") && col("p") <= col("hi"))
        .select("pid", "rid")
      for (w <- Seq(0.7, 5.0, 50.0)) {
        val op = Joins.rangeJoin(points, "p", ranges, "lo", "hi", w)
          .select("pid", "rid")
        same(op, brute, s"rangeJoin seed=$seed binWidth=$w")
      }
    }
  }

  test("capped two-pass heavy hitters match the full-shuffle groupBy") {
    for (seed <- seeds) {
      val items = TableGen.table(spark, 20000L, seed,
        "x" -> Gen.Int64Zipf(1000, 1.2))
      val f = 0.02
      val op = Sketches.exactHeavyHitters(items, "x", f)
      val brute = items.select(col("x").cast("string").as("item"))
        .groupBy("item").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= ceil(lit(f) * lit(20000.0)).cast("long"))
      same(op, brute, s"exactHeavyHitters seed=$seed")
    }
  }

  // ---- r12 retrieval/dedup operators vs driver-side brute replays ----------

  /** Left-to-right double dot — the VectorOps fold, replayed in Scala. */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("semanticDedup matches a driver-side brute formulation") {
    val cents: Seq[(Long, Array[Float])] = (0 until 4).map(c =>
      c.toLong -> Array.tabulate(8)(j => if (j == c * 2) 1f else 0f))
    for (seed <- seeds) {
      val emb = TableGen.table(spark, 300L, seed,
        "id" -> Gen.SeqId, "v" -> Gen.ArrayUnitVector(8))
        .select(col("id"), col("v").cast("array<float>").as("vec"))
      val got = graft.operators.Dedup
        .semanticDedup(emb, "id", "vec", cents, 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      // Brute replay: same double folds, same tie rules.
      val rows = emb.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
      val cn = cents.map { case (_, cv) => math.sqrt(dot(cv, cv)) }
      def cid(v: Array[Float]): Long = {
        val n = math.sqrt(dot(v, v))
        cents.indices.minBy { c =>
          (-(dot(v, cents(c)._2) / (n * cn(c))), cents(c)._1)
        }.toLong
      }
      val asg = rows.map { case (id, v) => (id, v, cid(v),
        math.sqrt(dot(v, v))) }
      val want = asg.map { case (id, v, c, n) =>
        val lower = asg.filter(a => a._3 == c && a._1 < id &&
          dot(a._2, v) >= a._4 * n * 0.8).map(_._1)
        (id, c, lower.isEmpty, if (lower.isEmpty) -1L else lower.min)
      }.toSet
      assert(got == want, s"semanticDedup seed=$seed: " +
        s"+${(got -- want).take(3)} -${(want -- got).take(3)}")
      assert(got.exists(!_._3), s"seed=$seed produced no drops — fixture " +
        "too sparse to exercise the prune (lower the threshold)")
    }
  }

  test("rrfFuse matches a driver-side fold over random rank lists") {
    for (seed <- seeds) {
      def list(s: Long) = TableGen.table(spark, 40L, s,
        "id" -> Gen.Int64Uniform(0, 100)).dropDuplicates("id")
        .withColumn("rnk", row_number().over(
          Window.orderBy(xxhash64(col("id"), lit(s)))))
      val (a, b) = (list(seed), list(seed + 13))
      val got = graft.operators.Retrieval.rrfFuse(Seq(a, b), 60, 15)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSet
      val ra = a.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val rb = b.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val fused = (ra.keySet ++ rb.keySet).toSeq.map { id =>
        val c = ra.get(id).map(r => 1.0 / (60.0 + r)).toSeq ++
          rb.get(id).map(r => 1.0 / (60.0 + r)).toSeq
        (id, c.sum, c.size.toLong)
      }.sortBy { case (id, rrf, _) => (-rrf, id) }.take(15)
      val want = fused.zipWithIndex.map { case ((id, rrf, n), i) =>
        (id, i + 1L, round6(rrf), n) }.toSet
      assert(got == want, s"rrfFuse seed=$seed")
    }
  }

  test("rankingMetrics matches a driver-side metric replay") {
    def gain(r: Long): Long =
      math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong
    for (seed <- seeds) {
      val results = TableGen.table(spark, 200L, seed,
        "qid" -> Gen.Int64Uniform(0, 4), "id" -> Gen.Int64Uniform(0, 60))
        .dropDuplicates("qid", "id")
        .withColumn("rnk", row_number().over(Window.partitionBy("qid")
          .orderBy(xxhash64(col("id"), lit(seed)))))
      val truth = TableGen.table(spark, 60L, seed + 3,
        "qid" -> Gen.Int64Uniform(0, 4), "id" -> Gen.Int64Uniform(0, 60))
        .dropDuplicates("qid", "id")
      val k = 5
      val got = graft.operators.Retrieval.rankingMetrics(
        results.select(col("qid"), col("id"), col("rnk")), truth, k)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
      val res = results.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
        .filter(_._3 <= k)
      val tru = truth.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = tru.groupBy(_._1).map { case (q, rel) =>
        val nRel = rel.size.toLong
        val hitRnks = res.filter(r => r._1 == q && rel.contains((q, r._2)))
          .map(_._3).sorted
        val hits = hitRnks.size.toLong
        val first = hitRnks.headOption.getOrElse(-1L)
        val dcg = hitRnks.map(gain).sum
        val idcg = (1L to math.min(nRel, k.toLong)).map(gain).sum
        q -> ((nRel, hits, first,
          round6(if (first > 0) 1.0 / first else 0.0),
          round6(hits.toDouble / k), round6(hits.toDouble / nRel),
          round6(dcg.toDouble / idcg)))
      }
      assert(got == want, s"rankingMetrics seed=$seed:\n got=$got\nwant=$want")
    }
  }

  // ---- r13: the numeric/selection tail vs driver-side replays --------------

  /** TextHash.hash60 replayed on the driver: first 15 hex chars of the
    * md5 as a 60-bit non-negative long, then mod buckets. */
  private def bucketOf(f: String, b: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % b
  }

  /** DataSelection.featureBuckets replayed: split(" ", -1) unigrams ++
    * in-order word bigrams (the WordGramsAll contract — trailing empties
    * kept, so "" is 1 feature and " " is 3). */
  private def featsOf(text: String, b: Int): Seq[Long] = {
    val toks = text.split(" ", -1).toSeq
    val bi = if (toks.length >= 2)
      toks.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty[String]
    (toks ++ bi).map(bucketOf(_, b))
  }

  /** Random short-doc corpus over a tiny vocabulary (so target/raw
    * overlap is substantial), with PLANTED degenerate texts the driver
    * fixtures never produce: empty, whitespace-only, one-word. */
  private def textCorpus(seed: Long, n: Long): DataFrame = {
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val gen = TableGen.table(spark, n, seed,
      "doc_id" -> Gen.SeqId,
      "w1" -> Gen.Choice(vocab), "w2" -> Gen.Choice(vocab),
      "w3" -> Gen.Choice(vocab),
      "len" -> Gen.Int64Uniform(1, 3),
      "text" -> Gen.SqlExpr("CASE WHEN len = 1 THEN w1 " +
        "WHEN len = 2 THEN concat(w1, ' ', w2) " +
        "ELSE concat(w1, ' ', w2, ' ', w3) END"))
      .select("doc_id", "text")
    import spark.implicits._
    val degenerate = Seq((n, ""), (n + 1, " "), (n + 2, "alpha"))
      .toDF("doc_id", "text")
    gen.unionAll(degenerate)
  }

  test("dsirScores matches a driver-side hash/LM/fixed-point replay, " +
    "degenerate texts included") {
    val b = 64
    for (seed <- seeds) {
      val raw = textCorpus(seed, 120L)
      val target = textCorpus(seed + 7, 40L)
      val got = graft.operators.DataSelection
        .dsirScores(raw, target, "doc_id", "text", b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      val tc = target.collect().flatMap(r => featsOf(r.getString(1), b))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val rawDocs = raw.collect()
        .map(r => r.getLong(0) -> featsOf(r.getString(1), b))
      val rc = rawDocs.flatMap(_._2).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val (nt, nr) = (tc.values.sum, rc.values.sum)
      def lr(bk: Long): Long = math.floor(
        (math.log((tc.getOrElse(bk, 0L) + 1L).toDouble / (nt + b).toDouble) -
          math.log((rc.getOrElse(bk, 0L) + 1L).toDouble / (nr + b).toDouble))
          * 1000000.0).toLong
      val want = rawDocs.map { case (id, fs) =>
        val s = fs.map(lr).sum
        (id, fs.size.toLong, s,
          round6(s.toDouble / (fs.size.toLong * 1000000L).toDouble))
      }.toSet
      assert(got == want, s"dsirScores seed=$seed: " +
        s"+${(got -- want).take(3)} -${(want -- got).take(3)}")
    }
  }

  test("bucketDivergence: driver replay, zero law on a permuted twin, " +
    "JS symmetry, KL swap — degenerate texts included") {
    val b = 64
    for (seed <- seeds) {
      val a = textCorpus(seed, 100L)
      val c = textCorpus(seed + 31, 80L)
      // Permuted twin: same texts, shuffled ids and physical layout —
      // the model is a bag of features, so divergence must be 0 exactly.
      val perm = a.withColumn("doc_id", col("doc_id") * 7919L % 100003L)
        .repartition(7)
      def row(x: DataFrame, y: DataFrame) = graft.operators.DataSelection
        .bucketDivergence(x, y, "text", b).collect().head
      val self = row(a, perm)
      assert(self.getDouble(2) == 0.0 && self.getDouble(3) == 0.0 &&
        self.getDouble(4) == 0.0, s"seed=$seed permuted twin: $self")
      val ac = row(a, c)
      val ca = row(c, a)
      assert(ac.getDouble(4) == ca.getDouble(4), s"seed=$seed JS symmetry")
      assert(ac.getDouble(2) == ca.getDouble(3) &&
        ac.getDouble(3) == ca.getDouble(2), s"seed=$seed KL swap")
      // Full driver replay of the quantized terms.
      def counts(x: DataFrame) = x.collect()
        .flatMap(r => featsOf(r.getString(1), b))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (cntA, cntC) = (counts(a), counts(c))
      val (na, nc) = (cntA.values.sum, cntC.values.sum)
      var (kab, kba, jss) = (0L, 0L, 0L)
      for (bk <- 0 until b) {
        val p = (cntA.getOrElse(bk.toLong, 0L) + 1L).toDouble /
          (na + b).toDouble
        val q = (cntC.getOrElse(bk.toLong, 0L) + 1L).toDouble /
          (nc + b).toDouble
        val m = (p + q) / 2.0
        kab += math.floor(p * math.log(p / q) * 1000000000.0).toLong
        kba += math.floor(q * math.log(q / p) * 1000000000.0).toLong
        jss += math.floor((p * math.log(p / m) + q * math.log(q / m))
          * 500000000.0).toLong
      }
      val want = (na, nc, round6(kab.toDouble / 1e9),
        round6(kba.toDouble / 1e9), round6(jss.toDouble / 1e9))
      val gotT = (ac.getLong(0), ac.getLong(1), ac.getDouble(2),
        ac.getDouble(3), ac.getDouble(4))
      assert(gotT == want, s"divergence replay seed=$seed: $gotT != $want")
    }
  }

  test("binEquiDepth matches a driver-side sketch/cut/assign replay on " +
    "skewed and negative values") {
    for (seed <- seeds;
        (gen, width) <- Seq(
          (Gen.Int64Zipf(500, 1.3): Gen, 10L), // duplicate-heavy
          (Gen.Float64Laplace(0.0, 200.0), 25L))) { // negatives cross 0
      val df = TableGen.table(spark, 2000L, seed, "x" -> gen)
        .select(round(col("x")).cast("long").as("c"))
      for (bins <- Seq(4, 8)) {
        val got = graft.operators.FeatureScaling
          .binEquiDepth(df, col("c"), bins, width)
          .groupBy("c", "bin").count()
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet
        val vals = df.collect().map(_.getLong(0)).toSeq
        def bucket(v: Long): Long =
          (v - (((v % width) + width) % width)) / width
        val cumul = vals.groupBy(bucket).view.mapValues(_.size.toLong)
          .toSeq.sortBy(_._1)
          .scanLeft((Long.MinValue, 0L)) { case ((_, c), (bk, cnt)) =>
            (bk, c + cnt)
          }.tail
        val n = vals.size.toLong
        val cuts = (1 until bins).map { i =>
          val need = math.ceil(i.toDouble / bins * n).toLong
          (cumul.find(_._2 >= need).get._1 + 1) * width
        }
        val want = vals.map(v => v -> cuts.count(_ <= v).toLong)
          .groupBy(identity).view.mapValues(_.size.toLong)
          .map { case ((v, bin), cnt) => (v, bin, cnt) }.toSet
        assert(got == want, s"binEquiDepth seed=$seed bins=$bins " +
          s"width=$width: +${(got -- want).take(3)} -${(want -- got).take(3)}")
      }
    }
  }
}
