package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * The broadcast-backed quantizer twins (NearestCentroidsBcast /
 * NearestCentroidsHierBcast / PqEncodeBcast) vs the plan-embedded forms
 * they switch from past `spark.graft.quantizer.bcastFromBytes`.
 * Contract: the switch is INVISIBLE to results (same loops, arrays just
 * arrive via a broadcast resolved once per operator instance), the
 * threshold actually routes (plan shows the _bcast expression when
 * forced low, the plain form at the default), and the generated code
 * still compiles (the twins must not push a stage to interpreted eval).
 */
class QuantizerBcastSpec extends GraftSuite {

  private val ThresholdKey = "spark.graft.quantizer.bcastFromBytes"

  private def withThreshold[T](bytes: Long)(f: => T): T = {
    val old = spark.conf.getOption(ThresholdKey)
    spark.conf.set(ThresholdKey, bytes.toString)
    try f
    finally old match {
      case Some(v) => spark.conf.set(ThresholdKey, v)
      case None => spark.conf.unset(ThresholdKey)
    }
  }

  private lazy val vecs = TableGen.table(spark, 250L, 91L,
      "id" -> Gen.SeqId, "v" -> Gen.ArrayUnitVector(16))
    .select(col("id"), col("v").cast("array<float>").as("vec"))

  private lazy val cents =
    Similarity.trainKMeans(vecs, "id", "vec", 18, 16, 2)
  private lazy val books =
    Similarity.trainPQ(vecs, "id", "vec", 4, 4, 8, 2)

  test("forced-broadcast quantizers are bit-identical to plan-embedded " +
    "across probe, hier probe, and PQ encode (codegen-only mode)") {
    // CODEGEN_ONLY turns a silent interpreted fallback into a loud
    // failure, so this test also proves the twins' generated code
    // compiles and runs inside whole-stage codegen.
    val fmKey = "spark.sql.codegen.factoryMode"
    val oldFm = spark.conf.getOption(fmKey)
    spark.conf.set(fmKey, "CODEGEN_ONLY")
    try {
      val flatProbe = Similarity.ivfProbes(vecs, "id", "vec", cents, 3)
        .collect().map(_.toSeq).toSet
      val flatHier = Similarity.ivfProbesHier(vecs, "id", "vec", cents, 3, 2)
        .collect().map(_.toSeq).toSet
      val flatPq = Similarity.ivfPqAssignments(vecs, "id", "vec", cents,
        books, 4).collect().map(_.toSeq).toSet
      withThreshold(1L) {
        val bcProbe = Similarity.ivfProbes(vecs, "id", "vec", cents, 3)
          .collect().map(_.toSeq).toSet
        assert(bcProbe == flatProbe, "probe path must be bit-identical")
        val bcHier = Similarity.ivfProbesHier(vecs, "id", "vec", cents, 3, 2)
          .collect().map(_.toSeq).toSet
        assert(bcHier == flatHier, "hier probe path must be bit-identical")
        val bcPq = Similarity.ivfPqAssignments(vecs, "id", "vec", cents,
          books, 4).collect().map(_.toSeq).toSet
        assert(bcPq == flatPq, "PQ encode path must be bit-identical")
      }
    } finally oldFm match {
      case Some(v) => spark.conf.set(fmKey, v)
      case None => spark.conf.unset(fmKey)
    }
  }

  test("the byte threshold routes: big quantizers broadcast, small stay " +
    "plan-embedded") {
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.analyzed.toString
    // Default threshold (4 MB): an 18 x 16-float quantizer is tiny ->
    // the plain plan-embedded expression.
    val small = planOf(Similarity.ivfProbes(vecs, "id", "vec", cents, 1))
    assert(small.contains("nearest_centroids") &&
      !small.contains("nearest_centroids_bcast"),
      s"small quantizer must stay plan-embedded, got plan:\n$small")
    // Forced-low threshold: the same call routes through the broadcast
    // twin (this is what a k ~ 22,000 production quantizer hits at the
    // 4 MB default).
    withThreshold(1L) {
      val big = planOf(Similarity.ivfProbes(vecs, "id", "vec", cents, 1))
      assert(big.contains("nearest_centroids_bcast"),
        s"big quantizer must broadcast, got plan:\n$big")
      val bigH = planOf(
        Similarity.ivfProbesHier(vecs, "id", "vec", cents, 1, 2))
      assert(bigH.contains("nearest_centroids_hier_bcast"),
        s"big hier quantizer must broadcast, got plan:\n$bigH")
      val bigPq = planOf(Similarity.ivfPqAssignments(vecs, "id", "vec",
        cents, books, 4))
      assert(bigPq.contains("pq_encode_bcast"),
        s"big codebooks must broadcast, got plan:\n$bigPq")
    }
  }

  test("interpreted (non-codegen) eval path of the twins matches too") {
    // nullSafeEval is the safety net Spark falls back to under codegen
    // pressure — it must agree with the codegen'd loop.
    val fmKey = "spark.sql.codegen.factoryMode"
    val oldFm = spark.conf.getOption(fmKey)
    spark.conf.set(fmKey, "NO_CODEGEN")
    try {
      val flat = Similarity.ivfProbes(vecs, "id", "vec", cents, 2)
        .collect().map(_.toSeq).toSet
      val bc = withThreshold(1L) {
        Similarity.ivfProbes(vecs, "id", "vec", cents, 2)
          .collect().map(_.toSeq).toSet
      }
      assert(bc == flat)
    } finally oldFm match {
      case Some(v) => spark.conf.set(fmKey, v)
      case None => spark.conf.unset(fmKey)
    }
  }
}
