package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

class TextFunctionsSpec extends GraftSuite {
  import spark.implicits._

  TextFunctions.registerAll(spark)

  test("SQL surface matches the Column-API expressions") {
    val d = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    d.createOrReplaceTempView("tf_docs")
    val viaSql = spark.sql(
      """SELECT graft_rolling_hash(text) AS rh,
        |  size(graft_word_shingles(text, 3)) AS ns,
        |  size(graft_word_grams(text, 3)) AS ng,
        |  graft_simhash(text, 48) AS sh,
        |  graft_minhash_sig(text, 3, 32) AS sig,
        |  graft_bottomk_hashes(text, 5, 4) AS bk
        |FROM tf_docs""".stripMargin).collect()(0)
    val viaApi = Dedup.minhashSignatures(d, "doc_id", "text", 3, 32)
      .collect()(0).getSeq[Long](1)
    assert(viaSql.getSeq[Long](4) == viaApi)
    assert(viaSql.getLong(0) ==
      d.select(graft.operators.TextAnalysis.rollingHash(col("text")))
        .collect()(0).getLong(0))
    // 9 words -> 7 trigram shingles (distinct) and 7 gram occurrences
    assert(viaSql.getInt(1) == 7 && viaSql.getInt(2) == 7)
    assert(viaSql.getSeq[Long](5).length == 4)
  }

  test("vector SQL functions: dot product and int8 quantization") {
    Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b").createOrReplaceTempView("tf_vecs")
    val r = spark.sql(
      """SELECT round(graft_vec_dot(a, b), 5) AS d,
        |  graft_vec_quantize_int8(a) AS q FROM tf_vecs""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 32.0)
    val q = r.getSeq[Int](1)
    assert(q.length == 3 && q.last == 127,
      s"max component must quantize to 127, got $q")
  }

  test("structural args must be literals") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_word_shingles(text, doc_id) FROM tf_docs")
        .collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getMessage.contains("graft_word_shingles"))
  }

  test("normalize_text: accents stripped, case folded, ligatures preserved") {
    val rows = Seq(
      (1L, "Café NAÏVE Über piñata Çedilla"),
      // pre-DECOMPOSED input (e + combining acute) must land identically
      (2L, "Café"),
      (3L, "ﬁt THE End"), // fi ligature survives (NFC, not NFKC)
      (4L, "plain ascii 123")
    ).toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
        graft.operators.TextAnalysis.normalizeText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "cafe naive uber pinata cedilla")
    assert(got(2L) == "cafe")
    assert(got(3L) == "ﬁt the end")
    assert(got(4L) == "plain ascii 123")
    // SQL registration agrees
    rows.createOrReplaceTempView("nt_docs")
    val viaSql = spark.sql(
      "SELECT graft_normalize_text(text) FROM nt_docs WHERE doc_id = 1")
      .collect()(0).getString(0)
    assert(viaSql == "cafe naive uber pinata cedilla")
  }
}
