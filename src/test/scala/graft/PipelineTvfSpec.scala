package graft

import graft.operators.{Dedup, Similarity}

/** The SQL table functions must expand to the Scala pipelines verbatim:
  * same rows, same columns, on the fixture the gates use. */
class PipelineTvfSpec extends GraftSuite {
  private val dir = SparkTestBase.sf001

  test("graft_minhash_neardup TVF == Dedup.minhashNearDuplicates") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.createOrReplaceTempView("graft_tvf_docs")
    val viaSql = spark.sql(
        "SELECT * FROM graft_minhash_neardup('graft_tvf_docs', 'doc_id', 'text', 0.5)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val viaApi = Dedup.minhashNearDuplicates(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(viaSql == viaApi)
    assert(viaSql.nonEmpty, "fixture must exercise the pipeline")
  }

  test("graft_lsh_neardup_auto TVF == Similarity.lshNearDuplicatesAuto") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.createOrReplaceTempView("graft_tvf_emb")
    val viaSql = spark.sql(
        "SELECT * FROM graft_lsh_neardup_auto('graft_tvf_emb', 'vec_id', 'embedding', 0.45)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaApi = Similarity.lshNearDuplicatesAuto(
        emb, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSql == viaApi)
    assert(viaSql.nonEmpty, "fixture must exercise the pipeline")
  }

  test("TVF misuse fails with a named-argument message, not an obscure cast") {
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM graft_minhash_neardup('graft_tvf_docs', 'doc_id', 'text')")
        .collect()
    }
    assert(ex.getMessage.contains("graft_minhash_neardup") ||
      String.valueOf(ex.getCause).contains("graft_minhash_neardup"),
      s"unhelpful error: ${ex.getMessage.take(300)}")
  }
}
