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

  test("TVF integer args reject fractional and out-of-Int-range values") {
    val frac = intercept[Exception] {
      spark.sql("SELECT * FROM graft_copula_pair(CAST(200.9 AS DOUBLE), 7, 0.5)")
        .collect()
    }
    assert(String.valueOf(frac.getMessage) .contains("integer") ||
      String.valueOf(frac.getCause).contains("integer"),
      s"fractional rows arg must be rejected: ${frac.getMessage.take(200)}")
    val big = intercept[Exception] {
      spark.sql("SELECT * FROM graft_fuzz_battery(1, 5000000000)").collect()
    }
    assert(String.valueOf(big.getMessage).contains("out of Int range") ||
      String.valueOf(big.getCause).contains("out of Int range"),
      s"2^31-overflowing nQueries must not wrap: ${big.getMessage.take(200)}")
  }

  test("graft_markov_text TVF == TextGen train + generate") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.createOrReplaceTempView("graft_tvf_mk")
    val viaSql = spark.sql(
        "SELECT * FROM graft_markov_text('graft_tvf_mk', 'text', 200, 97, 20)")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val model = graft.operators.TextGen.trainBigrams(docs, "text")
    val viaApi = graft.operators.TextGen.generate(spark, model, 200L, 97L, 20)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaSql == viaApi)
    assert(viaSql.size == 200)
  }

  test("graft_copula_pair TVF == TableGen.correlated 2x2") {
    val viaSql = spark.sql("SELECT * FROM graft_copula_pair(5000, 7, 0.6)")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val viaApi = TableGen.correlated(spark, 5000L, 7L,
        Seq(Seq(1.0, 0.6), Seq(0.6, 1.0)),
        "a" -> Gen.Float64Normal(0.0, 1.0),
        "b" -> Gen.Float64Normal(0.0, 1.0))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(viaSql == viaApi)
    assert(viaSql.size == 5000)
  }

  test("graft_fuzz_battery TVF == QueryFuzz.run on the catalog views") {
    Tables.registerAll(spark, SparkTestBase.sf0001)
    val viaSql = spark.sql("SELECT * FROM graft_fuzz_battery(42, 12)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaApi = graft.fuzz.QueryFuzz.run(spark, SparkTestBase.sf0001,
        graft.fuzz.QueryFuzz.FuzzConfig(42L, 12))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaSql == viaApi)
    assert(viaSql.size == 12)
  }
}
