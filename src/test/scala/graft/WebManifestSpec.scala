package graft

import org.apache.spark.sql.functions._

class WebManifestSpec extends GraftSuite {

  test("web manifest: quotas, decontamination, and domain tags hold") {
    val out = graft.queries.TextEventsQueries
      .queries("pipeline_web_manifest")(spark, SparkTestBase.sf0001)
    out.cache()
    try {
      // eval docs never leak into the manifest
      assert(out.where(col("doc_id") % 20 === 7).count() == 0)
      // per-lang counts never exceed the lang's quota
      val counts = out.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val targets = graft.operators.Sampling.allocateMixture(
        Map("en" -> 0.4, "es" -> 0.3, "de" -> 0.2, "fr" -> 0.1), 120L)
      counts.foreach { case (l, n) =>
        assert(n <= targets.getOrElse(l, 0L), s"$l over quota: $n")
      }
      // registered domains come from the synthetic URL set
      val domains = out.select("domain").distinct().collect()
        .map(_.getString(0)).toSet
      assert(domains.forall(d => d.endsWith(".com:443") == false &&
        (d.endsWith("example.com") || d.endsWith("site.net") ||
          d.endsWith("docs.org"))), s"unexpected domains $domains")
      // extraction happened: token counts are positive
      assert(out.where(col("n_tokens") <= 0).count() == 0)
    } finally out.unpersist()
  }
}
