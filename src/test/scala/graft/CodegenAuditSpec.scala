package graft

import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator

/**
 * Workload-wide codegen-fallback audit. Twice now an oversized generated
 * method silently dropped a stage to interpreted evaluation at ~10x cost:
 * the 123x9 SRP plane unroll (fixed by the SrpCodes loop expression,
 * SURVEY §8.4) and the r6 JIT-code-cache incident. Spark's runtime
 * behavior is a WARNING plus fallback — invisible to correctness gates
 * and easy to miss in a 250-query bench. This spec generalizes the
 * lesson: every gate's whole-stage-codegen stages must actually COMPILE
 * (a CompileException at runtime = whole-stage fallback) and stay under
 * the huge-method limit (beyond it Spark abandons the compiled stage
 * even when javac/janino succeeded).
 *
 * The audit compiles the exact source `WholeStageCodegenExec.doExecute`
 * would (doCodeGen returns the cleaned source), via the same
 * `CodeGenerator.compile` path, so a failure here IS the runtime
 * fallback, caught at test time with the gate's name attached.
 */
class CodegenAuditSpec extends GraftSuite {
  private val dir = SparkTestBase.sf0001

  /** AQE inserts whole-stage codegen per query stage at MATERIALIZATION
    * time, so an unexecuted adaptive plan exposes almost no
    * WholeStageCodegenExec nodes to audit. A cloned session with AQE off
    * yields the fully-prepared static plan — same operators, same
    * codegen templates, auditable without executing. */
  private lazy val auditSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  // Streaming gates plan inside their micro-batch runtime.
  private val skip = Set("stream_hourly", "stream_dedup_pairs",
    "stream_stream_join", "stream_gen_source", "stream_state_sessions_live")

  /** Every WholeStageCodegenExec in the tree, descending through AQE
    * roots (LeafExecNode — collect() stops there) and planned subqueries. */
  private def collectWsc(p: SparkPlan): Seq[WholeStageCodegenExec] = {
    val all = p.collect { case x => x }
    all.flatMap {
      case w: WholeStageCodegenExec => Seq(w)
      case a: AdaptiveSparkPlanExec => collectWsc(a.executedPlan)
      case _ => Nil
    } ++ all.flatMap(_.subqueries).flatMap(collectWsc)
  }

  /** Audit one plan: (stages seen, failure messages). */
  private def audit(name: String, plan: SparkPlan,
      hugeLimit: Int): (Int, Seq[String]) = {
    val stages = collectWsc(plan)
    val fails = stages.zipWithIndex.flatMap { case (w, i) =>
      val (_, src) = w.doCodeGen()
      try {
        val (_, stats) = CodeGenerator.compile(src)
        if (stats.maxMethodCodeSize > hugeLimit)
          Some(s"$name stage#$i: maxMethodCodeSize " +
            s"${stats.maxMethodCodeSize} > hugeMethodLimit $hugeLimit " +
            "— Spark would abandon this compiled stage (interpreted, ~10x)")
        else None
      } catch {
        case e: Exception =>
          Some(s"$name stage#$i: codegen COMPILE FAILED -> runtime " +
            s"whole-stage fallback: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    (stages.length, fails)
  }

  test("every gate's whole-stage codegen compiles under the huge-method limit") {
    val hugeLimit = spark.conf.get("spark.sql.codegen.hugeMethodLimit").toInt
    var totalStages = 0
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !skip.contains(name) =>
        try {
          val (n, fails) =
            audit(name, fn(auditSession, dir).queryExecution.executedPlan,
              hugeLimit)
          totalStages += n
          fails
        } catch {
          case e: Throwable => Seq(s"$name: planning failed: $e")
        }
      case _ => Nil
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    // Anti-vacuity: the collector must actually be finding stages — a
    // broken traversal passing on zero stages would defeat the audit.
    assert(totalStages > 300, s"only $totalStages codegen stages audited")
  }

  test("the audit CATCHES a planted oversized stage (the r9 SRP unroll)") {
    // Rebuild the exact failure the SrpCodes loop expression fixed: the
    // per-table unrolled srpCode column at the sf1 auto-dial config
    // (123 tables x 9 planes x dim 64) inlines ~70k dot-product terms
    // into one consume path; janino rejects the >64 KB method (or the
    // bytecode exceeds the huge-method limit) and at runtime Spark would
    // silently fall back. The audit must FLAG it — this is the negative
    // control proving the main test isn't vacuous.
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val emb = auditSession.read.parquet(s"$dir/embeddings.parquet").limit(10)
    val ps = Similarity.planes(123, 9, 64, 42)
    val unrolled = emb.select(col("vec_id"),
      posexplode(array((0 until 123).map(t =>
        Similarity.srpCode(col("embedding"), ps(t))): _*)))
    val hugeLimit = spark.conf.get("spark.sql.codegen.hugeMethodLimit").toInt
    val (n, fails) = audit("planted_srp_unroll",
      unrolled.queryExecution.executedPlan, hugeLimit)
    assert(n > 0, "planted plan produced no codegen stages")
    assert(fails.nonEmpty,
      "audit failed to flag the known-oversized SRP unroll stage")
  }

  test("declarative k=300 centroid assignment overflows; the " +
    "NearestCentroids loop stays in codegen") {
    // The r13 instance of the same lesson: semanticDedupAuto's k dial
    // reaches ~323 centroids at sf10, where the sort_array-of-structs
    // assignment form inlines 300 dot products + a 300-struct in-row
    // sort and blows the method limit (every Lloyd training round AND
    // the corpus assignment drop to interpreted). The loop expression
    // is one static call.
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val emb = auditSession.read.parquet(s"$dir/embeddings.parquet").limit(10)
    val rnd = new scala.util.Random(7)
    val cents: Seq[(Long, Array[Float])] =
      (0 until 300).map(c => (c.toLong, Array.fill(64)(rnd.nextFloat())))
    val hugeLimit = spark.conf.get("spark.sql.codegen.hugeMethodLimit").toInt
    val declarative = emb.select(element_at(sort_array(array(
      Similarity.probeEntriesOf(col("embedding"), cents): _*)), 1)
      .getField("cid"))
    val (n1, f1) = audit("planted_declarative_assign",
      declarative.queryExecution.executedPlan, hugeLimit)
    assert(n1 > 0 && f1.nonEmpty,
      "audit failed to flag the k=300 declarative assignment")
    val loop = Similarity.ivfProbes(
      emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
      "id", "vec", cents, 1)
    val (n2, f2) = audit("nearest_centroids_loop",
      loop.queryExecution.executedPlan, hugeLimit)
    assert(n2 > 0 && f2.isEmpty,
      s"loop assignment must stay inside codegen at k=300:\n${f2.mkString("\n")}")
    // The two-level form rides the same one-static-call pattern — it
    // must also stay in codegen at k=300 (its r14 reason to exist is
    // exactly this k regime).
    val hier = Similarity.ivfProbesHier(
      emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
      "id", "vec", cents, 1, 4)
    val (n3, f3) = audit("nearest_centroids_hier_loop",
      hier.queryExecution.executedPlan, hugeLimit)
    assert(n3 > 0 && f3.isEmpty,
      s"hier assignment must stay inside codegen at k=300:\n${f3.mkString("\n")}")
  }
}
