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
}
