package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/**
 * Theta-sketch set operations (Sketches.thetaPerGroup / thetaUnion /
 * thetaIntersect / thetaANotB): exact below the nominal, partition-order
 * independent, and algebraically consistent (A = (A∩B) ⊎ (A\B)).
 */
class ThetaSketchSpec extends GraftSuite {

  private lazy val cust = Tables.load(spark, SparkTestBase.sf001, "customer")
    .select(col("c_mktsegment").as("seg"), col("c_custkey").cast("long").as("k"))
  private lazy val buyers = Tables.load(spark, SparkTestBase.sf001, "orders")
    .select(lit("all").as("seg"), col("o_custkey").cast("long").as("k"))

  private lazy val segSk = Sketches.thetaPerGroup(cust, "seg", "k")
  private lazy val buySk = Sketches.thetaPerGroup(buyers, "seg", "k")("all")

  test("exact mode: per-group estimates equal exact distinct counts") {
    val exact = cust.groupBy("seg").agg(countDistinct("k").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(segSk.keySet == exact.keySet)
    segSk.foreach { case (g, sk) =>
      assert(math.rint(sk.getEstimate).toLong == exact(g),
        s"segment $g: ${sk.getEstimate} != ${exact(g)}")
    }
  }

  test("partition layout does not change the merged sketch estimate") {
    val reSk = Sketches.thetaPerGroup(cust.repartition(16), "seg", "k")
    segSk.foreach { case (g, sk) =>
      assert(sk.getEstimate == reSk(g).getEstimate, s"segment $g differs")
    }
  }

  test("intersection + difference partition each segment set exactly") {
    val exact = cust
      .join(buyers.select("k").distinct().withColumn("b", lit(1)),
        Seq("k"), "left")
      .groupBy("seg")
      .agg(countDistinct(when(col("b").isNotNull, col("k"))).as("inter"),
        countDistinct(when(col("b").isNull, col("k"))).as("diff"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    segSk.foreach { case (g, sk) =>
      val inter = math.rint(
        Sketches.thetaIntersect(sk, buySk).getEstimate).toLong
      val diff = math.rint(Sketches.thetaANotB(sk, buySk).getEstimate).toLong
      assert((inter, diff) == exact(g),
        s"segment $g: ($inter, $diff) != ${exact(g)}")
      assert(inter + diff == math.rint(sk.getEstimate).toLong,
        "A = (A ∩ B) ⊎ (A \\ B) must hold in exact mode")
    }
  }

  test("union of per-segment sketches equals the global distinct count") {
    val union = Sketches.thetaUnion(segSk.values.toSeq)
    val global = cust.agg(countDistinct("k")).head().getLong(0)
    assert(math.rint(union.getEstimate).toLong == global)
  }
}
