package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench warmup set is DERIVED (stream_* prefix + explicit extras) so
  * a new stream gate cannot silently regress into staged-cost timing —
  * this pins the derivation and the missing-extra warning path. */
class BenchStagingSpec extends AnyFunSuite {

  test("stagedGateNames: stream_/mm_ gates derived, extras kept, missing " +
    "reported") {
    val mm = Bench.stagedGateNames(Set("mm_decode_jpeg", "rel_q1"))
    assert(mm._1 == Seq("mm_decode_jpeg"),
      "mm_ gates must be warmup-derived (decode-codec first-touch cost)")
    val all = Set("stream_b", "stream_a", "rel_q1", "merge_changelog",
      "graph_degrees")
    val (present, missing) = Bench.stagedGateNames(all)
    assert(present ==
      Seq("stream_a", "stream_b", "merge_changelog", "graph_degrees"))
    assert(missing.isEmpty)
  }

  test("stagedGateNames: a dropped extra is reported, never silently skipped") {
    val (present, missing) = Bench.stagedGateNames(Set("stream_x", "rel_q1"))
    assert(present == Seq("stream_x"))
    assert(missing == Seq("merge_changelog", "graph_degrees"))
  }

  test("every explicit extra exists in the live query map") {
    assert(Bench.stagedGateNames(SparkEntry.queries.keySet)._2.isEmpty,
      "an extra staged-gate name no longer matches SparkEntry.queries")
  }
}
