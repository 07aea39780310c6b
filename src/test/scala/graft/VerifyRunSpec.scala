package graft

/** Pins the round-10 postmortem guard: a Verify run that writes zero result
  * boards must be distinguishable from a green run (main exits 1 on
  * run() == 0), never a silently-empty artifact. */
class VerifyRunSpec extends GraftSuite {

  test("a filter matching nothing yields 0 boards — the main-exit-1 condition") {
    val out = java.nio.file.Files.createTempDirectory("verify_zero").toString
    val n = Verify.run(spark, SparkTestBase.sf0001, out,
      Some(Seq("no_such_gate_xyz")))
    assert(n == 0)
  }

  test("a real gate writes its board and counts it") {
    val out = java.nio.file.Files.createTempDirectory("verify_one").toString
    val n = Verify.run(spark, SparkTestBase.sf0001, out,
      Some(Seq("gen_int64_uniform_bounds")))
    assert(n == 1)
    assert(new java.io.File(s"$out/gen_int64_uniform_bounds").exists())
  }
}
