package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends GraftSuite {
  import spark.implicits._

  test("morton code is monotone in each coordinate with the other fixed") {
    val df = spark.range(0, 64).select(col("id"))
    val inA = df.select(Layout.interleaveBits(col("id"), lit(13L), 6).as("z"))
      .collect().map(_.getLong(0))
    val inB = df.select(Layout.interleaveBits(lit(13L), col("id"), 6).as("z"))
      .collect().map(_.getLong(0))
    Seq(inA, inB).foreach { zs =>
      assert(zs.zip(zs.tail).forall { case (x, y) => x < y })
    }
    // Bit structure: (a=all ones, b=0) fills exactly the even bits.
    val ones = Seq((63L, 0L)).toDF("a", "b")
      .select(Layout.interleaveBits(col("a"), col("b"), 6)).collect()(0).getLong(0)
    assert(ones == 0x555L, s"expected 0b010101010101, got ${ones.toBinaryString}")
  }

  test("zorderWrite clusters both key ranges into tight per-file spans") {
    val out = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val slice = Tables.load(spark, SparkTestBase.sf001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    Layout.zorderWrite(slice, out, "l_orderkey", "l_partkey", numFiles = 16)
    val back = spark.read.parquet(out)
    // Row preservation.
    assert(back.count() == slice.count())
    assert(back.exceptAll(slice).isEmpty && slice.exceptAll(back).isEmpty)
    // Locality: average per-file span of BOTH keys well under the global
    // span (a lexicographic sort only achieves this for its leading key).
    val g = slice.agg(max("l_orderkey") - min("l_orderkey"),
      max("l_partkey") - min("l_partkey")).collect()(0)
    val spans = back.withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max("l_orderkey") - min("l_orderkey")).as("so"),
        (max("l_partkey") - min("l_partkey")).as("sp"))
      .agg(avg("so"), avg("sp")).collect()(0)
    // A degenerate layout (single-key sort) leaves one dimension at ~1.0
    // of the global span; the curve must pull BOTH well below that.
    assert(spans.getDouble(0) < g.getLong(0) * 0.7,
      s"orderkey avg file span ${spans.getDouble(0)} vs global ${g.getLong(0)}")
    assert(spans.getDouble(1) < g.getLong(1) * 0.7,
      s"partkey avg file span ${spans.getDouble(1)} vs global ${g.getLong(1)}")
  }

  test("hilbert curve: bijection, THE adjacency property, beats morton locality") {
    import graft.functions.HilbertCurve
    val bits = 6
    val n = 1L << bits // 64x64 grid
    // Bijection: every cell maps to a distinct position in [0, n^2).
    val ds = for (x <- 0L until n; y <- 0L until n)
      yield HilbertCurve.xy2d(bits, x, y)
    assert(ds.toSet.size == (n * n).toInt)
    assert(ds.min == 0L && ds.max == n * n - 1)
    // Inverse round-trips.
    (0L until n * n).foreach { d =>
      val (x, y) = HilbertCurve.d2xy(bits, d)
      assert(HilbertCurve.xy2d(bits, x, y) == d)
    }
    // THE Hilbert property: consecutive curve positions are grid-adjacent
    // (|dx| + |dy| == 1, every single step) — Morton teleports at seams.
    val cells = (0L until n * n).map(d => HilbertCurve.d2xy(bits, d))
    cells.zip(cells.tail).foreach { case ((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jump ($x1,$y1)->($x2,$y2)")
    }
    // Locality vs Z-order: mean manhattan jump along the curve — Hilbert
    // is exactly 1.0; Morton's quadrant seams push it above.
    val zCells = Array.ofDim[(Long, Long)]((n * n).toInt)
    for (x <- 0L until n; y <- 0L until n) {
      // invert morton by scattering d's even/odd bits
      val d = (0 until bits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
      zCells(d.toInt) = (x, y)
    }
    val zJump = zCells.zip(zCells.tail).map { case ((a, b), (c, dd)) =>
      math.abs(a - c) + math.abs(b - dd)
    }.sum.toDouble / (n * n - 1)
    assert(zJump > 1.0, s"morton mean jump $zJump should exceed hilbert's 1.0")
    // And the codegen'd expression agrees with the JVM reference.
    val viaExpr = spark.range(0, n * n)
      .select((col("id") / n).cast("long").as("x"),
        pmod(col("id"), lit(n)).cast("long").as("y"))
      .select(Layout.hilbertIndex(col("x"), col("y"), bits).as("h"),
        col("x"), col("y"))
      .collect()
    viaExpr.foreach { r =>
      assert(r.getLong(0) == HilbertCurve.xy2d(bits, r.getLong(1), r.getLong(2)))
    }
  }

  test("hilbertWrite clusters both key ranges at least as tight as zorder") {
    val slice = Tables.load(spark, SparkTestBase.sf001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val outH = java.nio.file.Files.createTempDirectory("graft_hilb").toString
    Layout.hilbertWrite(slice, outH, "l_orderkey", "l_partkey", numFiles = 16)
    val back = spark.read.parquet(outH)
    assert(back.count() == slice.count())
    assert(back.exceptAll(slice).isEmpty && slice.exceptAll(back).isEmpty)
    val g = slice.agg(max("l_orderkey") - min("l_orderkey"),
      max("l_partkey") - min("l_partkey")).collect()(0)
    val spans = back.withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max("l_orderkey") - min("l_orderkey")).as("so"),
        (max("l_partkey") - min("l_partkey")).as("sp"))
      .agg(avg("so"), avg("sp")).collect()(0)
    assert(spans.getDouble(0) < g.getLong(0) * 0.7,
      s"orderkey avg file span ${spans.getDouble(0)} vs global ${g.getLong(0)}")
    assert(spans.getDouble(1) < g.getLong(1) * 0.7,
      s"partkey avg file span ${spans.getDouble(1)} vs global ${g.getLong(1)}")
  }

  test("min-max file stats index prunes non-overlapping files") {
    val out = java.nio.file.Files.createTempDirectory("graft_minmax").toString
    val slice = Tables.load(spark, SparkTestBase.sf001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    slice.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(out)
    val index = Layout.fileStatsIndex(spark, out, "l_orderkey")
    assert(index.count() == 8, "one index row per written file")
    val (lo, hi) = (100L, 300L)
    val (scan, read, total) =
      Layout.prunedRangeScan(spark, out, index, "l_orderkey", lo, hi)
    assert(total == 8)
    assert(read < total, s"no files pruned ($read/$total)")
    // Pruned result == full filter, exactly.
    val expect = slice.where(col("l_orderkey") >= lo && col("l_orderkey") <= hi)
    assert(scan.exceptAll(expect).isEmpty && expect.exceptAll(scan).isEmpty)
    // A range outside every file's span reads nothing.
    val (empty, read0, _) =
      Layout.prunedRangeScan(spark, out, index, "l_orderkey",
        10000000L, 20000000L)
    assert(read0 == 0 && empty.count() == 0)
    // The overlap predicate must sit in the DISTRIBUTED plan (pre-collect),
    // symmetric with the Bloom path: at million-file scale only surviving
    // file names may reach the driver.
    val plan = Layout.survivingRangeFiles(index, lo, hi)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Filter"),
      s"range-overlap filter missing from the distributed index plan:\n$plan")
    assert(Layout.survivingRangeFiles(index, lo, hi).count() == read)
  }

  test("bloom file index skips files for point lookups on unclustered layout") {
    val out = java.nio.file.Files.createTempDirectory("graft_bloomidx").toString
    val slice = Tables.load(spark, SparkTestBase.sf001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    // hash-clustered on DIFFERENT columns: orderkey min/max spans are
    // near-global in every file, so min-max skipping would read all 8
    slice.repartition(8, col("l_quantity"), col("l_linenumber"))
      .write.mode("overwrite").parquet(out)
    val index = Layout.fileBloomIndex(spark, out, "l_orderkey", 100000L)
    assert(index.count() == 8)
    val keys = Seq(7L, 1000L)
    val (scan, read, total) =
      Layout.prunedPointScan(spark, out, index, "l_orderkey", keys)
    assert(total == 8)
    assert(read < total, s"bloom skipped nothing ($read/$total)")
    val expect = slice.where(col("l_orderkey").isin(keys: _*))
    assert(scan.exceptAll(expect).isEmpty && expect.exceptAll(scan).isEmpty)
    // a key that does not exist anywhere reads (almost) nothing and
    // returns zero rows regardless
    val (miss, readMiss, _) =
      Layout.prunedPointScan(spark, out, index, "l_orderkey", Seq(999999999L))
    assert(miss.count() == 0)
    assert(readMiss <= 1, s"absent key should probe ~0 files, read $readMiss")
  }

  test("stableDenseIds: dense 0..n-1 in sort order across partitions") {
    val slice = Tables.load(spark, SparkTestBase.sf001, "lineitem")
      .select("l_orderkey", "l_linenumber")
    val n = slice.count()
    val ids = Layout.stableDenseIds(slice,
      Seq(col("l_orderkey"), col("l_linenumber")), 8)
    // dense coverage: exactly 0..n-1
    val agg = ids.agg(count(lit(1)), min("row_id"), max("row_id"),
      count_distinct(col("row_id"))).collect()(0)
    assert(agg.getLong(0) == n && agg.getLong(1) == 0L &&
      agg.getLong(2) == n - 1 && agg.getLong(3) == n)
    // order agreement: id order == total sort order
    import org.apache.spark.sql.expressions.Window
    val misordered = ids.withColumn("rk", row_number().over(
        Window.orderBy(col("l_orderkey"), col("l_linenumber"))) - 1)
      .where(col("rk") =!= col("row_id")).count()
    assert(misordered == 0)
  }

  test("compact rewrites fragments into the target file count, lossless") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val slice = Tables.load(spark, SparkTestBase.sf001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    slice.repartition(40).write.mode("overwrite").parquet(s"$base/in")
    val nIn = new java.io.File(s"$base/in").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nIn == 40)
    val n = slice.count()
    val target = 1000L
    val files = Layout.compact(spark, s"$base/in", s"$base/out", target)
    assert(files == ((n + target - 1) / target).toInt)
    val nOut = new java.io.File(s"$base/out").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nOut == files, s"wrote $nOut files, planned $files")
    val back = spark.read.parquet(s"$base/out")
    assert(back.exceptAll(slice).isEmpty && slice.exceptAll(back).isEmpty)
  }
}
