package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Similarity

/** Dev-tool microbench (the hier_assignment_microbench companion): the
  * IVF x PQ ENCODE path's per-row cost across a coarse-k sweep, flat
  * `nearestCid` vs the two-level dial (`hierWprobe = 8`). The PQ code
  * loops are k-independent (m fixed codebooks), so any growth with k is
  * the coarse-assignment scan this sweep isolates — the r14 verdict's
  * remaining O(k)-per-row call site.
  *
  *   sbt "runMain graft.PqAssignSweep <vecParquet> <idCol> <vecCol> <dim>"
  */
object PqAssignSweep {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PqAssignSweep <vecParquet> <idCol> <vecCol> <dim>")
    val (path, idCol, vecCol, dim) =
      (args(0), args(1), args(2), args(3).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = spark.read.parquet(path)
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"))
    vecs.write.format("noop").mode("overwrite").save() // warm scan path
    val rnd = new scala.util.Random(1205L)
    def randCents(k: Int): Seq[(Long, Array[Float])] =
      (0 until k).map(c =>
        (c.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val subDim = 8
    val books: Seq[Seq[(Long, Array[Float])]] = (0 until dim / subDim).map(_ =>
      (0 until 16).map(c =>
        (c.toLong, Array.fill(subDim)(rnd.nextFloat() * 2f - 1f))))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val points = Seq(100, 316, 1000, 3162).map { k =>
      val cents = randCents(k)
      val flat = time {
        Similarity.ivfPqAssignments(vecs, "id", "vec", cents, books, subDim)
          .write.format("noop").mode("overwrite").save()
      }
      val hier = time {
        Similarity.ivfPqAssignments(vecs, "id", "vec", cents, books, subDim,
            hierWprobe = Some(8))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"""{"k":$k,"flat_s":$flat%.2f,"hier_s":$hier%.2f,"ratio":${flat / hier}%.2f}""")
      (k, flat, hier)
    }
    val js = points.map { case (k, f, h) =>
      f"""{"k":$k,"flat_s":$f%.2f,"hier_s":$h%.2f,"ratio":${f / h}%.2f}"""
    }.mkString("[", ",", "]")
    println(s"""{"sweep":"ivfPqAssignments flat vs hierWprobe=8","points":$js}""")
    spark.stop()
  }
}
