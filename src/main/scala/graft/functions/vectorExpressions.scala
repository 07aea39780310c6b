package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `float_vec_dot(a, b)` — dot product of two `array<float>` columns in
 * double precision, as a native codegen'd Catalyst expression.
 *
 * Why a custom Expression (SURVEY.md §7.3 preference (b)): the built-in
 * composition `aggregate(zip_with(a, b, (x, y) -> x * y), 0d, acc + v)`
 * is semantically identical but evaluates interpreted lambdas per element —
 * on all-pairs workloads (embedding dedup: n^2 pairs x 3 folds x 64 dims)
 * that interpretation overhead dominated the benchmark. This expression
 * compiles to a tight primitive loop inside whole-stage codegen.
 *
 * Semantics contract (must stay bit-identical to the HOF form and to the
 * DuckDB oracle's list_reduce): sequential ascending-index fold, each term
 * `(double) a[i] * (double) b[i]`, accumulator starts at 0.0. Null element
 * handling: arrays with null elements are outside the contract (embeddings
 * are dense); length mismatch folds over the shorter prefix.
 */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `int_vec_dot_long(a, b)` — exact BIGINT dot product of two `array<int>`
  * code columns (the SQ8 scoring hot loop). Pure integer arithmetic, so the
  * result is order-independent and trivially engine-replayable: int8-range
  * codes (|q| <= 127) cannot overflow a Long below ~5.7e14 dimensions.
  * Length mismatch folds over the shorter prefix, like FloatVecDot.
  *
  * CONTRACT — quantized-CODE columns only. The no-overflow claim is the
  * int8 bound above; the expression itself accepts any `array<int>`, and
  * two Int.MaxValue-scale entries overflow the Long accumulator after ~4
  * elements, silently wrapping (no Math.addExact in the hot loop — the
  * codegen body must stay a bare multiply-add to vectorize). Every
  * in-repo caller feeds `quantizeInt8` output; route any general-integer
  * dot through a widening cast + FloatVecDot-style double fold instead. */
case class IntVecDotLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def prettyName: String = "int_vec_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $a.getInt($i)) * ((long) $b.getInt($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `float_vec_dot_prefix(a, b, p)` — FloatVecDot folded over only the first
  * `p` elements: the Matryoshka coarse pass. Identical arithmetic contract
  * (sequential ascending double fold), so `p >= dim` degenerates to
  * FloatVecDot bit-for-bit; the at-scale point is that a column store scans
  * a p-wide prefix column instead of the full vector (dim/p less IO). */
case class FloatVecDotPrefix(left: Expression, right: Expression, p: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(p > 0, s"float_vec_dot_prefix: p must be positive, got $p")

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot_prefix"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(p, math.min(x.numElements(), y.numElements()))
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($p, Math.min($a.numElements(), $b.numElements()));
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object FloatVecOps {
  /** Symmetric int8 scalar quantization, q_i = floor(x_i * 127 / max|x| +
    * 0.5) — one pass for the max, one for the elements (the HOF form
    * re-evaluated array_max inside the per-element lambda: O(d^2) plus an
    * allocation per element). Fail-fast on zero/empty vectors — the HOF
    * form's 0/0 produced NaN, which ANSI-mode int casts then crash on
    * anyway, with a far worse error. */
  def quantizeInt8(a: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = a.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(a.getFloat(i).toDouble)
      if (v > m) m = v
      i += 1
    }
    if (m <= 0.0) {
      throw new IllegalArgumentException(
        "quantizeInt8: zero or empty vector has no scale")
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(a.getFloat(i).toDouble * 127.0 / m + 0.5).toInt
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class FloatVecQuantizeInt8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "float_vec_quantize_int8"

  override protected def nullSafeEval(a: Any): Any =
    FloatVecOps.quantizeInt8(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FloatVecOps.quantizeInt8($c);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object PqOps {
  /** All m product-quantization codes of one vector: for each contiguous
    * subDim-wide subspace mi, the cid of the minimum-L2 codebook entry.
    * The ranking key is norms2(e) - 2*dot(sub, cent_e) — ||sub||^2 is
    * constant within a subspace — with the dot accumulated in the SAME
    * sequential double fold as FloatVecDot, and strict `<` keeping the
    * first (= lowest-cid, entries arrive cid-sorted) entry on exact
    * ties. Bit-identical to the sort_array(struct(dist, cid)) form it
    * replaces and to the DuckDB oracle's ROW_NUMBER replay. */
  def pqEncode(v: org.apache.spark.sql.catalyst.util.ArrayData, subDim: Int,
      offsets: Array[Int], cids: Array[Long], norms2: Array[Double],
      cents: Array[Float]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val m = offsets.length - 1
    val out = new Array[Long](m)
    var mi = 0
    while (mi < m) {
      val base = mi * subDim
      var bestCid = 0L
      var bestD = Double.PositiveInfinity
      var e = offsets(mi)
      while (e < offsets(mi + 1)) {
        var acc = 0.0
        var j = 0
        while (j < subDim) {
          acc += v.getFloat(base + j).toDouble * cents(e * subDim + j).toDouble
          j += 1
        }
        val d = norms2(e) - 2.0 * acc
        if (d < bestD) { bestD = d; bestCid = cids(e) }
        e += 1
      }
      out(mi) = bestCid
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Per-query ADC LUT rows (m, cid, p): p = sequential-fold double dot
    * of the query's subspace-mi slice with entry e's centroid. */
  def pqLut(v: org.apache.spark.sql.catalyst.util.ArrayData, subDim: Int,
      offsets: Array[Int], cids: Array[Long], cents: Array[Float])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val m = offsets.length - 1
    val out = new Array[Any](cids.length)
    var mi = 0
    while (mi < m) {
      val base = mi * subDim
      var e = offsets(mi)
      while (e < offsets(mi + 1)) {
        var acc = 0.0
        var j = 0
        while (j < subDim) {
          acc += v.getFloat(base + j).toDouble * cents(e * subDim + j).toDouble
          j += 1
        }
        out(e) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](mi.toLong, cids(e), acc))
        e += 1
      }
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object IvfOps {
  /** Top-`nprobe` centroid ids by cosine DESC, ties -> lower cid — the
    * loop form of `slice(sort_array(array(struct(0.0 - score, cid))), 1,
    * nprobe)` and BIT-IDENTICAL to it by construction: the row norm is
    * the full-length FloatVecDot fold (sqrt of the self-dot), each
    * per-centroid dot folds over min(|v|, dim) like FloatVecDot's
    * min-length contract, the key is exactly `0.0 - dot / (nrm *
    * norms(e))`, and the selection compares keys with Spark's nan-safe
    * double ordering ((x == y) ? 0 : Double.compare — equal keys fall
    * to the lower cid). A zero-norm row vector fails FAST with a
    * descriptive error: under ANSI mode the declarative twin throws an
    * opaque DIVIDE_BY_ZERO on the same input, so cosine assignment of a
    * zero vector was never defined — this keeps the fail visible and
    * named (the mmrRerank discipline). `cents` is flattened
    * entry-major: entry e spans cents[e*dim, (e+1)*dim); norms(e) is
    * the driver-precomputed sequential-fold ||cent_e||. */
  def nearestCentroids(v: org.apache.spark.sql.catalyst.util.ArrayData,
      nprobe: Int, dim: Int, cids: Array[Long], norms: Array[Double],
      cents: Array[Float]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val k = cids.length
    var s = 0.0
    var i = 0
    val vn = v.numElements()
    while (i < vn) {
      val f = v.getFloat(i).toDouble
      s += f * f
      i += 1
    }
    val nrm = math.sqrt(s)
    if (!(nrm > 0.0)) throw new IllegalArgumentException(
      "nearest_centroids: zero-norm (or NaN) vector — cosine assignment " +
        "is undefined; drop or re-embed the row upstream")
    val negs = new Array[Double](k)
    var e = 0
    val n = math.min(vn, dim)
    while (e < k) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        acc += v.getFloat(j).toDouble * cents(e * dim + j).toDouble
        j += 1
      }
      negs(e) = 0.0 - acc / (nrm * norms(e))
      e += 1
    }
    val taken = new Array[Boolean](k)
    val out = new Array[Long](math.min(nprobe, k))
    var slot = 0
    while (slot < out.length) {
      var best = -1
      var c = 0
      e = 0
      while (e < k) {
        if (!taken(e)) {
          if (best < 0) best = e
          else {
            c = if (negs(e) == negs(best)) 0
              else java.lang.Double.compare(negs(e), negs(best))
            if (c < 0 || (c == 0 && cids(e) < cids(best))) best = e
          }
        }
        e += 1
      }
      taken(best) = true
      out(slot) = cids(best)
      slot += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Two-level (coarse-then-fine) top-`nprobe` probe — the per-row cost
    * fix for the auto-k dial: with k ~ sqrt(n) fine centroids the flat
    * scan is O(k) dots per row, so assignment totals O(n * sqrt(n)).
    * Here the row scores only the ~sqrt(k) COARSE super-centroids,
    * descends into its `wprobe` best groups, and scores just those
    * groups' fine members: per-row work is O(sqrt(k) * (1 + wprobe)) —
    * flat in k for a fixed wprobe. With wprobe = #groups every fine
    * centroid is scored and the selection rule below makes the result
    * BIT-IDENTICAL to [[nearestCentroids]] (the gate/spec contract);
    * smaller wprobe is the standard IVF-style approximation dial.
    *
    * Orderings mirror [[nearestCentroids]] exactly: all dots are the
    * FloatVecDot sequential double fold over min(|v|, dim); coarse
    * groups are picked by (neg cosine, group index) with the same
    * nan-safe compare; the fine winner set is picked by (neg cosine,
    * cid) GLOBALLY across every scored candidate — scan order cannot
    * matter, which is exactly why wprobe = #groups degenerates to the
    * flat result. Same named zero-norm fail-fast. Arrays are flattened
    * group-major: group g owns fine entries [offsets(g), offsets(g+1)). */
  def nearestCentroidsHier(v: org.apache.spark.sql.catalyst.util.ArrayData,
      nprobe: Int, wprobe: Int, dim: Int,
      coarseNorms: Array[Double], coarseCents: Array[Float],
      offsets: Array[Int], cids: Array[Long], norms: Array[Double],
      cents: Array[Float]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val g = coarseNorms.length
    var s = 0.0
    var i = 0
    val vn = v.numElements()
    while (i < vn) {
      val f = v.getFloat(i).toDouble
      s += f * f
      i += 1
    }
    val nrm = math.sqrt(s)
    if (!(nrm > 0.0)) throw new IllegalArgumentException(
      "nearest_centroids: zero-norm (or NaN) vector — cosine assignment " +
        "is undefined; drop or re-embed the row upstream")
    val n = math.min(vn, dim)
    // Stage 1: coarse scores, top-wprobe groups by (neg, group index).
    val cnegs = new Array[Double](g)
    var e = 0
    while (e < g) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        acc += v.getFloat(j).toDouble * coarseCents(e * dim + j).toDouble
        j += 1
      }
      cnegs(e) = 0.0 - acc / (nrm * coarseNorms(e))
      e += 1
    }
    val ctaken = new Array[Boolean](g)
    val picked = new Array[Int](math.min(wprobe, g))
    var slot = 0
    while (slot < picked.length) {
      var best = -1
      var c = 0
      e = 0
      while (e < g) {
        if (!ctaken(e)) {
          if (best < 0) best = e
          else {
            c = if (cnegs(e) == cnegs(best)) 0
              else java.lang.Double.compare(cnegs(e), cnegs(best))
            if (c < 0) best = e
          }
        }
        e += 1
      }
      ctaken(best) = true
      picked(slot) = best
      slot += 1
    }
    // Stage 2: score the picked groups' fine members; select top-nprobe
    // by the SAME (neg, cid) rule as the flat form.
    var ncand = 0
    var p = 0
    while (p < picked.length) {
      ncand += offsets(picked(p) + 1) - offsets(picked(p))
      p += 1
    }
    val candIdx = new Array[Int](ncand)
    val fnegs = new Array[Double](ncand)
    var ci = 0
    p = 0
    while (p < picked.length) {
      e = offsets(picked(p))
      while (e < offsets(picked(p) + 1)) {
        var acc = 0.0
        var j = 0
        while (j < n) {
          acc += v.getFloat(j).toDouble * cents(e * dim + j).toDouble
          j += 1
        }
        candIdx(ci) = e
        fnegs(ci) = 0.0 - acc / (nrm * norms(e))
        ci += 1
        e += 1
      }
      p += 1
    }
    val taken = new Array[Boolean](ncand)
    val out = new Array[Long](math.min(nprobe, ncand))
    slot = 0
    while (slot < out.length) {
      var best = -1
      var c = 0
      ci = 0
      while (ci < ncand) {
        if (!taken(ci)) {
          if (best < 0) best = ci
          else {
            c = if (fnegs(ci) == fnegs(best)) 0
              else java.lang.Double.compare(fnegs(ci), fnegs(best))
            if (c < 0 || (c == 0 && cids(candIdx(ci)) < cids(candIdx(best))))
              best = ci
          }
        }
        ci += 1
      }
      taken(best) = true
      out(slot) = cids(candIdx(best))
      slot += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/**
 * `nearest_centroids_hier(vec)` — [[IvfOps.nearestCentroidsHier]] as one
 * narrow codegen call (the NearestCentroids shape, plus the coarse
 * stage's arrays riding along as reference objects). Generated code is
 * one static call, so it stays inside whole-stage codegen at any k.
 */
case class NearestCentroidsHier(child: Expression, nprobe: Int, wprobe: Int,
    dim: Int, coarseNorms: Array[Double], coarseCents: Array[Float],
    offsets: Array[Int], cids: Array[Long], norms: Array[Double],
    cents: Array[Float])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids_hier"

  override protected def nullSafeEval(a: Any): Any =
    IvfOps.nearestCentroidsHier(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      nprobe, wprobe, dim, coarseNorms, coarseCents, offsets, cids, norms,
      cents)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cnRef = ctx.addReferenceObj("hierCoarseNorms", coarseNorms, "double[]")
    val ccRef = ctx.addReferenceObj("hierCoarseCents", coarseCents, "float[]")
    val offRef = ctx.addReferenceObj("hierOffsets", offsets, "int[]")
    val cidRef = ctx.addReferenceObj("hierCids", cids, "long[]")
    val nrmRef = ctx.addReferenceObj("hierNorms", norms, "double[]")
    val cenRef = ctx.addReferenceObj("hierCents", cents, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.IvfOps.nearestCentroidsHier(" +
        s"$c, $nprobe, $wprobe, $dim, $cnRef, $ccRef, $offRef, $cidRef, " +
        s"$nrmRef, $cenRef);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * `nearest_centroids(vec)` — the top-`nprobe` probe cids in ONE narrow
 * codegen call: the PqEncode/SrpCodes 64 KB lesson applied to centroid
 * assignment. The declarative sort_array-of-k-structs form inlines k
 * dot products + a k-struct sort per row; once the auto-k dial grows
 * past ~a hundred centroids the projection overflows the JVM's 64 KB
 * method limit and the whole stage silently drops to interpreted
 * evaluation (the same failure PqEncode fixed at m=32). Centroids ride
 * along as reference objects; generated code is one static call.
 */
case class NearestCentroids(child: Expression, nprobe: Int, dim: Int,
    cids: Array[Long], norms: Array[Double], cents: Array[Float])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override protected def nullSafeEval(a: Any): Any =
    IvfOps.nearestCentroids(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      nprobe, dim, cids, norms, cents)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidRef = ctx.addReferenceObj("ivfCids", cids, "long[]")
    val nrmRef = ctx.addReferenceObj("ivfNorms", norms, "double[]")
    val cenRef = ctx.addReferenceObj("ivfCents", cents, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.IvfOps.nearestCentroids(" +
        s"$c, $nprobe, $dim, $cidRef, $nrmRef, $cenRef);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * `pq_encode(vec)` — all m PQ subspace codes in ONE narrow codegen call.
 *
 * Why a custom Expression: the declarative form (an m-wide array of
 * sort_array-over-k-struct argmins) generates O(m*k) inline expression
 * code — at m=32, k=16 that single projection overflows the JVM's 64 KB
 * method limit and Spark silently falls back to interpreted evaluation
 * for the whole stage. Here the codebooks ride along as reference
 * objects (driver-trained literals, broadcast with the plan) and the
 * generated code is one static call.
 *
 * Codebooks are flattened entry-major: entry e spans
 * cents[e*subDim, (e+1)*subDim); book mi owns entries
 * [offsets(mi), offsets(mi+1)); norms2(e) is the driver-precomputed
 * sequential-fold ||cent_e||^2.
 */
case class PqEncode(child: Expression, subDim: Int, offsets: Array[Int],
    cids: Array[Long], norms2: Array[Double], cents: Array[Float])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(a: Any): Any =
    PqOps.pqEncode(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      subDim, offsets, cids, norms2, cents)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val offRef = ctx.addReferenceObj("pqOffsets", offsets, "int[]")
    val cidRef = ctx.addReferenceObj("pqCids", cids, "long[]")
    val nrmRef = ctx.addReferenceObj("pqNorms2", norms2, "double[]")
    val cenRef = ctx.addReferenceObj("pqCents", cents, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqOps.pqEncode(" +
        s"$c, $subDim, $offRef, $cidRef, $nrmRef, $cenRef);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * `pq_lut(qvec)` — the per-query ADC lookup table as one
 * array<struct<m, cid, p>>: for every codebook entry, the double dot
 * product of the query's subspace slice with that entry's centroid
 * (same sequential fold as FloatVecDot, so the DuckDB oracle replays it
 * bit-for-bit). Same 64 KB rationale as PqEncode: the declarative
 * m*k-struct array overflowed the method limit at m=32.
 */
case class PqLut(child: Expression, subDim: Int, offsets: Array[Int],
    cids: Array[Long], cents: Array[Float])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("m", LongType, nullable = false),
    StructField("cid", LongType, nullable = false),
    StructField("p", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(a: Any): Any =
    PqOps.pqLut(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      subDim, offsets, cids, cents)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val offRef = ctx.addReferenceObj("pqOffsets", offsets, "int[]")
    val cidRef = ctx.addReferenceObj("pqCids", cids, "long[]")
    val cenRef = ctx.addReferenceObj("pqCents", cents, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqOps.pqLut(" +
        s"$c, $subDim, $offRef, $cidRef, $cenRef);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Driver-built array payloads for the broadcast-backed quantizer
  * expressions: one torrent-distributed copy per executor instead of a
  * plan-embedded literal re-shipped inside every task closure. At the
  * auto dial's k ~ 22,000 x dim 64 the centroid floats alone are
  * ~5.6 MB — the exact plan-size hazard [[BloomMightContainLongBcast]]
  * already solved for big Bloom filters; these are its quantizer twins. */
case class CentroidArrays(cids: Array[Long], norms: Array[Double],
    cents: Array[Float]) extends Serializable

case class HierArrays(coarseNorms: Array[Double], coarseCents: Array[Float],
    offsets: Array[Int], cids: Array[Long], norms: Array[Double],
    cents: Array[Float]) extends Serializable

case class PqArrays(offsets: Array[Int], cids: Array[Long],
    norms2: Array[Double], cents: Array[Float]) extends Serializable

/**
 * Broadcast-backed twin of [[NearestCentroids]]: same
 * [[IvfOps.nearestCentroids]] loop bit-for-bit, but the quantizer arrays
 * ride a Spark broadcast (resolved ONCE per operator instance via
 * codegen mutable state) instead of the serialized plan.
 * [[graft.operators.Similarity]] switches to this form automatically
 * past `spark.graft.quantizer.bcastFromBytes` of array payload.
 */
case class NearestCentroidsBcast(child: Expression, nprobe: Int, dim: Int,
    bc: org.apache.spark.broadcast.Broadcast[CentroidArrays])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids_bcast"

  override protected def nullSafeEval(a: Any): Any = {
    val q = bc.value
    IvfOps.nearestCentroids(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      nprobe, dim, q.cids, q.norms, q.cents)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("ivfBc", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val q = ctx.addMutableState("graft.functions.CentroidArrays", "ivfQ",
      v => s"$v = (graft.functions.CentroidArrays) " +
        s"((org.apache.spark.broadcast.Broadcast) $bcRef).value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.IvfOps.nearestCentroids(" +
        s"$c, $nprobe, $dim, $q.cids(), $q.norms(), $q.cents());")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Broadcast-backed twin of [[NearestCentroidsHier]] — same loop, arrays
  * from a broadcast resolved once per operator instance. */
case class NearestCentroidsHierBcast(child: Expression, nprobe: Int,
    wprobe: Int, dim: Int,
    bc: org.apache.spark.broadcast.Broadcast[HierArrays])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids_hier_bcast"

  override protected def nullSafeEval(a: Any): Any = {
    val q = bc.value
    IvfOps.nearestCentroidsHier(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      nprobe, wprobe, dim, q.coarseNorms, q.coarseCents, q.offsets, q.cids,
      q.norms, q.cents)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("hierBc", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val q = ctx.addMutableState("graft.functions.HierArrays", "hierQ",
      v => s"$v = (graft.functions.HierArrays) " +
        s"((org.apache.spark.broadcast.Broadcast) $bcRef).value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.IvfOps.nearestCentroidsHier(" +
        s"$c, $nprobe, $wprobe, $dim, $q.coarseNorms(), $q.coarseCents(), " +
        s"$q.offsets(), $q.cids(), $q.norms(), $q.cents());")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Broadcast-backed twin of [[PqEncode]] — same loop, codebooks from a
  * broadcast resolved once per operator instance. */
case class PqEncodeBcast(child: Expression, subDim: Int,
    bc: org.apache.spark.broadcast.Broadcast[PqArrays])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode_bcast"

  override protected def nullSafeEval(a: Any): Any = {
    val q = bc.value
    PqOps.pqEncode(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      subDim, q.offsets, q.cids, q.norms2, q.cents)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("pqBc", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val q = ctx.addMutableState("graft.functions.PqArrays", "pqQ",
      v => s"$v = (graft.functions.PqArrays) " +
        s"((org.apache.spark.broadcast.Broadcast) $bcRef).value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqOps.pqEncode(" +
        s"$c, $subDim, $q.offsets(), $q.cids(), $q.norms2(), $q.cents());")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object SrpOps {
  /** All `numTables` SRP bucket codes of one vector in one loop:
    * projection = sequential-fold double dot of the vector against the
    * (+-1-as-float) hyperplane (the SAME fold as FloatVecDot), bit p of
    * table t set iff its projection > 0.0 — bit-identical to the
    * unrolled srpCode column form (`when(dot > 0, 1L<<p)` summed in p
    * order) it replaces. `planes` is flattened [t][p][k]; fails fast on
    * a dimension mismatch (zip_with would null-pad and collapse every
    * code to 0). */
  def codes(v: org.apache.spark.sql.catalyst.util.ArrayData, numTables: Int,
      numPlanes: Int, dim: Int, planes: Array[Float])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"srp_codes: expected vector dim=$dim, got ${v.numElements()}")
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var code = 0L
      var p = 0
      while (p < numPlanes) {
        val base = (t * numPlanes + p) * dim
        var acc = 0.0
        var k = 0
        while (k < dim) {
          acc += v.getFloat(k).toDouble * planes(base + k).toDouble
          k += 1
        }
        if (acc > 0.0) code += (1L << p)
        p += 1
      }
      out(t) = code
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/**
 * `srp_codes(vec)` — all numTables SRP bucket codes as one array<long>.
 * Same 64 KB rationale as PqEncode: the declarative form inlines
 * numTables x numPlanes dot products (the auto-dialed near-dup config
 * reaches 123 x 9 = 1107 at sf1), overflowing the codegen method limit
 * and dropping the stage to interpreted evaluation; here the work is a
 * loop over a flattened plane literal shipped once per task.
 */
case class SrpCodes(child: Expression, numTables: Int, numPlanes: Int,
    dim: Int, planes: Array[Float])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_codes"

  override protected def nullSafeEval(a: Any): Any =
    SrpOps.codes(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      numTables, numPlanes, dim, planes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val plRef = ctx.addReferenceObj("srpPlanes", planes, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SrpOps.codes(" +
        s"$c, $numTables, $numPlanes, $dim, $plRef);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
