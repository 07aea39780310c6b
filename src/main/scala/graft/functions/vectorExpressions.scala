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
