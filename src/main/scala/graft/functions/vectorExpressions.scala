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
