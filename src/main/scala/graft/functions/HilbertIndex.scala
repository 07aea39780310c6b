package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Hilbert-curve arithmetic (the classic iterative xy<->d mapping —
 * public-domain pseudocode, see e.g. Hamilton, "Compact Hilbert Indices",
 * CS-2006-07, and the Wikipedia "Hilbert curve" reference
 * implementation). A top-level object so whole-stage codegen can call it
 * through the class's static forwarder.
 */
object HilbertCurve {

  /** Curve position d of grid cell (x, y) on the order-`bits` curve.
    * Keys outside [0, 2^bits) fail fast — out-of-grid bits would fold
    * silently onto wrong curve positions. */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    if (((x0 | y0) >>> bits) != 0L || x0 < 0L || y0 < 0L) {
      throw new IllegalArgumentException(
        s"hilbert: keys ($x0, $y0) outside [0, 2^$bits)")
    }
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // Rotate the quadrant so the sub-curve orientation lines up.
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Grid cell (x, y) at curve position d — the inverse, used by specs
    * to prove the adjacency property without re-deriving the math. */
  def d2xy(bits: Int, d0: Long): (Long, Long) = {
    var (x, y) = (0L, 0L)
    var t = d0
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2L)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4L
      s <<= 1
    }
    (x, y)
  }
}

/**
 * `HilbertIndex(a, b, bits)` — curve position of the (a, b) cell on the
 * order-`bits` Hilbert curve, as ONE codegen'd expression (a Column-level
 * fold over the bit levels would re-embed the previous level's whole
 * expression tree at every field reference — exponential plan growth).
 * Unlike the Z-curve, consecutive Hilbert positions are always
 * GRID-ADJACENT (|dx| + |dy| = 1), so files cut from a code sort never
 * teleport across the key space at quadrant seams — tighter per-file
 * min/max spans for the same write cost (see
 * [[graft.operators.Layout.hilbertWrite]]).
 */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(bits > 0 && bits <= 31, s"HilbertIndex: bits in [1, 31], got $bits")

  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_index"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertCurve.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertCurve.xy2d($bits, $a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
