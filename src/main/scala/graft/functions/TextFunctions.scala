package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftbridge.GraftSqlBridge

/**
 * SQL registration for the text/vector codegen expression family — the
 * same install path as the `randgen_*` generators (and the reference's
 * `add_udfs`, `/root/reference/src/lib.rs:8-10`): after
 * `--conf spark.sql.extensions=graft.GraftExtensions` (or
 * `registerAll`), a SQL-only user gets the dedup/similarity primitives
 * without touching the Column API:
 *
 *   SELECT graft_minhash_sig(text, 3, 32) FROM docs
 *   SELECT graft_vec_dot(a.embedding, b.embedding) FROM ...
 *
 * Structural parameters (gram size, permutation count, bit width) must
 * be integer LITERALS — they parameterize generated code, not per-row
 * data, exactly like a window frame size.
 */
object TextFunctions {

  private def intLit(name: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) if v.isValidInt => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name: structural argument must be an integer literal, got $other")
  }

  /** Name -> expression builder for the whole family. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_rolling_hash" -> {
      case Seq(t) => RollingHash(t)
      case args => throw new IllegalArgumentException(
        s"graft_rolling_hash expects (text), got ${args.length}")
    },
    "graft_normalize_text" -> {
      case Seq(t) => NormalizeText(t)
      case args => throw new IllegalArgumentException(
        s"graft_normalize_text expects (text), got ${args.length}")
    },
    "graft_char_grams" -> {
      case Seq(t, n) => CharGrams(t, intLit("graft_char_grams", n))
      case args => throw new IllegalArgumentException(
        s"graft_char_grams expects (text, n), got ${args.length}")
    },
    "graft_word_shingles" -> {
      case Seq(t, k) => WordShingles(t, intLit("graft_word_shingles", k))
      case args => throw new IllegalArgumentException(
        s"graft_word_shingles expects (text, k), got ${args.length}")
    },
    "graft_word_grams" -> {
      case Seq(t, k) => WordGramsAll(t, intLit("graft_word_grams", k))
      case args => throw new IllegalArgumentException(
        s"graft_word_grams expects (text, k), got ${args.length}")
    },
    "graft_bottomk_hashes" -> {
      case Seq(t, n, k) => BottomKHashes(t,
        intLit("graft_bottomk_hashes", n), intLit("graft_bottomk_hashes", k))
      case args => throw new IllegalArgumentException(
        s"graft_bottomk_hashes expects (text, n, k), got ${args.length}")
    },
    "graft_simhash" -> {
      case Seq(t, b) => SimhashBits(t, intLit("graft_simhash", b))
      case args => throw new IllegalArgumentException(
        s"graft_simhash expects (text, bits), got ${args.length}")
    },
    "graft_minhash_sig" -> {
      case Seq(t, k, p) =>
        val numPerm = intLit("graft_minhash_sig", p)
        val coeffs = graft.operators.Dedup.minhashCoeffs(numPerm)
        MinhashSig(t, intLit("graft_minhash_sig", k),
          coeffs.map(_._1), coeffs.map(_._2),
          graft.operators.Dedup.MinhashPrime)
      case args => throw new IllegalArgumentException(
        s"graft_minhash_sig expects (text, shingleK, numPerm), got ${args.length}")
    },
    "graft_vec_dot" -> {
      case Seq(a, b) => FloatVecDot(a, b)
      case args => throw new IllegalArgumentException(
        s"graft_vec_dot expects (vecA, vecB), got ${args.length}")
    },
    "graft_vec_quantize_int8" -> {
      case Seq(v) => FloatVecQuantizeInt8(v)
      case args => throw new IllegalArgumentException(
        s"graft_vec_quantize_int8 expects (vec), got ${args.length}")
    },
  )

  /** Installs the whole family as temp functions in `spark`'s session. */
  def registerAll(spark: SparkSession): Unit = {
    val registry = GraftSqlBridge.functionRegistry(spark)
    all.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
