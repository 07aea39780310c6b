package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.LongType

/**
 * Cross-engine deterministic text hashing / shingling columns shared by the
 * dedup + text-analysis operators (SURVEY.md §2.5).
 *
 * All hashing is md5-based so the DuckDB oracle can reproduce values
 * bit-for-bit: `hash60(x)` = first 15 hex chars of md5 as a 60-bit BIGINT
 * (Spark `conv(substr(md5(x),1,15),16,10)` == DuckDB
 * `('0x' || substr(md5(x),1,15))::BIGINT`). Everything stays inside
 * whole-stage codegen — built-in functions only, no UDFs.
 */
object TextHash {

  /** Deterministic 60-bit non-negative hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** `hash60` decorrelated by an integer permutation index (for MinHash). */
  def hash60Perm(perm: Int, c: Column): Column =
    hash60(concat(lit(s"$perm:"), c))

  /** Distinct word k-shingles of a space-separated text column; documents
    * shorter than k words collapse to a single whole-text shingle.
    * Native codegen expression (graft.functions.WordShingles); the
    * semantically-identical HOF form below exists as its test oracle. */
  def wordShingles(text: Column, k: Int): Column =
    GraftSqlBridge.column(
      graft.functions.WordShingles(GraftSqlBridge.expression(text), k))

  /** Distinct character n-grams; texts shorter than n collapse to one gram.
    * Native codegen expression (graft.functions.CharGrams). */
  def charGrams(text: Column, n: Int): Column =
    GraftSqlBridge.column(
      graft.functions.CharGrams(GraftSqlBridge.expression(text), n))

  /** Interpreted higher-order-function form of `wordShingles` — kept as the
    * in-engine oracle for the codegen expression (TextAnalysisSpec asserts
    * equality); ~50x slower per element, do not use on hot paths. */
  def wordShinglesHof(text: Column, k: Int): Column = {
    val toks = split(text, " ")
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** Interpreted HOF form of `charGrams` — test oracle only. */
  def charGramsHof(text: Column, n: Int): Column =
    array_distinct(
      when(length(text) >= n,
        transform(sequence(lit(1), length(text) - (n - 1)),
          i => text.substr(i, lit(n))))
        .otherwise(array(text)))
}
