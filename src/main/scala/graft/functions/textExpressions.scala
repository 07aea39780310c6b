package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native shingling expressions for the dedup/text family.
 *
 * Why custom Expressions (SURVEY.md §7.3 preference (b)): the composed
 * built-in forms (`array_distinct(transform(sequence(...), i -> ...))`)
 * evaluate an interpreted lambda per array element — measured ~50x slower
 * than codegen on the sf0.1 dedup benchmarks, and shingling sits on the
 * hot path of every MinHash/n-gram query (one call per document, one
 * lambda invocation per token/char position). These expressions compile to
 * a single static call inside whole-stage codegen with a tight loop over
 * decoded code points.
 *
 * Semantics contract (bit-identical to the HOF forms and the DuckDB
 * oracles, asserted in TextAnalysisSpec):
 *  - `CharGrams(text, n)`: distinct character n-grams (code-point based,
 *    matching SQL substr/length), first-occurrence order; texts shorter
 *    than n collapse to a single whole-text gram.
 *  - `WordShingles(text, k)`: split on single spaces (empty tokens kept,
 *    like `split(text, ' ', -1)`), distinct space-joined k-shingles in
 *    first-occurrence order; texts shorter than k words collapse to the
 *    whole text.
 */
object TextGramsUtil {

  def charGrams(text: UTF8String, n: Int): ArrayData =
    toUtf8Array(charGramSet(text, n))

  private def wordShingleSet(text: UTF8String, k: Int): java.util.LinkedHashSet[String] = {
    val toks = text.toString.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]
    if (toks.length < k) { seen.add(toks.mkString(" ")); return seen }
    val sb = new java.lang.StringBuilder
    var i = 0
    val last = toks.length - k
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen
  }

  def wordShingles(text: UTF8String, k: Int): ArrayData =
    toUtf8Array(wordShingleSet(text, k))

  /** EVERY word k-gram in order, duplicates kept (the LM-counts contract,
    * unlike the dedup shingles' distinct set); a doc shorter than k words
    * has no k-gram and yields an empty array. */
  def wordGramsAll(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Full MinHash signature in one narrow call: for every distinct word
    * k-shingle, h = hash60 % p, then sig[j] = min (a_j*h + b_j) % p —
    * identical arithmetic to the explode + 32-way min-aggregate form, but
    * with NO shuffle (the aggregate form ships every shingle row into a
    * HashAggregate; at corpus scale that is the dominant movement of the
    * whole minhash pipeline). Coefficients must be the md5-derived
    * universal-hash family the DuckDB oracle embeds. */
  def minhashSig(text: UTF8String, k: Int, as: Array[Long], bs: Array[Long],
      prime: Long): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val numPerm = as.length
    val sig = Array.fill(numPerm)(Long.MaxValue)
    val it = wordShingleSet(text, k).iterator()
    while (it.hasNext) {
      val h = hash60(md, it.next()) % prime
      var j = 0
      while (j < numPerm) {
        val v = (as(j) * h + bs(j)) % prime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
    }
    new GenericArrayData(sig.map(x => x: Any))
  }

  /** Distinct code-point n-grams of `text` as Java strings (shared by
    * charGrams and bottomKHashes). */
  private def charGramSet(text: UTF8String, n: Int): java.util.LinkedHashSet[String] = {
    val s = text.toString
    val cps = s.codePoints().toArray
    val seen = new java.util.LinkedHashSet[String]
    if (cps.length < n) { seen.add(s); return seen }
    var i = 0
    val last = cps.length - n
    while (i <= last) {
      seen.add(new String(cps, i, n))
      i += 1
    }
    seen
  }

  /** hash60 of a string: first 15 hex chars of md5 as a 60-bit long —
    * byte-identical to the SQL `conv(substr(md5(x),1,15),16,10)` form and
    * to DuckDB's `('0x'||substr(md5(x),1,15))::BIGINT`. */
  private def hash60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    // First 15 hex chars = first 7.5 bytes.
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** The k smallest hash60 values over the text's distinct char n-grams
    * (ties broken by gram string ascending), ascending — the bottom-k
    * fingerprint computed in ONE narrow call instead of exploding every
    * gram through a per-document shuffle + window. */
  def bottomKHashes(text: UTF8String, n: Int, k: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams = charGramSet(text, n)
    val pairs = new Array[(Long, String)](grams.size)
    val it = grams.iterator()
    var i = 0
    while (it.hasNext) {
      val g = it.next()
      pairs(i) = (hash60(md, g), g)
      i += 1
    }
    val sorted = pairs.sortBy(identity)
    val m = math.min(k, sorted.length)
    val out = new Array[Any](m)
    i = 0
    while (i < m) { out(i) = sorted(i)._1; i += 1 }
    new GenericArrayData(out)
  }

  /** Term-frequency-weighted SimHash over whitespace tokens (repeated
    * tokens vote repeatedly), bit-identical to the explode + per-bit
    * vote-sum aggregate form: bit b is set iff
    * sum over tokens of (+1 if hash60(tok) bit b else -1) > 0. */
  def simhashBits(text: UTF8String, bits: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Long](bits)
    var i = 0
    while (i < toks.length) {
      val h = hash60(md, toks(i))
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Polynomial rolling hash: fold (acc*31 + codePoint) % 2147483647 over
    * the text's code points — matches the SQL form
    * `aggregate(transform(sequence(...), i -> ascii(substr(text,i,1))), ...)`
    * (ascii() yields the first code point of the 1-char substring). */
  def rollingHash(text: UTF8String): Long = {
    val s = text.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }

  /** NFC -> accent strip (NFD + drop \p{Mn} combining marks + NFC) ->
    * lowercase(ROOT). Kept to canonical (not compatibility) forms so
    * ligatures/full-width chars survive, matching DuckDB
    * lower(strip_accents(nfc_normalize(x))). */
  def normalizeText(text: UTF8String): UTF8String = {
    import java.text.Normalizer
    val nfc = Normalizer.normalize(text.toString, Normalizer.Form.NFC)
    val decomposed = Normalizer.normalize(nfc, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val cp = decomposed.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    val stripped = Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
    UTF8String.fromString(stripped.toLowerCase(java.util.Locale.ROOT))
  }

  private def toUtf8Array(seen: java.util.LinkedHashSet[String]): ArrayData = {
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }
}

case class CharGrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_grams"

  override protected def nullSafeEval(t: Any): Any =
    TextGramsUtil.charGrams(t.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextGramsUtil.charGrams($c, $n);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class BottomKHashes(child: Expression, n: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k_hashes"

  override protected def nullSafeEval(t: Any): Any =
    TextGramsUtil.bottomKHashes(t.asInstanceOf[UTF8String], n, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextGramsUtil.bottomKHashes($c, $n, $k);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class SimhashBits(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override protected def nullSafeEval(t: Any): Any =
    TextGramsUtil.simhashBits(t.asInstanceOf[UTF8String], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextGramsUtil.simhashBits($c, $bits);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class MinhashSig(child: Expression, k: Int, as: Array[Long],
    bs: Array[Long], prime: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(t: Any): Any =
    TextGramsUtil.minhashSig(t.asInstanceOf[UTF8String], k, as, bs, prime)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextGramsUtil.minhashSig(" +
        s"$c, $k, $asRef, $bsRef, ${prime}L);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(t: Any): Any =
    TextGramsUtil.rollingHash(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextGramsUtil.rollingHash($c);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(t: Any): Any =
    TextGramsUtil.wordShingles(t.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextGramsUtil.wordShingles($c, $k);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `word_grams_all(text, k)` — every word k-gram in order, duplicates
  * kept (LM counts need occurrences, not the dedup shingle SET). Same
  * codegen-static-helper shape as WordShingles. */
case class WordGramsAll(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams_all"

  override protected def nullSafeEval(t: Any): Any =
    TextGramsUtil.wordGramsAll(t.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextGramsUtil.wordGramsAll($c, $k);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `normalize_text(text)` — Unicode NFC, accent strip (NFD decompose +
  * drop combining marks, recompose), then lowercase: the standard
  * pre-tokenization canonicalization of multilingual web text. Matches
  * DuckDB `lower(strip_accents(nfc_normalize(x)))` on Latin accents
  * (é→e, ü→u, ñ→n, ç→c …); compatibility characters (ligatures, full-
  * width forms) are deliberately PRESERVED on both engines (NFC, not
  * NFKC). One static call inside whole-stage codegen; the java.text
  * Normalizer works on the decoded string once per row. */
case class NormalizeText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(t: Any): Any =
    TextGramsUtil.normalizeText(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextGramsUtil.normalizeText($c);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
