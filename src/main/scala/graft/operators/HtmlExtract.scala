package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * HTML → text extraction for web-corpus ingestion (SURVEY.md §2.5 layer
 * C): real training corpora start from markup, not clean text. Two
 * layers:
 *
 *  - [[stripMarkup]]: whole-page visible text (script/style/comment
 *    removal FIRST — their bodies may contain bare `<` that would derail
 *    tag stripping — then tag strip, entity decode, whitespace collapse);
 *  - [[extractMainContent]]: block-level boilerplate removal — the
 *    link-density heuristic that drops nav bars / ad units / footers
 *    (blocks whose anchor-text chars exceed `num/den` of visible chars)
 *    and keeps prose, preserving block order. The output feeds the
 *    paragraph machinery (`Dedup.paragraphDedup`) unchanged.
 *
 * Everything is built-in regexp/string functions in the Java-regex ∩ RE2
 * common subset (non-greedy, `(?s)`, `(?:)` — no backreferences, no
 * lookaround), so the DuckDB oracle replays extraction exactly and it all
 * stays inside whole-stage codegen. This is a heuristic extractor, not an
 * HTML parser: nested same-tag blocks split at the first closer (the
 * standard trade for a single-pass regex pipeline at corpus scale — one
 * narrow projection per document, no shuffle until the per-doc regroup).
 *
 * Scale shape: per-block scoring is a narrow posexplode + codegen'd
 * regexp projection; the only exchange is the final groupBy(doc_id)
 * regroup, keyed the same as every other per-doc text stage.
 */
object HtmlExtract {

  /** Top-level prose/container blocks (first-closer semantics). */
  val BlockPattern = "(?s)<(?:p|div)[^>]*>(.*?)</(?:p|div)>"

  /** Anchor text (tag-free by construction: `[^<]*`). */
  val AnchorPattern = "<a[^>]*>([^<]*)</a>"

  private def dropInvisible(html: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " "),
        "(?s)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")

  /** Minimal HTML entity decode; `&amp;` last so `&amp;lt;` cannot
    * double-decode. */
  private def decodeEntities(c: Column): Column = {
    val pairs = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    pairs.foldLeft(c) { case (acc, (e, r)) => regexp_replace(acc, e, r) }
  }

  private def collapse(c: Column): Column =
    trim(regexp_replace(c, " +", " "))

  /** Whole-page visible text: invisible elements removed, tags stripped,
    * entities decoded, whitespace collapsed. */
  def stripMarkup(html: Column): Column =
    collapse(decodeEntities(
      regexp_replace(dropInvisible(html), "<[^>]*>", " ")))

  /**
   * Block-level main-content extraction: every `<p>`/`<div>` block is
   * scored by link density — anchor-text chars vs visible chars, both
   * measured on the RAW (entity-undecoded) text so the measure is a pure
   * integer cross-multiply (`alen * den <= vlen * num` ⇔ density ≤
   * num/den) — and dropped when link-heavy. Returns one row per document
   * that has at least one block: total/kept block counts and the kept
   * blocks' decoded text joined in original order.
   */
  def extractMainContent(docs: DataFrame, idCol: String, htmlCol: String,
      num: Int = 1, den: Int = 3): DataFrame = {
    require(num >= 0 && den > 0, "extractMainContent: density num/den")
    val raw = regexp_replace(col("blk"), "<[^>]*>", " ")
    val alen = length(array_join(
      regexp_extract_all(col("blk"), lit(AnchorPattern), lit(1)), ""))
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(regexp_extract_all(col(htmlCol), lit(BlockPattern),
          lit(1))).as(Seq("pos", "blk")))
      .select(col("doc_id"), col("pos"),
        collapse(raw).as("vtxt"),
        collapse(decodeEntities(raw)).as("ctxt"),
        alen.as("alen"))
      .withColumn("keep", col("alen") * den <= length(col("vtxt")) * num)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            sort_array(collect_list(
              when(col("keep"), struct(col("pos"), col("ctxt"))))),
            x => x.getField("ctxt")),
          " ").as("content"))
  }
}
