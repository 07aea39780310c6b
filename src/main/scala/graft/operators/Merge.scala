package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Keyed merge operators (SURVEY.md §2.5 layer C): MERGE-INTO-style upsert
 * and SCD2 (slowly-changing-dimension, type 2) history maintenance — the
 * two standard shapes for applying change batches to large tables.
 *
 * Scale design: both are key-partitioned joins plus unions — one shuffle
 * per input keyed by the merge key. At 100 TB the base/current table
 * lives bucketed on the key, so the join co-locates and only the (small)
 * change batch shuffles; nothing here sorts globally or collects.
 */
object Merge {

  /**
   * MERGE-INTO upsert: every base row whose key appears in `updates` is
   * replaced by the update row; update rows with new keys are inserted;
   * all other base rows pass through. `updates` must be unique per key
   * (pre-aggregate a CDC stream with keep-latest before calling).
   */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    base.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)
  }

  /**
   * SCD2 apply: `current` carries (keys, attrs, validFromCol,
   * validToCol) with NULL validTo marking the open row per key;
   * `changes` carries (keys, attrs) all effective at `effective`.
   * Returns the new history:
   *  - open rows whose key arrives with DIFFERENT attrs are closed
   *    (validTo = effective) and a new open row is appended;
   *  - changes for unknown keys insert a new open row;
   *  - changes identical to the open row are no-ops (no spurious
   *    versions);
   *  - closed history and untouched open rows pass through unchanged.
   * Attribute comparison is null-safe per column.
   */
  def scd2Apply(current: DataFrame, changes: DataFrame, keys: Seq[String],
      attrs: Seq[String], validFromCol: String, validToCol: String,
      effective: Column): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "scd2 needs keys and attrs")
    val open = current.where(col(validToCol).isNull)
    val closed = current.where(col(validToCol).isNotNull)

    val chg = changes.select(
      keys.map(col) ++ attrs.map(c => col(c).as(s"__c_$c")): _*)
    // Side markers survive the full outer join where attr nullability
    // can't (a NULL attr is a legal value, not an absence witness).
    val j2 = open.withColumn("__open", lit(true))
      .join(chg.withColumn("__chg", lit(true)), keys, "full_outer")
    val same = attrs.map(c => col(c) <=> col(s"__c_$c")).reduce(_ && _)
    val openSide = col("__open").isNotNull
    val chgSide = col("__chg").isNotNull

    // 1. untouched open rows, and no-op changes: keep the open row
    val kept = j2.where(openSide && (!chgSide || same))
      .select(current.columns.map(col): _*)
    // 2. open rows superseded by a real change: close at `effective`
    val closedNow = j2.where(openSide && chgSide && !same)
      .select(current.columns.map(c =>
        if (c == validToCol) effective.cast(current.schema(c).dataType).as(c)
        else col(c)): _*)
    // 3. new open rows: real changes and brand-new keys
    val opened = j2.where(chgSide && (!openSide || !same))
      .select(current.columns.map(c =>
        if (attrs.contains(c)) col(s"__c_$c").as(c)
        else if (c == validFromCol) effective.cast(current.schema(c).dataType).as(c)
        else if (c == validToCol) lit(null).cast(current.schema(c).dataType).as(c)
        else col(c)): _*)

    closed.unionByName(kept).unionByName(closedNow).unionByName(opened)
  }

  /**
   * CDC changelog apply: folds a raw change log of (keys, attrs, seqCol,
   * opCol) rows — opCol in {"I","U","D"} — into a base snapshot. The log
   * may arrive OUT OF ORDER and may carry many rows per key; per key the
   * row with the highest sequence number wins:
   *  - winner op I/U: the key's row in the result is the winner's attrs
   *    (insert-or-replace — upsert semantics);
   *  - winner op D: the key is absent from the result;
   *  - keys never mentioned in the log pass through from base unchanged.
   * Sequence numbers must be unique per key (the CDC source's log offset
   * is); with duplicates the winner among equals is unspecified.
   *
   * Scale shape: one window shuffle of the LOG keyed by the merge key
   * (the log is the small, recent side), then one key-partitioned
   * left-anti join against base plus a union — the same single-shuffle
   * shape as [[upsert]]. At 100 TB base lives bucketed on the key, so the
   * anti join co-locates and only the change batch moves.
   */
  def applyChangelog(base: DataFrame, log: DataFrame, keys: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    require(keys.nonEmpty, "applyChangelog needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    val winners = log
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
    val upserts = winners.where(col(opCol) =!= "D")
      .select(base.columns.map(col): _*)
    base.join(winners.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(upserts)
  }

  /**
   * Time-travel read: the table AS OF sequence number `asOfSeq` — the
   * changelog fold restricted to entries with seq <= asOfSeq. Because
   * [[applyChangelog]] folds by per-key max-seq, any historical version
   * is reconstructable from base + log alone; no per-version snapshot
   * storage. Same single-shuffle scale shape — the seq filter only
   * SHRINKS the log side.
   */
  def snapshotAsOf(base: DataFrame, log: DataFrame, keys: Seq[String],
      seqCol: String, opCol: String, asOfSeq: Long): DataFrame =
    applyChangelog(base, log.where(col(seqCol) <= asOfSeq), keys,
      seqCol, opCol)

  /**
   * Diff of two snapshots of the same schema: one row per key whose state
   * changed, op in I (only in `after`), D (only in `before`), U (present
   * in both, any non-key attribute differs — null-safe compare).
   * Unchanged keys are absent. One key-partitioned full-outer join; at
   * rest both snapshots live bucketed on the key, so it co-locates.
   */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(before.columns.sameElements(after.columns),
      "snapshotDiff: schemas must match")
    val attrs = before.columns.filterNot(keys.contains)
    require(attrs.nonEmpty, "snapshotDiff: no non-key attributes")
    val b = before.select(keys.map(col) :+
      struct(attrs.map(col): _*).as("__b"): _*)
    val a = after.select(keys.map(col) :+
      struct(attrs.map(col): _*).as("__a"): _*)
    b.join(a, keys, "full_outer")
      .withColumn("op",
        when(col("__a").isNull, "D")
          .when(col("__b").isNull, "I")
          .when(!(col("__a") <=> col("__b")), "U"))
      .where(col("op").isNotNull)
      .select(keys.map(col) :+ col("op"): _*)
  }
}
