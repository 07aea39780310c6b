package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality expectations (the deequ/dbt-test shape): a
 * rule set of named boolean predicates is evaluated per row, every row
 * gets its list of violated rules, and the caller routes clean vs
 * quarantined rows — nothing is silently dropped, the quarantine carries
 * WHY each row failed.
 *
 * Scale: one narrow codegen'd map (all rules fuse into the scan); the
 * split is two filters over the same cached/scanned frame. Null
 * semantics: a rule whose predicate evaluates to NULL (e.g. `col > 0` on
 * a NULL) counts as VIOLATED — unknown is not a pass, the same
 * discipline as SQL CHECK constraints under `NOT coalesce(cond, false)`.
 */
object Expectations {

  /** Adds `violations` (array of failed rule names, rule order) and
    * `is_clean`. */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "check: need at least one rule")
    require(!df.columns.contains("violations") && !df.columns.contains("is_clean"),
      "check: input already has a 'violations'/'is_clean' column — the audit " +
        "columns would silently replace it; rename the input column first")
    val marks = rules.map { case (name, cond) =>
      when(!coalesce(cond, lit(false)), lit(name))
    }
    df.withColumn("violations",
        filter(array(marks: _*), v => v.isNotNull))
      .withColumn("is_clean", size(col("violations")) === 0)
  }

  /** (clean rows without audit columns, quarantined rows with them). */
  def split(df: DataFrame, rules: Seq[(String, Column)])
      : (DataFrame, DataFrame) = {
    val checked = check(df, rules)
    (checked.where(col("is_clean")).drop("violations", "is_clean"),
      checked.where(!col("is_clean")))
  }
}
