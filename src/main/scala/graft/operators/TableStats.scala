package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * ANALYZE-style column statistics (SURVEY.md §2.5): per-column min, max,
 * null count, and exact NDV in ONE pass over the table, long-format —
 * the stats table a cost-based optimizer (or a human sizing a join
 * strategy) reads before planning, and the first artifact a pipeline
 * publishes about a new dataset.
 *
 * Scale shape: all per-column aggregates fold into a single `agg` over
 * one scan; Catalyst plans the multiple DISTINCT aggregates via Expand
 * (rows × #distinct-columns before the partial aggregate — map-side,
 * never a second scan). At 100 TB swap `count_distinct` for
 * `approx_count_distinct` (HLL): the Expand collapses into plain
 * partial aggregation and NDV stays one sketch per column — same
 * output schema, property-bounded accuracy (the engine's HLL gate
 * `rel_q_approx_distinct` covers that path). The exact form here is the
 * oracle-replayable contract.
 */
object TableStats {

  /**
   * Long-format stats for `cols`: (col_name, min_val, max_val, n_nulls,
   * ndv). Min/max are canonicalized to strings AFTER aggregating (so
   * numeric ordering applies, not lexicographic). `castTo` normalizes a
   * column before all stats (e.g. timestamp -> date) so both engines
   * aggregate the same domain.
   */
  def columnStats(df: DataFrame, cols: Seq[String],
      castTo: Map[String, String] = Map.empty): DataFrame = {
    require(cols.nonEmpty, "columnStats: at least one column")
    val aggs = cols.flatMap { c =>
      val base = castTo.get(c).map(t => col(c).cast(t)).getOrElse(col(c))
      Seq(min(base).cast("string").as(s"__min_$c"),
        max(base).cast("string").as(s"__max_$c"),
        (count(lit(1)) - count(base)).as(s"__nulls_$c"),
        count_distinct(base).as(s"__ndv_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __min_$c, __max_$c, __nulls_$c, __ndv_$c").mkString(", ")
    wide.select(expr(s"stack(${cols.size}, $stackArgs) " +
      "as (col_name, min_val, max_val, n_nulls, ndv)"))
  }
}
