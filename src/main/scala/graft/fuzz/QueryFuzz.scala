package graft.fuzz

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Seeded random-query generation — the reference's raison d'être turned
 * on this engine itself. corasaurus-hex/datafusion-randgen exists to
 * feed randomized inputs through a SQL engine and catch divergence
 * (`/root/reference/src/lib.rs:8-10` installs its generator UDF into a
 * host session precisely so test harnesses can randomize queries); here
 * the same idea runs at the QUERY level: a deterministic grammar over
 * the TPC-H-ish catalog (TESTDATA.md) emits a battery of
 * dialect-portable SQL queries, every query is reduced to one
 * (qid, n_rows, digest) row, and the battery's UNION ALL runs VERBATIM
 * on both Spark and the DuckDB oracle — any cross-engine semantic
 * divergence (join, predicate, aggregate, null, or numeric) surfaces as
 * a digest mismatch on the named qid.
 *
 * Dialect discipline (what keeps one SQL string portable):
 *  - integers: every computed integer is CAST AS BIGINT on both sides
 *    (DuckDB SUM(BIGINT) is HUGEINT, Spark's is BIGINT);
 *  - floats: never summed raw — fixed-point via
 *    CAST(FLOOR(x * 100) AS BIGINT) (Spark's FLOOR(double) is already
 *    BIGINT, DuckDB's is DOUBLE — the CAST normalizes both);
 *  - no AVG / approx aggregates / LIMIT-without-total-order anywhere —
 *    only exact, order-insensitive reductions;
 *  - per-row digests fold with % 67108859 (a prime < 2^26), bounding
 *    the worst-case BIGINT sum to rows × 2^26 — safe to ~1.4×10^11
 *    rows per subquery (ANSI Spark errors on overflow, DuckDB widens
 *    to HUGEINT: either would be a spurious harness "divergence", so
 *    the mix stays far under 2^63);
 *  - timestamps hash through EXTRACT(YEAR/MONTH/DAY) (both engines),
 *    never through epoch functions (dialect-divergent).
 *
 * Scale shape: the battery is a UNION ALL of independent one-row
 * aggregates — each subquery is a straight declarative plan (scan →
 * filter → join/agg → 1-row reduce) that Catalyst optimizes like any
 * gate query; nothing collects, nothing is quadratic, and the whole
 * battery shares scans per-subquery only (no cross-query state).
 */
object QueryFuzz {

  /** Deterministic SplitMix64 (shared finalizer:
    * [[graft.functions.GraftRandom.mix64]]) — the generation is a pure
    * function of the seed, so the same config always emits
    * byte-identical SQL. */
  private final class Rng(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = {
      s += graft.functions.GraftRandom.Golden
      graft.functions.GraftRandom.mix64(s)
    }
    def nextInt(bound: Int): Int = Math.floorMod(nextLong(), bound.toLong).toInt
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    def choose[T](xs: Seq[T]): T = xs(nextInt(xs.size))
    def chance(p: Double): Boolean = nextDouble() < p
  }

  private sealed trait CType
  private case object TLong extends CType
  private case object TInt extends CType
  private case object TDouble extends CType
  private case object TString extends CType
  private case object TTs extends CType

  /** `lo`/`hi` bound literal generation for numeric columns (chosen
    * inside the SF-invariant value domain measured in TESTDATA);
    * `values` is the closed domain for small string columns; timestamp
    * columns carry their own literal year span (TPC-H dates live in
    * 1995-2001, the events window in January 2024). */
  private case class FCol(name: String, t: CType, lo: Double = 0.0,
      hi: Double = 0.0, values: Seq[String] = Nil,
      tsYears: (Int, Int) = (1995, 2001), tsMonth: Option[Int] = None)

  private case class FTable(name: String, key: String, cols: Seq[FCol])

  // ---- catalog (value domains are scale-factor-invariant: the same
  // literals are selective at sf0.001 and sf100) ----
  private val lineitem = FTable("lineitem", "l_orderkey", Seq(
    FCol("l_orderkey", TLong), FCol("l_partkey", TLong),
    FCol("l_suppkey", TLong), FCol("l_linenumber", TInt, 1, 7),
    FCol("l_quantity", TDouble, 1, 50),
    FCol("l_extendedprice", TDouble, 900, 105000),
    FCol("l_discount", TDouble, 0.0, 0.1),
    FCol("l_tax", TDouble, 0.0, 0.08),
    FCol("l_returnflag", TString, values = Seq("A", "N", "R")),
    FCol("l_linestatus", TString, values = Seq("F", "O")),
    FCol("l_shipdate", TTs)))
  private val orders = FTable("orders", "o_orderkey", Seq(
    FCol("o_orderkey", TLong), FCol("o_custkey", TLong),
    FCol("o_orderstatus", TString, values = Seq("F", "O", "P")),
    FCol("o_totalprice", TDouble, 1000, 500000),
    FCol("o_orderdate", TTs),
    FCol("o_orderpriority", TString, values = Seq("1-URGENT", "2-HIGH",
      "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))))
  private val customer = FTable("customer", "c_custkey", Seq(
    FCol("c_custkey", TLong), FCol("c_nationkey", TInt, 0, 24),
    FCol("c_acctbal", TDouble, -1000, 10000),
    FCol("c_mktsegment", TString, values = Seq("AUTOMOBILE", "BUILDING",
      "FURNITURE", "HOUSEHOLD", "MACHINERY"))))
  private val part = FTable("part", "p_partkey", Seq(
    FCol("p_partkey", TLong), FCol("p_size", TInt, 1, 50),
    FCol("p_retailprice", TDouble, 900, 1000),
    FCol("p_brand", TString, values = Seq("Brand#11", "Brand#12",
      "Brand#13", "Brand#14", "Brand#15"))))
  private val supplier = FTable("supplier", "s_suppkey", Seq(
    FCol("s_suppkey", TLong), FCol("s_nationkey", TInt, 0, 24),
    FCol("s_acctbal", TDouble, -1000, 10000)))
  private val nation = FTable("nation", "n_nationkey", Seq(
    FCol("n_nationkey", TInt, 0, 24), FCol("n_regionkey", TInt, 0, 4)))
  // The events table (user_id/value maxima grow with SF, so predicates
  // use the key-modulo path and a conservative value band).
  private val events = FTable("events", "event_id", Seq(
    FCol("event_id", TLong), FCol("user_id", TLong),
    FCol("ts", TTs, tsYears = (2024, 2024), tsMonth = Some(1)),
    FCol("event_type", TString,
      values = Seq("click", "error", "purchase", "signup", "view")),
    FCol("value", TDouble, 0, 300)))

  private val allTables = Seq(lineitem, orders, customer, part, supplier)

  /** FK edges (child key = parent key); all TPC-H column names are
    * table-prefixed, so joined queries need no qualification. */
  private case class Edge(child: FTable, childKey: String, parent: FTable,
      parentKey: String)
  private val edges = Seq(
    Edge(lineitem, "l_orderkey", orders, "o_orderkey"),
    Edge(lineitem, "l_partkey", part, "p_partkey"),
    Edge(lineitem, "l_suppkey", supplier, "s_suppkey"),
    Edge(orders, "o_custkey", customer, "c_custkey"),
    Edge(customer, "c_nationkey", nation, "n_nationkey"),
    Edge(supplier, "s_nationkey", nation, "n_nationkey"))
  private val chains = Seq(
    (lineitem, Edge(lineitem, "l_orderkey", orders, "o_orderkey"),
      Edge(orders, "o_custkey", customer, "c_custkey")),
    (lineitem, Edge(lineitem, "l_suppkey", supplier, "s_suppkey"),
      Edge(supplier, "s_nationkey", nation, "n_nationkey")))

  private val shapeNames = Seq("scan_filter", "fk_join", "group_agg",
    "case_bucket", "union_all", "in_subquery", "chain_join",
    "scalar_subquery", "left_join", "window_rank", "exists_semi",
    "global_agg", "string_funcs", "event_time", "grouping_sets",
    "setop_all", "range_frame", "lateral_fanout", "decimal_arith",
    "agg_filter", "full_outer", "cte_reuse", "limit_offset",
    "null_order", "mod_floor_div", "ts_interval", "anti_null", "try_cast",
    "greatest_least", "distinct_agg_filter", "string_seams",
    "grouping_null_having", "window_outer_nulls")

  /** One of each shape: the default battery covers every grammar shape
    * exactly once (shape = id % shapeNames.size), so a grammar growth
    * can never again silently drop the newest shape from default-config
    * callers (the r16 trap: nQueries stayed 30 while the grammar grew
    * to 31). */
  val defaultNQueries: Int = shapeNames.size

  case class FuzzConfig(seed: Long = 0x5EED5EEDL,
      nQueries: Int = QueryFuzz.defaultNQueries)

  case class Generated(id: Int, shape: String, innerSql: String,
      wrappedSql: String)

  // ---- literal + predicate generation ----

  private def fmt2(x: Double): String = {
    val b = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    b.bigDecimal.toPlainString
  }

  private def fmt4(x: Double): String = {
    val b = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    b.bigDecimal.toPlainString
  }

  private def numLit(c: FCol, r: Rng): String = c.t match {
    case TInt => (c.lo.toLong + r.nextInt((c.hi - c.lo).toInt + 1)).toString
    case _ => fmt2(c.lo + r.nextDouble() * (c.hi - c.lo))
  }

  private def dateLit(r: Rng, c: FCol): String = {
    val y = c.tsYears._1 + r.nextInt(c.tsYears._2 - c.tsYears._1 + 1)
    val m = c.tsMonth.getOrElse(1 + r.nextInt(12))
    f"DATE '$y%04d-$m%02d-${1 + r.nextInt(28)}%02d'"
  }

  private val cmpOps = Seq("<", "<=", ">", ">=")

  /** One atomic predicate over a random column of `t`. */
  private def atom(t: FTable, r: Rng): String = {
    val c = r.choose(t.cols)
    c.t match {
      case TDouble | TInt if c.hi > c.lo =>
        if (r.chance(0.25)) {
          val a = c.lo + r.nextDouble() * (c.hi - c.lo) * 0.6
          val b = a + r.nextDouble() * (c.hi - a)
          val (la, lb) = if (c.t == TInt) (a.toLong.toString, b.toLong.toString)
                         else (fmt2(a), fmt2(b))
          s"${c.name} BETWEEN $la AND $lb"
        } else s"${c.name} ${r.choose(cmpOps)} ${numLit(c, r)}"
      case TString if c.values.nonEmpty =>
        if (r.chance(0.4) && c.values.size > 2) {
          val k = 2 + r.nextInt(c.values.size - 2)
          val picked = r.choose(c.values.combinations(k).toSeq)
          s"${c.name} IN (${picked.map(v => s"'$v'").mkString(", ")})"
        } else s"${c.name} ${r.choose(Seq("=", "<>"))} '${r.choose(c.values)}'"
      case TTs =>
        s"CAST(${c.name} AS DATE) ${r.choose(cmpOps)} ${dateLit(r, c)}"
      case _ => // key columns: modulo predicates are SF-invariant
        val m = 2 + r.nextInt(6)
        s"(${c.name} % $m) = ${r.nextInt(m)}"
    }
  }

  /** 1-3 atoms joined with AND/OR (parenthesized, so precedence is
    * explicit on both dialects). */
  private def pred(t: FTable, r: Rng): String = {
    val n = 1 + r.nextInt(3)
    val atoms = Seq.fill(n)(atom(t, r))
    if (n == 1) atoms.head
    else atoms.map(a => s"($a)").mkString(s" ${r.choose(Seq("AND", "OR"))} ")
  }

  // ---- digest plumbing ----

  private val Prime = 1000003L
  private val FoldPrime = 67108859L // < 2^26: SUM overflows only past ~1.4e11 rows
  private val weights = Seq(31L, 131L, 257L, 1021L, 8191L, 65537L, 524287L)

  /** A portable per-value integer hash, bounded < [[Prime]]. */
  private def hashExpr(alias: String, t: CType): String = t match {
    case TLong | TInt => s"(abs(CAST($alias AS BIGINT)) % $Prime)"
    case TDouble => s"(abs(CAST(FLOOR($alias * 100) AS BIGINT)) % $Prime)"
    case TString =>
      // First + second + last char code points, not just the first: a
      // divergence that preserves first char and length (broken
      // UPPER/LOWER on cased values, wrong middle chars from SUBSTR)
      // must still flip the digest. greatest(length, 1) keeps the
      // last-char probe off position 0, where the dialects' substr
      // semantics differ ('' on DuckDB, first char on Spark).
      s"((CAST(ascii($alias) AS BIGINT) * 131 + " +
        s"CAST(ascii(substr($alias, 2, 1)) AS BIGINT) * 37 + " +
        s"CAST(ascii(substr($alias, greatest(length($alias), 1), 1)) " +
        s"AS BIGINT) * 17 + " +
        s"CAST(length($alias) AS BIGINT) * 7) % $Prime)"
    case TTs =>
      s"((CAST(EXTRACT(YEAR FROM $alias) AS BIGINT) * 372 + " +
        s"CAST(EXTRACT(MONTH FROM $alias) AS BIGINT) * 31 + " +
        s"CAST(EXTRACT(DAY FROM $alias) AS BIGINT)) % $Prime)"
  }

  private def wrap(id: Int, inner: String,
      outCols: Seq[(String, CType)]): String = {
    // COALESCE keeps null-bearing columns (outer-join misses, empty-set
    // MIN/MAX) contributing a sentinel instead of nulling the whole row
    // out of the digest — null semantics still diff (COUNT vs SUM skip
    // behavior is identical on both engines).
    val mix = outCols.zipWithIndex.map { case ((a, t), i) =>
      s"COALESCE(${hashExpr(a, t)}, 17) * ${weights(i)}"
    }.mkString(" + ")
    s"""SELECT CAST($id AS BIGINT) AS qid, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(COALESCE(SUM(($mix) % $FoldPrime), 0) AS BIGINT) AS digest
       |FROM (
       |$inner
       |) fz$id""".stripMargin
  }

  /** A UNIQUE total order for `t` — what makes windows-with-ties and
    * LIMIT/OFFSET pages deterministic. Single-table keys are unique in
    * the fixtures at every SF; lineitem is NOT (the synthetic generator,
    * unlike real TPC-H, duplicates (l_orderkey, l_linenumber) with
    * distinct payloads — campaign-caught at r12: two limit_offset pages
    * legitimately differed between engines under the non-unique 2-column
    * order), so it orders by EVERY column (full rows are unique, checked
    * at sf0.001/0.01/0.1; values are same-case strings + numerics +
    * timestamps, identical under both engines' binary collations). */
  private def totalOrder(t: FTable): String =
    if (t.name == "lineitem")
      "l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, " +
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, " +
        "l_shipdate"
    else t.key

  /** Random projection of `k` distinct columns, aliased c1..ck. */
  private def proj(t: FTable, r: Rng, k: Int): Seq[(FCol, String)] = {
    val picked = scala.collection.mutable.LinkedHashSet.empty[FCol]
    while (picked.size < math.min(k, t.cols.size)) picked += r.choose(t.cols)
    picked.toSeq.zipWithIndex.map { case (c, i) => (c, s"c${i + 1}") }
  }

  // ---- the grammar shapes (one case per shapeNames entry) ----

  private def genOne(id: Int, r: Rng): Generated = {
    val shape = id % shapeNames.size
    val (inner, outs) = shape match {
      case 0 => // single-table scan + filter (+ optional DISTINCT)
        val t = r.choose(allTables)
        val ps = proj(t, r, 2 + r.nextInt(3))
        val distinct = if (r.chance(0.3)) "DISTINCT " else ""
        (s"SELECT $distinct${ps.map { case (c, a) => s"${c.name} AS $a" }.mkString(", ")}" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}",
          ps.map { case (c, a) => (a, c.t) })
      case 1 => // FK join + filters on both sides
        val e = r.choose(edges)
        val pc = proj(e.child, r, 2)
        val pp = proj(e.parent, r, 1).map { case (c, _) => (c, "c3") }
        val all = pc ++ pp
        (s"SELECT ${all.map { case (c, a) => s"${c.name} AS $a" }.mkString(", ")}" +
          s"\nFROM ${e.child.name} JOIN ${e.parent.name} ON ${e.childKey} = ${e.parentKey}" +
          s"\nWHERE (${pred(e.child, r)}) AND (${pred(e.parent, r)})",
          all.map { case (c, a) => (a, c.t) })
      case 2 => // group-by aggregate (+ optional HAVING)
        val t = r.choose(allTables)
        val gCands = t.cols.filter(c => c.t == TString && c.values.nonEmpty)
        val (gExpr, gType) =
          if (gCands.nonEmpty && r.chance(0.5)) (r.choose(gCands).name, TString)
          else t.cols.find(_.t == TTs) match {
            case Some(ts) if r.chance(0.5) =>
              (s"CAST(EXTRACT(YEAR FROM ${ts.name}) AS BIGINT)", TLong)
            case _ => (s"(${t.key} % ${2 + r.nextInt(9)})", TLong)
          }
        val num = r.choose(t.cols.filter(_.t == TDouble) match {
          case Nil => t.cols.filter(c => c.t == TInt && c.hi > c.lo)
          case ds => ds
        })
        val having = if (r.chance(0.4)) s"\nHAVING COUNT(*) > ${1 + r.nextInt(4)}" else ""
        (s"SELECT $gExpr AS c1, CAST(COUNT(*) AS BIGINT) AS c2,\n" +
          s"  CAST(SUM(CAST(FLOOR(${num.name} * 100) AS BIGINT)) AS BIGINT) AS c3" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}\nGROUP BY 1$having",
          Seq(("c1", gType), ("c2", TLong), ("c3", TLong)))
      case 3 => // CASE bucketing + count
        val t = r.choose(allTables)
        val nums = t.cols.filter(c => c.t == TDouble && c.hi > c.lo)
        val c = if (nums.nonEmpty) r.choose(nums)
                else t.cols.find(c => c.t == TInt && c.hi > c.lo).get
        val m1 = c.lo + (c.hi - c.lo) * (0.2 + r.nextDouble() * 0.3)
        val m2 = m1 + (c.hi - m1) * (0.3 + r.nextDouble() * 0.4)
        (s"SELECT CASE WHEN ${c.name} < ${fmt2(m1)} THEN 'lo' " +
          s"WHEN ${c.name} < ${fmt2(m2)} THEN 'mid' ELSE 'hi' END AS c1,\n" +
          s"  CAST(COUNT(*) AS BIGINT) AS c2" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}\nGROUP BY 1",
          Seq(("c1", TString), ("c2", TLong)))
      case 4 => // UNION ALL of two filters over the same projection
        val t = r.choose(allTables)
        val ps = proj(t, r, 2)
        val sel = ps.map { case (c, a) => s"${c.name} AS $a" }.mkString(", ")
        val sel2 = ps.map { case (c, _) => c.name }.mkString(", ")
        (s"SELECT $sel\nFROM ${t.name}\nWHERE ${pred(t, r)}" +
          s"\nUNION ALL\nSELECT $sel2\nFROM ${t.name}\nWHERE ${pred(t, r)}",
          ps.map { case (c, a) => (a, c.t) })
      case 5 => // IN-subquery semi filter along an FK edge
        val e = r.choose(edges)
        val ps = proj(e.child, r, 3)
        (s"SELECT ${ps.map { case (c, a) => s"${c.name} AS $a" }.mkString(", ")}" +
          s"\nFROM ${e.child.name}\nWHERE ${e.childKey} IN " +
          s"(SELECT ${e.parentKey} FROM ${e.parent.name} WHERE ${pred(e.parent, r)})",
          ps.map { case (c, a) => (a, c.t) })
      case 6 => // 3-way join chain
        val (t0, e1, e2) = r.choose(chains)
        val p0 = proj(t0, r, 2)
        val p2 = proj(e2.parent, r, 1).map { case (c, _) => (c, "c3") }
        val all = p0 ++ p2
        (s"SELECT ${all.map { case (c, a) => s"${c.name} AS $a" }.mkString(", ")}" +
          s"\nFROM ${t0.name}" +
          s"\nJOIN ${e1.parent.name} ON ${e1.childKey} = ${e1.parentKey}" +
          s"\nJOIN ${e2.parent.name} ON ${e2.childKey} = ${e2.parentKey}" +
          s"\nWHERE (${pred(t0, r)}) AND (${pred(e1.parent, r)})",
          all.map { case (c, a) => (a, c.t) })
      case 7 => // uncorrelated scalar-subquery threshold (MIN/MAX: exact)
        val t = r.choose(allTables)
        val t2 = r.choose(allTables.filterNot(_.name == t.name))
        val c = r.choose(t.cols.filter(x => x.t == TDouble && x.hi > x.lo))
        val c2 = r.choose(t2.cols.filter(x =>
          (x.t == TDouble || x.t == TInt) && x.hi > x.lo))
        val agg = r.choose(Seq("MIN", "MAX"))
        val ps = proj(t, r, 2)
        (s"SELECT ${ps.map { case (cc, a) => s"${cc.name} AS $a" }.mkString(", ")}" +
          s"\nFROM ${t.name}\nWHERE ${c.name} > " +
          s"(SELECT $agg(${c2.name}) * ${fmt2(0.1 + r.nextDouble())} " +
          s"FROM ${t2.name} WHERE ${pred(t2, r)})",
          ps.map { case (cc, a) => (a, cc.t) })
      case 8 => // LEFT OUTER join: parent filtered IN the join's ON clause
        // so unmatched children survive with nulls (digest sentinels them)
        val e = r.choose(edges)
        val pc = proj(e.child, r, 2)
        val pp = proj(e.parent, r, 1).map { case (c, _) => (c, "c3") }
        val all = pc ++ pp
        (s"SELECT ${all.map { case (c, a) => s"${c.name} AS $a" }.mkString(", ")}" +
          s"\nFROM ${e.child.name} LEFT JOIN ${e.parent.name}" +
          s"\n  ON ${e.childKey} = ${e.parentKey} AND (${pred(e.parent, r)})" +
          s"\nWHERE ${pred(e.child, r)}",
          all.map { case (c, a) => (a, c.t) })
      case 9 => // windowed top-k per partition (total order via unique key)
        val t = r.choose(allTables)
        val partExpr = t.cols.find(c => c.t == TString && c.values.nonEmpty)
          match {
            case Some(sc) if r.chance(0.5) => sc.name
            case _ => s"(${t.key} % ${2 + r.nextInt(5)})"
          }
        val tie = totalOrder(t)
        val ps = proj(t, r, 2)
        val k = 3 + r.nextInt(8)
        (s"SELECT c1, c2, rn FROM (" +
          s"\nSELECT ${ps.map { case (c, a) => s"${c.name} AS $a" }.mkString(", ")}," +
          s"\n  CAST(ROW_NUMBER() OVER (PARTITION BY $partExpr ORDER BY $tie)" +
          s" AS BIGINT) AS rn" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}\n) w WHERE rn <= $k",
          ps.map { case (c, a) => (a, c.t) } :+ (("rn", TLong)))
      case 10 => // correlated EXISTS semi filter along an FK edge
        val e = r.choose(edges)
        val ps = proj(e.child, r, 3)
        (s"SELECT ${ps.map { case (c, a) => s"${c.name} AS $a" }.mkString(", ")}" +
          s"\nFROM ${e.child.name}\nWHERE EXISTS (SELECT 1 FROM ${e.parent.name}" +
          s"\n  WHERE ${e.parentKey} = ${e.childKey} AND (${pred(e.parent, r)}))",
          ps.map { case (c, a) => (a, c.t) })
      case 11 => // global multi-aggregate (empty-set MIN/MAX stay
        // null-safe through the digest sentinels)
        val t = r.choose(allTables)
        val num = r.choose(t.cols.filter(c => c.t == TDouble && c.hi > c.lo))
        (s"SELECT CAST(COUNT(*) AS BIGINT) AS c1," +
          s"\n  CAST(MIN(${t.key}) AS BIGINT) AS c2," +
          s"\n  CAST(MAX(${t.key}) AS BIGINT) AS c3," +
          s"\n  CAST(SUM(CAST(FLOOR(${num.name} * 100) AS BIGINT)) AS BIGINT) AS c4" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}",
          Seq(("c1", TLong), ("c2", TLong), ("c3", TLong), ("c4", TLong)))
      case 12 => // string-function projection (UPPER/LOWER/SUBSTR/LENGTH)
        val t = r.choose(allTables.filter(_.cols.exists(c =>
          c.t == TString && c.values.nonEmpty)))
        val sc = r.choose(t.cols.filter(c =>
          c.t == TString && c.values.nonEmpty))
        val cased = r.choose(Seq("UPPER", "LOWER"))
        val k = 1 + r.nextInt(4)
        (s"SELECT $cased(${sc.name}) AS c1," +
          s"\n  SUBSTR(${sc.name}, 1, $k) AS c2," +
          s"\n  CAST(LENGTH(${sc.name}) AS BIGINT) AS c3" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}",
          Seq(("c1", TString), ("c2", TString), ("c3", TLong)))
      case 13 => // events time-bucket aggregate (non-TPC-H table: real
        // time-of-day timestamps, SF-growing key domain via modulo)
        val gExpr = r.choose(Seq(
          "CAST(EXTRACT(DAY FROM ts) AS BIGINT)",
          "event_type",
          s"(user_id % ${2 + r.nextInt(7)})"))
        val gType = if (gExpr == "event_type") TString else TLong
        (s"SELECT $gExpr AS c1, CAST(COUNT(*) AS BIGINT) AS c2," +
          s"\n  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS c3" +
          s"\nFROM events\nWHERE ${pred(events, r)}\nGROUP BY 1",
          Seq(("c1", gType), ("c2", TLong), ("c3", TLong)))
      case 14 => // ROLLUP / CUBE / GROUPING SETS + GROUPING()
        // disambiguation: super-aggregate rows carry NULL group keys,
        // and the GROUPING bitmask is the only thing separating them
        // from a genuine NULL group — exactly the semantics engines
        // get subtly wrong (Spark's Expand vs DuckDB's grouping-set
        // re-aggregation must agree row-for-row).
        // Dialect note (campaign-caught divergence, r12): over EMPTY
        // input, ANSI's empty grouping set () is a global aggregate and
        // yields one COUNT=0 row (DuckDB, Postgres); Spark's
        // Expand+groupBy lowering yields ZERO rows. HAVING COUNT(*) > 0
        // is a no-op on every non-empty grouping-set row (all count
        // >= 1) and aligns only the empty-input case, keeping the
        // rollup/bitmask semantics under test.
        val groupable = (t: FTable) => t.cols.filter(c =>
          (c.t == TString && c.values.nonEmpty) ||
            (c.t == TInt && c.hi > c.lo))
        val t = r.choose(allTables.filter(t => groupable(t).size >= 2))
        val pool = groupable(t)
        val g1 = r.choose(pool)
        val g2 = r.choose(pool.filterNot(_ == g1))
        val spec = r.choose(Seq(
          s"ROLLUP(${g1.name}, ${g2.name})",
          s"CUBE(${g1.name}, ${g2.name})",
          s"GROUPING SETS ((${g1.name}, ${g2.name}), (${g1.name}), ())"))
        (s"SELECT ${g1.name} AS c1, ${g2.name} AS c2,\n" +
          s"  CAST(GROUPING(${g1.name}) * 2 + GROUPING(${g2.name})" +
          s" AS BIGINT) AS c3,\n" +
          s"  CAST(COUNT(*) AS BIGINT) AS c4" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}\nGROUP BY $spec" +
          s"\nHAVING COUNT(*) > 0",
          Seq(("c1", g1.t), ("c2", g2.t), ("c3", TLong), ("c4", TLong)))
      case 15 => // INTERSECT ALL / EXCEPT ALL bag semantics: projections
        // are deliberately low-cardinality (string domain × key modulo)
        // so real duplicate multiplicities flow through the set op —
        // an engine that dedups like DISTINCT-set-ops flips n_rows.
        val t = r.choose(allTables.filter(_.cols.exists(c =>
          c.t == TString && c.values.nonEmpty)))
        val sc = r.choose(t.cols.filter(c =>
          c.t == TString && c.values.nonEmpty))
        val m = 2 + r.nextInt(5)
        val op = r.choose(Seq("INTERSECT ALL", "EXCEPT ALL"))
        (s"SELECT ${sc.name} AS c1, CAST(${t.key} % $m AS BIGINT) AS c2" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}" +
          s"\n$op\nSELECT ${sc.name}, CAST(${t.key} % $m AS BIGINT)" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}",
          Seq(("c1", TString), ("c2", TLong)))
      case 16 => // RANGE window frame: value-based bounds include ALL
        // peers of the frame edge (unlike ROWS), so the result is
        // deterministic even on a non-unique order key — the frame
        // boundary arithmetic (offset PRECEDING on a BIGINT order key)
        // is what's under test.
        val t = r.choose(allTables)
        val partExpr = t.cols.find(c =>
          c.t == TString && c.values.nonEmpty) match {
            case Some(sc) if r.chance(0.5) => sc.name
            case _ => s"(${t.key} % ${2 + r.nextInt(5)})"
          }
        val nums = t.cols.filter(c => c.t == TDouble && c.hi > c.lo)
        val sumExpr =
          if (nums.nonEmpty)
            s"CAST(FLOOR(${r.choose(nums).name} * 100) AS BIGINT)"
          else "CAST(1 AS BIGINT)"
        val frame =
          if (r.chance(0.5))
            s"RANGE BETWEEN ${100 + r.nextInt(5000)} PRECEDING AND CURRENT ROW"
          else "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        val ps = proj(t, r, 2)
        (s"SELECT ${ps.map { case (c, a) => s"${c.name} AS $a" }.mkString(", ")},\n" +
          s"  CAST(SUM($sumExpr) OVER (PARTITION BY $partExpr" +
          s" ORDER BY ${t.key}\n    $frame) AS BIGINT) AS c3" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}",
          ps.map { case (c, a) => (a, c.t) } :+ (("c3", TLong)))
      case 17 => // LATERAL / explode: either a correlated LATERAL
        // aggregate in FROM (per-parent child fold, empty set => NULL
        // through the digest sentinel), or a data-dependent fan-out
        // join against an inline numbers table — the portable spelling
        // of explode(sequence(1, 1 + key % m)).
        // Dialect note (campaign-caught divergence, r12): comma-LATERAL
        // over a correlated scalar aggregate DROPS empty-group parents
        // on DuckDB 1.0 (decorrelates to an inner join), while Spark
        // keeps them with NULL per ANSI one-row-aggregate semantics.
        // LEFT JOIN LATERAL ... ON TRUE agrees on both engines (and
        // with the scalar-subquery form), so the grammar emits that.
        if (r.chance(0.5)) {
          val e = r.choose(edges)
          val pp = proj(e.parent, r, 2)
          val agg = r.choose(Seq("COUNT(*)", s"MAX(${e.childKey})"))
          (s"SELECT ${pp.map { case (c, a) => s"${c.name} AS $a" }.mkString(", ")}, lx.c3" +
            s"\nFROM ${e.parent.name} LEFT JOIN LATERAL (SELECT CAST($agg AS BIGINT) AS c3" +
            s"\n  FROM ${e.child.name} WHERE ${e.childKey} = ${e.parentKey}" +
            s" AND (${pred(e.child, r)})) lx ON TRUE" +
            s"\nWHERE ${pred(e.parent, r)}",
            pp.map { case (c, a) => (a, c.t) } :+ (("c3", TLong)))
        } else {
          val t = r.choose(allTables)
          val ps = proj(t, r, 2)
          val m = 2 + r.nextInt(3) // fan-out 1..m, m <= 4
          (s"SELECT ${ps.map { case (c, a) => s"${c.name} AS $a" }.mkString(", ")}, d.i AS c3" +
            s"\nFROM ${t.name}" +
            s"\nJOIN (SELECT CAST(1 AS BIGINT) AS i UNION ALL SELECT 2" +
            s" UNION ALL SELECT 3 UNION ALL SELECT 4) d" +
            s"\n  ON d.i <= 1 + (${t.key} % $m)" +
            s"\nWHERE ${pred(t, r)}",
            ps.map { case (c, a) => (a, c.t) } :+ (("c3", TLong)))
        }
      case 18 => // DECIMAL arithmetic: double -> DECIMAL(18,2) cast,
        // decimal × decimal precision propagation (27,6 — under 38, so
        // neither engine hits precision-loss paths), ROUND half-up at
        // scale 2, exact integer cents out. Columns restricted to
        // non-negative domains so HALF_UP == round-half-away on both.
        val t = r.choose(allTables.filter(_.cols.exists(c =>
          c.t == TDouble && c.lo >= 0 && c.hi > c.lo)))
        val c = r.choose(t.cols.filter(c =>
          c.t == TDouble && c.lo >= 0 && c.hi > c.lo))
        val factor = fmt4(0.5 + r.nextDouble())
        val gm = 2 + r.nextInt(7)
        (s"SELECT CAST(${t.key} % $gm AS BIGINT) AS c1," +
          s" CAST(COUNT(*) AS BIGINT) AS c2,\n" +
          s"  CAST(SUM(CAST(ROUND(CAST(${c.name} AS DECIMAL(18,2)) *" +
          s" CAST($factor AS DECIMAL(8,4)), 2) * 100 AS BIGINT))" +
          s" AS BIGINT) AS c3" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}\nGROUP BY 1",
          Seq(("c1", TLong), ("c2", TLong), ("c3", TLong)))
      case 19 => // aggregate FILTER (WHERE): per-aggregate predicates on
        // top of the group's WHERE — COUNT FILTER must stay 0 (never
        // NULL) on empty groups while SUM FILTER goes NULL (through the
        // digest sentinel); an engine that conflates the two, or that
        // leaks the FILTER predicate into the other aggregates, flips
        // c2/c3 against c4's unfiltered control count.
        val t = r.choose(allTables)
        val num = r.choose(t.cols.filter(c => c.t == TDouble && c.hi > c.lo))
        val m = 2 + r.nextInt(7)
        (s"SELECT CAST(${t.key} % $m AS BIGINT) AS c1," +
          s"\n  CAST(COUNT(*) FILTER (WHERE ${atom(t, r)}) AS BIGINT) AS c2," +
          s"\n  CAST(SUM(CAST(FLOOR(${num.name} * 100) AS BIGINT))" +
          s" FILTER (WHERE ${atom(t, r)}) AS BIGINT) AS c3," +
          s"\n  CAST(COUNT(*) AS BIGINT) AS c4" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}\nGROUP BY 1",
          Seq(("c1", TLong), ("c2", TLong), ("c3", TLong), ("c4", TLong)))
      case 20 => // FULL OUTER join of two INDEPENDENTLY filtered sides of
        // an FK edge: the child filter strands parents (child-side
        // nulls), the parent filter strands children (parent-side
        // nulls), and both null shapes must flow through the digest
        // sentinels — the row count alone distinguishes full-outer from
        // left/right/inner lowering.
        val e = r.choose(edges)
        val cp = proj(e.child, r, 2)
        val pp = proj(e.parent, r, 1).map { case (c, _) => (c, "c3") }
        (s"SELECT ${(cp ++ pp).map { case (c, a) => s"${c.name} AS $a" }
            .mkString(", ")}" +
          s"\nFROM (SELECT * FROM ${e.child.name} WHERE ${pred(e.child, r)}) fc" +
          s"\nFULL OUTER JOIN (SELECT * FROM ${e.parent.name}" +
          s" WHERE ${pred(e.parent, r)}) fp" +
          s"\n  ON fc.${e.childKey} = fp.${e.parentKey}",
          (cp ++ pp).map { case (c, a) => (a, c.t) })
      case 21 => // WITH-clause reuse: one filtered base CTE consumed by
        // TWO independent aggregations joined back on the group key —
        // an engine that re-plans the CTE inconsistently (or pushes one
        // consumer's predicate into the shared scan) diverges c2 vs c3.
        val t = r.choose(allTables)
        val num = r.choose(t.cols.filter(c => c.t == TDouble && c.hi > c.lo))
        val m = 2 + r.nextInt(7)
        (s"WITH base AS (SELECT ${t.key} AS k, ${num.name} AS x" +
          s"\n  FROM ${t.name} WHERE ${pred(t, r)})," +
          s"\nag1 AS (SELECT k % $m AS g, CAST(COUNT(*) AS BIGINT) AS n1" +
          s"\n  FROM base GROUP BY 1)," +
          s"\nag2 AS (SELECT k % $m AS g," +
          s" CAST(SUM(CAST(FLOOR(x * 100) AS BIGINT)) AS BIGINT) AS s1" +
          s"\n  FROM base GROUP BY 1)" +
          s"\nSELECT CAST(ag1.g AS BIGINT) AS c1, ag1.n1 AS c2, ag2.s1 AS c3" +
          s"\nFROM ag1 JOIN ag2 ON ag1.g = ag2.g",
          Seq(("c1", TLong), ("c2", TLong), ("c3", TLong)))
      case 22 => // LIMIT/OFFSET pagination under a UNIQUE total order (the
        // only way LIMIT is deterministic): the page must contain
        // exactly rows [offset, offset+limit) of the ordered stream on
        // both engines — off-by-one in OFFSET or an unstable sort under
        // LIMIT pushdown flips the digest.
        val t = r.choose(allTables)
        val order = totalOrder(t)
        val ps = proj(t, r, 2)
        val lim = 5 + r.nextInt(20)
        val off = r.nextInt(10)
        (s"SELECT ${ps.map { case (_, a) => a }.mkString(", ")} FROM (" +
          s"\nSELECT ${ps.map { case (c, a) => s"${c.name} AS $a" }
            .mkString(", ")}" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}" +
          s"\nORDER BY $order LIMIT $lim OFFSET $off\n) pg",
          ps.map { case (c, a) => (a, c.t) })
      case 23 => // explicit NULLS FIRST/LAST ordering under LIMIT: the
        // engines' DEFAULT null placement genuinely differs (Spark sorts
        // nulls first ascending, DuckDB last), so unannotated ORDER BY
        // over a nullable key is a portability trap — this shape makes
        // the placement explicit (the portable spelling), manufactures
        // nulls with NULLIF on a low-cardinality expression, and pages
        // with LIMIT so the null block's position decides the digest.
        val t = r.choose(allTables)
        val m = 2 + r.nextInt(5)
        val place = r.choose(Seq("NULLS FIRST", "NULLS LAST"))
        val dir = r.choose(Seq("ASC", "DESC"))
        val ps = proj(t, r, 2)
        val lim = 8 + r.nextInt(20)
        (s"SELECT ${ps.map { case (_, a) => a }.mkString(", ")}, c3 FROM (" +
          s"\nSELECT ${ps.map { case (c, a) => s"${c.name} AS $a" }
            .mkString(", ")}," +
          s"\n  NULLIF(${t.key} % $m, ${r.nextInt(m)}) AS c3" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}" +
          s"\nORDER BY c3 $dir $place, ${totalOrder(t)} LIMIT $lim\n) pg",
          ps.map { case (c, a) => (a, c.t) } :+ (("c3", TLong)))
      case 24 => // negative-operand integer arithmetic: `%` truncates
        // toward zero (sign of the DIVIDEND) on both engines — but the
        // floor-division and non-negative-modulo the bucket functions
        // need have NO shared operator spelling (Spark `DIV` vs DuckDB
        // `//`), so this shape pins the portable forms every graft
        // bucket rides: the pmod identity ((a % m + m) % m) and
        // CAST(FLOOR(a / CAST(m AS DOUBLE)) AS BIGINT). Negatives are
        // manufactured by centering the key; a wrong sign convention
        // or a truncate-vs-floor slip flips the digest.
        val t = r.choose(allTables)
        val m = 2 + r.nextInt(7)
        val shift = 10 + r.nextInt(90)
        val ps = proj(t, r, 1)
        val a = s"(${t.key} - $shift)"
        (s"SELECT ${ps.map { case (c, al) => s"${c.name} AS $al" }
            .mkString(", ")}," +
          s"\n  CAST($a % $m AS BIGINT) AS c2," +
          s"\n  CAST(($a % $m + $m) % $m AS BIGINT) AS c3," +
          s"\n  CAST(FLOOR($a / CAST($m AS DOUBLE)) AS BIGINT) AS c4" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}",
          ps.map { case (c, al) => (al, c.t) } ++
            Seq(("c2", TLong), ("c3", TLong), ("c4", TLong)))
      case 25 => // timestamp/interval arithmetic: date_trunc boundaries,
        // month arithmetic with the END-OF-MONTH CLAMP (Jan 31 + 1
        // month = Feb 28/29 on BOTH engines — verified, and exactly the
        // convention every calendar rollup rides), day-interval shifts,
        // all under a paginated ORDER BY on the SHIFTED value so the
        // arithmetic decides which rows reach the digest. Portable
        // spellings pinned: CAST(date_trunc(u, ts) AS DATE) (Spark
        // returns TIMESTAMP, DuckDB DATE — the cast unifies the type),
        // INTERVAL 'n' MONTH/DAY literals, ISO-Monday
        // date_trunc('week'). Engine-divergent dow/week NUMBERING is
        // deliberately excluded — those have no portable spelling.
        val withTs = allTables.filter(_.cols.exists(_.t == TTs))
        val t = r.choose(withTs)
        val tsc = r.choose(t.cols.filter(_.t == TTs)).name
        val unit = r.choose(Seq("year", "quarter", "month", "week"))
        val months = 1 + r.nextInt(11)
        val days = 1 + r.nextInt(90)
        val dir = r.choose(Seq("ASC", "DESC"))
        val lim = 10 + r.nextInt(30)
        val ps = proj(t, r, 1)
        (s"SELECT ${ps.map { case (_, a) => a }.mkString(", ")}, " +
          "c2, c3, c4 FROM (" +
          s"\nSELECT ${ps.map { case (c, a) => s"${c.name} AS $a" }
            .mkString(", ")}," +
          s"\n  CAST(date_trunc('$unit', $tsc) AS DATE) AS c2," +
          s"\n  CAST($tsc + INTERVAL '$months' MONTH AS DATE) AS c3," +
          s"\n  CAST($tsc - INTERVAL '$days' DAY AS DATE) AS c4" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}" +
          s"\nORDER BY c3 $dir, ${totalOrder(t)} LIMIT $lim\n) pg",
          ps.map { case (c, a) => (a, c.t) } ++
            Seq(("c2", TTs), ("c3", TTs), ("c4", TTs)))
      case 26 => // NOT IN / NOT EXISTS anti-join under three-valued logic:
        // the classic trap. Three sub-forms: (a) correlated NOT EXISTS —
        // the PORTABLE anti-join spelling; (b) NOT IN over a non-null
        // key subquery — safe because FK keys are never null, equals the
        // anti join on both engines; (c) NOT IN over a subquery that
        // MANUFACTURES nulls (CASE WHEN pred THEN key ELSE NULL END) —
        // one NULL in the list makes `x NOT IN (...)` UNKNOWN for every
        // non-matching x, so the whole result EMPTIES on any
        // standard-3VL engine the moment some parent row fails pred.
        // Both engines implement the standard; an engine (or a user
        // rewrite to an anti join) that drops the null poisoning flips
        // n_rows from 0 loudly. Digest-visible either way: (b) vs (c)
        // differ exactly when the manufactured null appears.
        val e = r.choose(edges)
        val ps = proj(e.child, r, 3)
        val sel = s"SELECT ${ps.map { case (c, a) => s"${c.name} AS $a" }
          .mkString(", ")}\nFROM ${e.child.name}\nWHERE "
        val body = r.nextInt(3) match {
          case 0 => // portable anti join: correlated NOT EXISTS
            s"NOT EXISTS (SELECT 1 FROM ${e.parent.name}" +
              s"\n  WHERE ${e.parentKey} = ${e.childKey} AND " +
              s"(${pred(e.parent, r)}))" +
              s"\n  AND (${pred(e.child, r)})"
          case 1 => // NOT IN over a never-null key list
            s"${e.childKey} NOT IN (SELECT ${e.parentKey} " +
              s"FROM ${e.parent.name} WHERE ${pred(e.parent, r)})"
          case _ => // NOT IN with a manufactured NULL in the list
            s"${e.childKey} NOT IN (SELECT CASE WHEN (${pred(e.parent, r)})" +
              s" THEN ${e.parentKey} ELSE NULL END FROM ${e.parent.name})"
        }
        (sel + body, ps.map { case (c, a) => (a, c.t) })
      case 27 => // TRY_CAST boundary semantics: the portable "cast or NULL"
        // (same spelling, both engines). Probes pinned — verified on both
        // engines this round: garbage-prefixed and empty strings -> NULL;
        // space-padded integral text parses (both trim); BIGINT->INTEGER
        // downcast overflow -> NULL (never a silent wrap); out-of-calendar
        // month/day text -> NULL (month 0/13+, Feb 30); non-zero-padded
        // date text ('2024-2-5') parses. DELIBERATELY EXCLUDED — no shared
        // semantics, the same rule as shapes 25/26's exclusions:
        // fractional or scientific TEXT -> integral (Spark NULL under ANSI
        // string rules, DuckDB parses and ROUNDS '4.5' -> 5, '1e3' ->
        // 1000) and numeric DOUBLE -> integral (Spark truncates 4.99 -> 4,
        // DuckDB rounds to 5); the portable spelling for those stays
        // CAST(FLOOR(x) AS BIGINT), shape 24's convention.
        val t = r.choose(allTables)
        val ps = proj(t, r, 1)
        val m = 3 + r.nextInt(4)
        val bad = r.nextInt(m)
        val mult = 300000007L + 2L * r.nextInt(5)
        val mm = 14 + r.nextInt(9) // month in 0..mm-1: both arms populated
        (s"SELECT ${ps.map { case (c, a) => s"${c.name} AS $a" }
            .mkString(", ")}," +
          s"\n  TRY_CAST(CASE WHEN ${t.key} % $m = $bad" +
          s" THEN CONCAT('x', CAST(${t.key} AS STRING))" +
          s" ELSE CONCAT(' ', CAST(${t.key} AS STRING), ' ') END" +
          s" AS BIGINT) AS c2," +
          s"\n  CAST(TRY_CAST(CAST(${t.key} % 37 AS BIGINT) * $mult" +
          s" AS INTEGER) AS BIGINT) AS c3," +
          s"\n  TRY_CAST(CONCAT('2024-', CAST(${t.key} % $mm AS STRING)," +
          s" '-', CAST(1 + ${t.key} % 31 AS STRING)) AS DATE) AS c4" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}",
          ps.map { case (c, a) => (a, c.t) } ++
            Seq(("c2", TLong), ("c3", TLong), ("c4", TTs)))
      case 28 => // GREATEST/LEAST null-skip semantics: BOTH engines skip
        // NULL arguments (result is NULL only when EVERY argument is —
        // engine-verified this round, including binary string collation
        // 'a' > 'B' and BIGINT/DECIMAL coercion), which is exactly the
        // behavior a clamp/winsorize rewrite relies on. The shape
        // manufactures nulls with NULLIF on both operand positions so
        // one-null, other-null, and both-null rows all reach the digest;
        // a dialect (or user port to MAX-CASE) that poisons on any NULL
        // flips every one-null row's contribution loudly. The all-null
        // row contributes through the wrap's COALESCE sentinel.
        val t = r.choose(allTables)
        val ps = proj(t, r, 1)
        val m1 = 2 + r.nextInt(5)
        val m2 = 2 + r.nextInt(5)
        val b1 = r.nextInt(m1)
        val b2 = r.nextInt(m2)
        val shift = 3 + r.nextInt(17)
        (s"SELECT ${ps.map { case (c, a) => s"${c.name} AS $a" }
            .mkString(", ")}," +
          s"\n  GREATEST(NULLIF(${t.key} % $m1, $b1)," +
          s" NULLIF((${t.key} + $shift) % $m2, $b2)) AS c2," +
          s"\n  LEAST(NULLIF(${t.key} % $m1, $b1)," +
          s" NULLIF((${t.key} + $shift) % $m2, $b2), ${t.key} % 7) AS c3," +
          s"\n  GREATEST(${t.key} % $m1, ${t.key} % $m2," +
          s" ${t.key} % 7) AS c4" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}",
          ps.map { case (c, a) => (a, c.t) } ++
            Seq(("c2", TLong), ("c3", TLong), ("c4", TLong)))
      case 29 => // DISTINCT aggregates x FILTER clauses — the planner path
        // where Spark rewrites MULTIPLE distinct aggregates through an
        // Expand (one projection per distinct group) and FILTER
        // predicates must apply BEFORE the dedup inside each group; a
        // wrong filter placement (post-dedup), a dropped null inside
        // COUNT(DISTINCT ...) (nulls never count, on both engines), or a
        // mishandled NULL GROUP KEY (one group, standard GROUP BY) each
        // flip the digest. All five aggregates engine-verified identical
        // this round, including the NULLIF-manufactured null group and
        // nulls inside the distinct set. DELIBERATELY EXCLUDED:
        // SUM/AVG(DISTINCT <double>) — the distinct set's float sum is
        // still accumulation-order-dependent, the same exclusion rule as
        // every other float-sum shape; integral DISTINCT sums are exact.
        val t = r.choose(allTables)
        val gm = 3 + r.nextInt(4)
        val gb = r.nextInt(gm)
        val m1 = 5 + r.nextInt(7)
        val m2 = 7 + r.nextInt(9)
        val m3 = 5 + r.nextInt(8)
        val b3 = r.nextInt(3)
        val m4 = 4 + r.nextInt(5)
        val b4 = r.nextInt(m4)
        val gkey = s"NULLIF(${t.key} % $gm, $gb)"
        (s"SELECT $gkey AS g," +
          s"\n  COUNT(*) AS c1," +
          s"\n  COUNT(DISTINCT ${t.key} % $m1) AS c2," +
          s"\n  COUNT(DISTINCT ${t.key} % $m2)" +
          s" FILTER (WHERE ${pred(t, r)}) AS c3," +
          s"\n  SUM(DISTINCT ${t.key} % $m3)" +
          s" FILTER (WHERE (${t.key} % 3) = $b3) AS c4," +
          s"\n  COUNT(DISTINCT NULLIF(${t.key} % $m4, $b4)) AS c5" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}" +
          s"\nGROUP BY $gkey",
          Seq(("g", TLong), ("c1", TLong), ("c2", TLong), ("c3", TLong),
            ("c4", TLong), ("c5", TLong)))
      case 30 => // string-function dialect seams beyond shape 12's basket:
        // LIKE with an explicit ESCAPE (escape char '!' ON PURPOSE — a
        // backslash escape char is ITSELF a seam: Spark's default string
        // literals treat backslash as an escape where DuckDB's standard
        // SQL literals do not, so '\\_' means different PATTERNS before
        // LIKE even runs), REPLACE/TRANSLATE case maps, LPAD/RPAD with a
        // multi-char pad + truncation, REVERSE, REPEAT, LEFT/RIGHT, the
        // ANSI POSITION(sub IN s) and TRIM(BOTH c FROM s) spellings —
        // all engine-verified identical on manufactured strings carrying
        // literal '_' and '%' metacharacters (row-for-row, this round).
        // DELIBERATELY EXCLUDED: negative LEFT/RIGHT lengths (Spark
        // returns '' where DuckDB drops from the opposite end), SPLIT
        // (different function NAMES: split vs string_split — no shared
        // spelling), and regexp_* beyond literal-safe patterns (Java vs
        // RE2 flavor seams); the portable spelling for splitting stays
        // the battery's string_split-free forms.
        val t = r.choose(allTables.filter(_.cols.exists(c =>
          c.t == TString && c.values.nonEmpty)))
        val sc = r.choose(t.cols.filter(c =>
          c.t == TString && c.values.nonEmpty))
        val m = 5 + r.nextInt(5)
        val digit = r.nextInt(m)
        val padW = 11 + r.nextInt(4)
        val padC = r.choose(Seq("*", "#", "+"))
        val lw = 2 + r.nextInt(3)
        val rw = 5 + r.nextInt(3)
        val rep = 2 + r.nextInt(3)
        val trimC = r.choose(Seq("M", "A", "B", "F", "H"))
        val s0 = s"CONCAT(${sc.name}, '_', CAST(${t.key} % $m AS STRING), '%t')"
        val s1 = s"CONCAT(${sc.name}, '_', CAST(${t.key} % $m AS STRING))"
        (s"SELECT ${sc.name} AS c1," +
          s"\n  REPLACE(TRANSLATE($s1, 'AEIOU', 'aeiou'), '_', '#') AS c2," +
          s"\n  REVERSE(LPAD(${sc.name}, $padW, '$padC')) AS c3," +
          s"\n  RPAD(LEFT(${sc.name}, $lw), $rw," +
          s" CONCAT(RIGHT(${sc.name}, 2), 'z')) AS c4," +
          s"\n  CAST(POSITION('_' IN $s1) AS BIGINT) AS c5," +
          s"\n  CAST(CASE WHEN $s0 LIKE '%!_$digit%' ESCAPE '!'" +
          s" THEN 1 ELSE 0 END" +
          s"\n     + 2 * CASE WHEN $s0 LIKE '%!%t' ESCAPE '!'" +
          s" THEN 1 ELSE 0 END" +
          s"\n     + 4 * CASE WHEN TRIM(BOTH '$trimC' FROM ${sc.name})" +
          s" = ${sc.name} THEN 1 ELSE 0 END AS BIGINT) AS c6," +
          s"\n  REPEAT(SUBSTR(${sc.name}, 2, 2), $rep) AS c7" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}",
          Seq(("c1", TString), ("c2", TString), ("c3", TString),
            ("c4", TString), ("c5", TLong), ("c6", TLong), ("c7", TString)))
      case 32 => // WINDOWS x OUTER-JOIN NULLS — rank/frame semantics over
        // JOIN-MANUFACTURED null keys, a seam the grammar's window
        // shapes (9, 16) and outer-join shapes (8, 20) never composed:
        // the partition key is a parent-side expression (NULL for every
        // stranded child row -> all land in ONE null partition), RANK
        // orders by a nullable parent column with an EXPLICIT NULLS
        // FIRST/LAST (the engines' defaults differ: Spark ASC = NULLS
        // FIRST, DuckDB ASC = NULLS LAST — leaving it implicit is a
        // guaranteed false divergence, so the seam under test is the
        // explicit spelling + tie mass of the null group), and a
        // running SUM over a ROWS frame walks a total order whose every
        // nullable column pins NULLS FIRST. SUM skips the NULL ord
        // values of stranded rows (prefix sums stall, not null out —
        // identical skip semantics both engines, digest-checked).
        val e = r.choose(edges)
        val joinKind = if (r.chance(0.5)) "LEFT" else "FULL OUTER"
        val ord = r.choose(e.parent.cols.filter(c =>
          (c.t == TInt || c.t == TDouble) && c.hi > c.lo))
        val nf = if (r.chance(0.5)) "NULLS FIRST" else "NULLS LAST"
        val m = 2 + r.nextInt(4)
        val part = s"${e.parentKey} % $m"
        val ordI = s"CAST(FLOOR(${ord.name}) AS BIGINT)"
        val tie = (totalOrder(e.child).split(", ").toSeq :+ e.parentKey)
          .map(c => s"$c NULLS FIRST").mkString(", ")
        val ckType = e.child.cols.find(_.name == e.childKey).get.t
        val pkType = e.parent.cols.find(_.name == e.parentKey).get.t
        (s"SELECT ${e.childKey} AS c1, ${e.parentKey} AS c2," +
          s"\n  CAST(RANK() OVER (PARTITION BY $part" +
          s"\n    ORDER BY $ordI $nf) AS BIGINT) AS c3," +
          s"\n  CAST(ROW_NUMBER() OVER (PARTITION BY $part" +
          s"\n    ORDER BY $tie) AS BIGINT) AS c4," +
          s"\n  CAST(SUM($ordI) OVER (PARTITION BY $part" +
          s"\n    ORDER BY $tie" +
          s"\n    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)" +
          s" AS BIGINT) AS c5" +
          s"\nFROM (SELECT * FROM ${e.child.name}" +
          s" WHERE ${pred(e.child, r)}) fc" +
          s"\n$joinKind JOIN (SELECT * FROM ${e.parent.name}" +
          s" WHERE ${pred(e.parent, r)}) fp" +
          s"\n  ON fc.${e.childKey} = fp.${e.parentKey}",
          Seq(("c1", ckType), ("c2", pkType), ("c3", TLong), ("c4", TLong),
            ("c5", TLong)))
      case _ => // GROUPING SETS x HAVING over grouped NULLs — composes
        // shape 14 (super-aggregate NULL vs genuine NULL group,
        // separable only by the GROUPING() bitmask) with shape 29's
        // NULLIF-manufactured null group key: HAVING must evaluate per
        // grouping-set row AFTER Spark's Expand lowering, mixing an
        // aggregate bound with the bitmask itself — an engine that
        // applies the HAVING before expansion, dedups the two NULL
        // kinds, or evaluates GROUPING() wrong inside HAVING flips
        // rows. HAVING keeps a COUNT(*) > 0 conjunct for shape 14's r12
        // empty-input alignment (ANSI's () set yields one COUNT=0 row
        // on empty input where Spark's lowering yields none).
        // Engine-verified identical across 20 unseen seeds (FUZZ_r17
        // campaign); every aggregate here is integral. DELIBERATELY
        // EXCLUDED: GROUPING() textually inside HAVING — Spark's
        // analyzer fails UnresolvedHaving resolution of grouping()
        // against the expanded aggregate (UNRESOLVED_COLUMN on the base
        // attr, even for a plain grouping column; DuckDB accepts it),
        // so there is no shared spelling. The portable form computes
        // the bitmask as a SELECT column and filters it in an ENCLOSING
        // derived table — same per-grouping-set-row semantics, and the
        // filter still kills a genuine NULL group with count < h while
        // keeping the super-aggregate row whose c1 is equally NULL.
        val t = r.choose(allTables)
        val pool = t.cols.filter(c =>
          (c.t == TString && c.values.nonEmpty) ||
            (c.t == TInt && c.hi > c.lo))
        val g2 = r.choose(pool)
        val gm = 3 + r.nextInt(4)
        val gb = r.nextInt(gm)
        val m5 = 4 + r.nextInt(6)
        val h = 1 + r.nextInt(3)
        val gkey = s"NULLIF(${t.key} % $gm, $gb)"
        (s"SELECT c1, c2, c3, c4, c5 FROM (" +
          s"\nSELECT $gkey AS c1, ${g2.name} AS c2," +
          s"\n  CAST(GROUPING($gkey) * 2 + GROUPING(${g2.name})" +
          s" AS BIGINT) AS c3," +
          s"\n  CAST(COUNT(*) AS BIGINT) AS c4," +
          s"\n  CAST(SUM(${t.key} % $m5) AS BIGINT) AS c5" +
          s"\nFROM ${t.name}\nWHERE ${pred(t, r)}" +
          s"\nGROUP BY GROUPING SETS (($gkey, ${g2.name}), ($gkey), ())" +
          s"\nHAVING COUNT(*) > 0) gh" +
          s"\nWHERE c3 = 3 OR c4 >= $h",
          Seq(("c1", TLong), ("c2", g2.t), ("c3", TLong), ("c4", TLong),
            ("c5", TLong)))
    }
    Generated(id, shapeNames(shape), inner, wrap(id, inner, outs))
  }

  /** The full battery for `cfg` — a pure function of the seed. */
  def generate(cfg: FuzzConfig = FuzzConfig()): Seq[Generated] = {
    require(cfg.nQueries > 0, "QueryFuzz: nQueries > 0")
    val r = new Rng(cfg.seed)
    (0 until cfg.nQueries).map(genOne(_, r))
  }

  /** One portable SQL string: every generated query reduced to
    * (qid, n_rows, digest) and UNION ALL'd — run it verbatim on any
    * ANSI engine and diff the rows. */
  def differentialSql(cfg: FuzzConfig = FuzzConfig()): String =
    generate(cfg).map(g => s"(${g.wrappedSql})")
      .mkString("", "\nUNION ALL\n", "\nORDER BY qid")

  /** Spark-side run over the standard table views. */
  def run(spark: SparkSession, dir: String,
      cfg: FuzzConfig = FuzzConfig()): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(differentialSql(cfg))
  }
}
