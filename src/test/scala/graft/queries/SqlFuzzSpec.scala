package graft.queries

import graft.{SparkSpecBase, Tables}
import scala.util.Random

/** Differential SQL fuzzing of the E3 passthrough surface (round-10
  * verdict ask #6): ~200 deterministically-seeded ANSI texts — projections,
  * filters, inner/left joins along the FK graph, grouped and global
  * aggregates — executed by BOTH Catalyst and DuckDB over the same sf0.001
  * parquet, results compared after canonicalization. This widens
  * E3-surface confidence beyond the ~20 hand-written oracle texts; any
  * divergence found here gets promoted to a pinned regression query.
  *
  * Grammar discipline (the same float rules the hand-written oracles
  * follow): every SUM routes through DECIMAL(28,2) and renders as DOUBLE;
  * no division (engines disagree on /0); timestamps appear only in WHERE
  * literals (render formats differ); no LIMIT without ORDER BY
  * (nondeterministic). Doubles canonicalize at 7 significant digits on
  * both sides: the first run at 10 digits caught the known cross-engine
  * 1-ulp FMA wiggle on a*(1.0-b) products (5/200 queries straddled the
  * 10th-digit rounding boundary); 7 digits absorbs it (boundary-straddle
  * odds ~2e-9/value) while still catching any semantic divergence.
  *
  * The DuckDB side shells out to the driver-side python3+duckdb ONCE for
  * the whole batch (test-only dependency, same one tools/oracle_check.py
  * uses; the spec cancels, loudly, if it is absent). fetchall() (not
  * fetchdf) keeps NULL-bearing integer columns integral.
  */
class SqlFuzzSpec extends SparkSpecBase {

  private val Seed = 20260815L
  private val NQueries = 200

  // --- catalog: shared-surface tables, FK edges, literal pools ----------
  private case class Col(name: String, kind: Char) // i/d/s/t
  private case class Tab(name: String, cols: Seq[Col])

  private val tabs = Seq(
    Tab("region", Seq(Col("r_regionkey", 'i'), Col("r_name", 's'))),
    Tab("nation", Seq(Col("n_nationkey", 'i'), Col("n_name", 's'),
      Col("n_regionkey", 'i'))),
    Tab("customer", Seq(Col("c_custkey", 'i'), Col("c_name", 's'),
      Col("c_nationkey", 'i'), Col("c_acctbal", 'd'), Col("c_mktsegment", 's'))),
    Tab("supplier", Seq(Col("s_suppkey", 'i'), Col("s_name", 's'),
      Col("s_nationkey", 'i'), Col("s_acctbal", 'd'))),
    Tab("part", Seq(Col("p_partkey", 'i'), Col("p_name", 's'),
      Col("p_brand", 's'), Col("p_type", 's'), Col("p_size", 'i'),
      Col("p_retailprice", 'd'))),
    Tab("orders", Seq(Col("o_orderkey", 'i'), Col("o_custkey", 'i'),
      Col("o_orderstatus", 's'), Col("o_totalprice", 'd'),
      Col("o_orderdate", 't'), Col("o_orderpriority", 's'))),
    Tab("lineitem", Seq(Col("l_orderkey", 'i'), Col("l_partkey", 'i'),
      Col("l_suppkey", 'i'), Col("l_linenumber", 'i'), Col("l_quantity", 'd'),
      Col("l_extendedprice", 'd'), Col("l_discount", 'd'), Col("l_tax", 'd'),
      Col("l_returnflag", 's'), Col("l_linestatus", 's'), Col("l_shipdate", 't'))))
  private val byName = tabs.map(t => t.name -> t).toMap

  // (fromTable, fkCol, toTable, pkCol)
  private val fks = Seq(
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"))

  private val enumPool: Map[String, Seq[String]] = Map(
    "l_returnflag" -> Seq("A", "N", "R"),
    "l_linestatus" -> Seq("F", "O"),
    "o_orderstatus" -> Seq("F", "O", "P"),
    "o_orderpriority" -> Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"),
    "c_mktsegment" -> Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY"),
    "p_brand" -> Seq("Brand#11", "Brand#23", "Brand#35"),
    "r_name" -> Seq("ASIA", "EUROPE", "AMERICA"))
  private val numPool: Map[String, Seq[String]] = Map(
    "c_acctbal" -> Seq("0.0", "2500.0", "7500.0"),
    "s_acctbal" -> Seq("0.0", "2500.0", "7500.0"),
    "p_retailprice" -> Seq("920.0", "950.0", "980.0"),
    "p_size" -> Seq("10", "25", "40"),
    "o_totalprice" -> Seq("50000.0", "150000.0", "300000.0"),
    "l_quantity" -> Seq("10.0", "25.0", "40.0"),
    "l_extendedprice" -> Seq("2000.0", "20000.0", "80000.0"),
    "l_discount" -> Seq("0.03", "0.05", "0.08"),
    "l_tax" -> Seq("0.02", "0.04", "0.06"),
    "l_linenumber" -> Seq("2", "4", "6"))
  private val tsPool = Seq("1996-06-01", "1998-01-01", "2000-01-01")
  private val groupable = Set("l_returnflag", "l_linestatus", "o_orderstatus",
    "o_orderpriority", "c_mktsegment", "p_brand", "p_type", "p_size", "n_name",
    "r_name", "n_regionkey", "l_linenumber")

  // --- generator ---------------------------------------------------------
  private def genQuery(r: Random): String = {
    // join chain: random walk along FK edges, up to 3 tables
    var names = Vector(tabs(r.nextInt(tabs.size)).name)
    var joins = Vector.empty[String] // rendered JOIN clauses
    var leftJoined = Set.empty[String] // tables whose cols may be NULL
    (0 until r.nextInt(3)).foreach { _ =>
      val cands = fks.filter { case (a, _, b, _) =>
        (names.contains(a) && !names.contains(b)) ||
          (names.contains(b) && !names.contains(a))
      }
      if (cands.nonEmpty) {
        val (a, fk, b, pk) = cands(r.nextInt(cands.size))
        val newT = if (names.contains(a)) b else a
        // LEFT JOIN with an extra ON predicate manufactures NULLs (the
        // fixtures are referentially intact, so a bare LEFT JOIN never
        // would) — exercising 3VL filters, NULL grouping and NULL render
        val extraOn = if (r.nextInt(5) == 0) {
          val t = byName(newT)
          val nc = t.cols.filter(c => numPool.contains(c.name))
          if (nc.nonEmpty) {
            val c = nc(r.nextInt(nc.size)).name
            val lits = numPool(c)
            s" AND ${c} >= ${lits(r.nextInt(lits.size))}"
          } else ""
        } else ""
        val kind = if (extraOn.nonEmpty) "LEFT JOIN" else "JOIN"
        joins :+= s"$kind $newT ON $fk = $pk$extraOn"
        if (extraOn.nonEmpty) leftJoined += newT
        names :+= newT
      }
    }
    val cols = names.flatMap(n => byName(n).cols)
    val notNullCols = names.filterNot(leftJoined).flatMap(n => byName(n).cols)

    def pred(): Option[String] = {
      // predicates only on NOT-NULL-side columns: a WHERE over a
      // LEFT-JOIN null col silently turns the join inner — legal but
      // wasteful fuzz; keep the null rows flowing to the output instead
      val c = notNullCols(r.nextInt(notNullCols.size))
      c.kind match {
        case 'i' if !numPool.contains(c.name) =>
          val m = 2 + r.nextInt(6)
          Some(s"${c.name} % $m = ${r.nextInt(m)}")
        case 'i' | 'd' if numPool.contains(c.name) =>
          val lits = numPool(c.name)
          r.nextInt(3) match {
            case 0 => Some(s"${c.name} >= ${lits(r.nextInt(lits.size))}")
            case 1 => Some(s"${c.name} < ${lits(r.nextInt(lits.size))}")
            case _ =>
              val sorted = lits.sortBy(_.toDouble)
              Some(s"${c.name} BETWEEN ${sorted.head} AND ${sorted.last}")
          }
        case 's' if enumPool.contains(c.name) =>
          val lits = enumPool(c.name)
          r.nextInt(3) match {
            case 0 => Some(s"${c.name} = '${lits(r.nextInt(lits.size))}'")
            case 1 => Some(s"${c.name} <> '${lits(r.nextInt(lits.size))}'")
            case _ =>
              val two = r.shuffle(lits).take(2).sorted
              Some(s"${c.name} IN (${two.map(v => s"'$v'").mkString(", ")})")
          }
        case 't' =>
          val d = tsPool(r.nextInt(tsPool.size))
          Some(s"${c.name} ${if (r.nextBoolean()) "<" else ">="} TIMESTAMP '$d'")
        case _ => None
      }
    }
    val preds = (0 until r.nextInt(4)).flatMap(_ => pred()).distinct
    val whereSql = if (preds.isEmpty) "" else preds.mkString("\nWHERE ", "\n  AND ", "")
    val fromSql = (names.head +: joins).mkString("\nFROM ", "\n", "")

    if (r.nextBoolean()) {
      // aggregate query
      val gcands = cols.filter(c => groupable(c.name)).map(_.name).distinct
      val gcols = r.shuffle(gcands).take(r.nextInt(3)).sorted
      val numeric = cols.filter(c => c.kind == 'd' || c.kind == 'i')
      var k = -1
      val aggs = (0 until (1 + r.nextInt(3))).map { _ =>
        k += 1
        r.nextInt(5) match {
          case 0 => s"COUNT(*) AS a$k"
          case 1 =>
            val c = numeric(r.nextInt(numeric.size)).name
            s"CAST(SUM(CAST($c AS DECIMAL(28,2))) AS DOUBLE) AS a$k"
          case 2 =>
            val c = cols(r.nextInt(cols.size)).name
            if (byName.values.exists(_.cols.exists(cc => cc.name == c && cc.kind == 't')))
              s"COUNT($c) AS a$k"
            else s"MIN($c) AS a$k"
          case 3 =>
            val c = cols.filter(_.kind != 't')(r.nextInt(cols.count(_.kind != 't'))).name
            s"MAX($c) AS a$k"
          case _ =>
            val c = cols(r.nextInt(cols.size)).name
            s"COUNT(DISTINCT $c) AS a$k"
        }
      }
      val sel = (gcols ++ aggs).mkString(",\n  ")
      val grp = if (gcols.isEmpty) "" else gcols.mkString("\nGROUP BY ", ", ", "")
      s"SELECT $sel$fromSql$whereSql$grp"
    } else {
      // projection query (no timestamps in the output — render formats
      // differ across engines; they stay on the WHERE surface)
      val projectable = cols.filter(_.kind != 't')
      val base = r.shuffle(projectable).take(1 + r.nextInt(4)).map(_.name)
      val doubles = projectable.filter(_.kind == 'd')
      val derived =
        if (doubles.size >= 2 && r.nextInt(3) == 0) {
          val a = doubles(r.nextInt(doubles.size)).name
          val b = doubles(r.nextInt(doubles.size)).name
          Seq(s"CAST($a * (1.0 - $b) AS DOUBLE) AS x0")
        } else Seq.empty
      val distinct = if (derived.isEmpty && r.nextInt(4) == 0) "DISTINCT " else ""
      s"SELECT $distinct${(base ++ derived).mkString(",\n  ")}$fromSql$whereSql"
    }
  }

  // --- analytic-surface generator (round-11 ask #5): window functions,
  // set operations, GROUPING SETS/ROLLUP/CUBE, non-recursive CTEs — the
  // shapes the 200-query base grammar never emits. Same float discipline
  // (SUM via DECIMAL rendered DOUBLE, no division, no bare LIMIT), plus
  // one more: every order-sensitive window (ROW_NUMBER/LAG/LEAD/frames)
  // carries the table's unique key as the final ORDER BY term — without a
  // total order those functions are legitimately nondeterministic and a
  // diff would blame the engines for the grammar's sin. RANK/DENSE_RANK
  // may order by a bare non-unique column (tie semantics are themselves
  // surface worth fuzzing; their outputs are tie-invariant).
  private case class WinTab(name: String, pk: Seq[String],
                            parts: Seq[String], nums: Seq[String],
                            strs: Seq[String])
  private val winTabs = Seq(
    WinTab("orders", Seq("o_orderkey"), Seq("o_orderstatus", "o_orderpriority"),
      Seq("o_totalprice", "o_custkey"), Seq("o_orderstatus", "o_orderpriority")),
    WinTab("lineitem", Seq("l_orderkey", "l_linenumber"),
      Seq("l_returnflag", "l_linestatus", "l_linenumber"),
      Seq("l_quantity", "l_extendedprice", "l_discount"),
      Seq("l_returnflag", "l_linestatus")),
    WinTab("customer", Seq("c_custkey"), Seq("c_mktsegment", "c_nationkey"),
      Seq("c_acctbal"), Seq("c_mktsegment", "c_name")),
    WinTab("part", Seq("p_partkey"), Seq("p_brand", "p_size"),
      Seq("p_retailprice", "p_size"), Seq("p_brand", "p_type")))

  private def predFor(t: Tab, r: Random): Option[String] = {
    val c = t.cols(r.nextInt(t.cols.size))
    c.kind match {
      case 'i' if !numPool.contains(c.name) =>
        val m = 2 + r.nextInt(6)
        Some(s"${c.name} % $m = ${r.nextInt(m)}")
      case 'i' | 'd' if numPool.contains(c.name) =>
        val lits = numPool(c.name)
        Some(s"${c.name} ${if (r.nextBoolean()) ">=" else "<"} ${lits(r.nextInt(lits.size))}")
      case 's' if enumPool.contains(c.name) =>
        val lits = enumPool(c.name)
        Some(s"${c.name} ${if (r.nextBoolean()) "=" else "<>"} '${lits(r.nextInt(lits.size))}'")
      case 't' =>
        Some(s"${c.name} ${if (r.nextBoolean()) "<" else ">="} TIMESTAMP '${tsPool(r.nextInt(tsPool.size))}'")
      case _ => None
    }
  }

  private def genAnalyticQuery(r: Random): String = r.nextInt(4) match {
    case 0 => // window functions over a totally-ordered frame
      val t = winTabs(r.nextInt(winTabs.size))
      val part = t.parts(r.nextInt(t.parts.size))
      val ordNum = t.nums(r.nextInt(t.nums.size))
      val totalOrd = (ordNum +: t.pk).mkString(", ")
      val over = s"PARTITION BY $part ORDER BY $totalOrd"
      var k = -1
      val fns = (0 until (1 + r.nextInt(3))).map { _ =>
        k += 1
        r.nextInt(7) match {
          case 0 => s"ROW_NUMBER() OVER ($over) AS w$k"
          case 1 =>
            // rank family: ties allowed, so order by the bare column
            val f = if (r.nextBoolean()) "RANK" else "DENSE_RANK"
            s"$f() OVER (PARTITION BY $part ORDER BY $ordNum) AS w$k"
          case 2 =>
            val c = (t.nums ++ t.strs)(r.nextInt(t.nums.size + t.strs.size))
            s"LAG($c, ${1 + r.nextInt(2)}) OVER ($over) AS w$k"
          case 3 =>
            val c = (t.nums ++ t.strs)(r.nextInt(t.nums.size + t.strs.size))
            s"LEAD($c, ${1 + r.nextInt(2)}) OVER ($over) AS w$k"
          case 4 =>
            val c = t.nums(r.nextInt(t.nums.size))
            s"CAST(SUM(CAST($c AS DECIMAL(28,2))) OVER ($over " +
              s"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS w$k"
          case 5 =>
            val c = t.nums(r.nextInt(t.nums.size))
            val fr = r.nextInt(3) match {
              case 0 => "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW"
              case 1 => "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING"
              case _ => "ROWS BETWEEN UNBOUNDED PRECEDING AND 3 FOLLOWING"
            }
            s"${if (r.nextBoolean()) "MIN" else "MAX"}($c) OVER ($over $fr) AS w$k"
          case _ => s"NTILE(${2 + r.nextInt(5)}) OVER ($over) AS w$k"
        }
      }
      val tab = byName(t.name)
      val whereSql = predFor(tab, r).filter(_ => r.nextBoolean())
        .fold("")(p => s"\nWHERE $p")
      s"SELECT ${(t.pk ++ fns).mkString(",\n  ")}\nFROM ${t.name}$whereSql"
    case 1 => // set operations: two filtered branches of one table
      val t = tabs(r.nextInt(tabs.size))
      val proj = r.shuffle(t.cols.filter(_.kind != 't'))
        .take(1 + r.nextInt(3)).map(_.name).sorted.mkString(", ")
      val p1 = predFor(t, r).getOrElse("1 = 1")
      val p2 = predFor(t, r).getOrElse("1 = 0")
      val op = Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT")(r.nextInt(4))
      s"SELECT $proj FROM ${t.name} WHERE $p1\n$op\nSELECT $proj FROM ${t.name} WHERE $p2"
    case 2 => // GROUPING SETS / ROLLUP / CUBE with GROUPING() markers
      val t = winTabs(r.nextInt(winTabs.size))
      val Seq(a, b) = r.shuffle(t.parts ++ t.strs).distinct.take(2).sorted match {
        case s if s.size >= 2 => s.take(2)
        case s => s ++ Seq(t.pk.head)
      }
      val sumc = t.nums(r.nextInt(t.nums.size))
      val spec = r.nextInt(3) match {
        case 0 => s"ROLLUP($a, $b)"
        case 1 => s"CUBE($a, $b)"
        case _ => s"GROUPING SETS (($a, $b), ($a), ())"
      }
      val tab = byName(t.name)
      val whereSql = predFor(tab, r).filter(_ => r.nextBoolean())
        .fold("")(p => s"\nWHERE $p")
      val having = if (r.nextInt(3) == 0) "\nHAVING COUNT(*) >= 2" else ""
      s"SELECT $a, $b, CAST(GROUPING($a) AS INT) AS ga, CAST(GROUPING($b) AS INT) AS gb,\n" +
        s"  COUNT(*) AS cnt, CAST(SUM(CAST($sumc AS DECIMAL(28,2))) AS DOUBLE) AS s0\n" +
        s"FROM ${t.name}$whereSql\nGROUP BY $spec$having"
    case _ => // non-recursive CTE chain: aggregate, then consume/join back
      val (child, fk, parent, pk) = fks(r.nextInt(fks.size))
      val ct = byName(child)
      val sums = ct.cols.filter(c => c.kind == 'd' ||
        (c.kind == 'i' && numPool.contains(c.name)))
      val sumc = if (sums.nonEmpty) sums(r.nextInt(sums.size)).name else fk
      val whereSql = predFor(ct, r).filter(_ => r.nextBoolean())
        .fold("")(p => s" WHERE $p")
      val cte = s"WITH agg AS (\n  SELECT $fk AS k, COUNT(*) AS cnt,\n" +
        s"    CAST(SUM(CAST($sumc AS DECIMAL(28,2))) AS DOUBLE) AS s0\n" +
        s"  FROM $child$whereSql GROUP BY $fk)"
      if (r.nextBoolean()) {
        // second CTE over the first, then a filtered read
        s"$cte,\nbig AS (SELECT k, cnt, s0 FROM agg WHERE cnt >= ${1 + r.nextInt(3)})\n" +
          s"SELECT COUNT(*) AS n, CAST(SUM(CAST(cnt AS DECIMAL(28,2))) AS DOUBLE) AS c2 FROM big"
      } else {
        // join the aggregate back to the parent along the FK
        val pt = byName(parent)
        val pcols = r.shuffle(pt.cols.filter(_.kind != 't'))
          .take(1 + r.nextInt(2)).map(c => s"$parent.${c.name}").sorted
        s"$cte\nSELECT ${(pcols :+ "agg.cnt" :+ "agg.s0").mkString(", ")}\n" +
          s"FROM $parent JOIN agg ON $pk = agg.k"
      }
  }

  // --- scalar-expression + subquery-predicate generator: the remaining
  // ANSI surface the other two grammars never touch. String functions
  // stay on the ASCII fixtures (UPPER/LOWER/SUBSTRING/TRIM/LENGTH/||,
  // 1-based SUBSTRING semantics shared by both engines), date parts
  // extract as integers (no timestamp rendering), CASE expressions
  // produce enumerable strings, and WHERE carries IN/EXISTS/scalar
  // subqueries along FK edges. Everything integral or string — zero new
  // float surface.
  private def genScalarQuery(r: Random): String = r.nextInt(3) match {
    case 0 => // string/date scalar pipeline over one table
      val t = tabs(r.nextInt(tabs.size))
      val strs = t.cols.filter(c => c.kind == 's')
      val ints = t.cols.filter(c => c.kind == 'i')
      val tss = t.cols.filter(_.kind == 't')
      var k = -1
      val exprs = (0 until (2 + r.nextInt(3))).map { _ =>
        k += 1
        r.nextInt(6) match {
          case 0 if strs.nonEmpty =>
            val c = strs(r.nextInt(strs.size)).name
            s"${Seq("UPPER", "LOWER")(r.nextInt(2))}($c) AS e$k"
          case 1 if strs.nonEmpty =>
            val c = strs(r.nextInt(strs.size)).name
            s"SUBSTRING($c, ${1 + r.nextInt(3)}, ${1 + r.nextInt(6)}) AS e$k"
          case 2 if strs.nonEmpty =>
            val c = strs(r.nextInt(strs.size)).name
            s"LENGTH($c) AS e$k"
          case 3 if strs.size >= 2 =>
            val a = strs(r.nextInt(strs.size)).name
            val b = strs(r.nextInt(strs.size)).name
            s"$a || '#' || $b AS e$k"
          case 4 if tss.nonEmpty =>
            val c = tss(r.nextInt(tss.size)).name
            val f = Seq("YEAR", "MONTH", "DAY")(r.nextInt(3))
            s"$f($c) AS e$k"
          case _ if ints.nonEmpty =>
            val c = ints(r.nextInt(ints.size)).name
            s"CASE WHEN $c % 2 = 0 THEN 'even' ELSE 'odd' END AS e$k"
          case _ => "'x' AS e" + k
        }
      }
      val whereSql = predFor(t, r).filter(_ => r.nextBoolean())
        .fold("")(p => s"\nWHERE $p")
      val pk = t.cols.head.name
      s"SELECT $pk, ${exprs.mkString(",\n  ")}\nFROM ${t.name}$whereSql"
    case 1 => // IN / NOT IN / EXISTS / NOT EXISTS subquery along an FK edge
      val (child, fk, parent, pk) = fks(r.nextInt(fks.size))
      val ct = byName(child); val pt = byName(parent)
      val innerPred = predFor(pt, r).getOrElse("1 = 1")
      val proj = r.shuffle(ct.cols.filter(_.kind != 't'))
        .take(1 + r.nextInt(2)).map(_.name).sorted.mkString(", ")
      val outerPred = predFor(ct, r).filter(_ => r.nextBoolean())
        .fold("")(p => s" AND $p")
      val shape = r.nextInt(4) match {
        case 0 => s"$fk IN (SELECT $pk FROM $parent WHERE $innerPred)"
        case 1 =>
          // NOT IN only on a provably non-NULL inner side (NOT IN with
          // NULLs is a famous 3VL footgun BOTH engines honor — but the
          // fixture PKs are non-null, keeping the fuzz deterministic)
          s"$fk NOT IN (SELECT $pk FROM $parent WHERE $innerPred)"
        case 2 => s"EXISTS (SELECT 1 FROM $parent WHERE $pk = $fk AND $innerPred)"
        case _ => s"NOT EXISTS (SELECT 1 FROM $parent WHERE $pk = $fk AND $innerPred)"
      }
      s"SELECT COUNT(*) AS n, COUNT(DISTINCT $fk) AS nk FROM (\n" +
        s"  SELECT $proj, $fk FROM $child WHERE $shape$outerPred) t"
    case _ => // scalar subquery in the SELECT list (uncorrelated, integral)
      val (child, fk, parent, pk) = fks(r.nextInt(fks.size))
      val ct = byName(child)
      val g = ct.cols.filter(c => groupable(c.name))
      val gc = if (g.nonEmpty) g(r.nextInt(g.size)).name else fk
      s"SELECT $gc, COUNT(*) AS cnt,\n" +
        s"  (SELECT COUNT(*) FROM $parent) AS n_parent\n" +
        s"FROM $child GROUP BY $gc"
  }

  // --- canonical rendering (mirrored in the python runner) ---------------
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")

  /** Correctly-rounded 7-significant-digit scientific render of the EXACT
    * binary value, ties half-even — matching python's "%.6e" (C dtoa).
    * Java's own Formatter %e instead rounds the SHORTEST repr HALF_UP,
    * which disagrees with python on values like 499705.05 (shortest repr
    * ends in ...05; exact value is ...049999...) — the first fuzz run
    * caught exactly that as 15 phantom divergences.
    */
  private def renderDouble(d: Double): String = {
    if (d == 0.0) return "0.000000e+00" // covers -0.0
    val neg = d < 0
    val bd = new java.math.BigDecimal(math.abs(d))
      .round(new java.math.MathContext(7, java.math.RoundingMode.HALF_EVEN))
    val u = bd.unscaledValue.toString
    val exp = u.length - 1 - bd.scale
    val mant = u.padTo(7, '0')
    val es = if (exp < 0) f"e-${-exp}%02d" else f"e+$exp%02d"
    (if (neg) "-" else "") + mant.head + "." + mant.tail + es
  }

  private def renderCell(v: Any): String = v match {
    case null => "\\N"
    case b: Boolean => if (b) "true" else "false"
    case d: Double =>
      if (d.isNaN) "\\N" else renderDouble(d)
    case f: Float => renderCell(f.toDouble)
    case n: Number => n.toString
    case s: String => esc(s)
    case other => esc(other.toString)
  }

  private def canonSpark(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val order = df.columns.zipWithIndex.sortBy(_._1).map(_._2)
    df.collect().toSeq
      .map(row => order.map(i => renderCell(row.get(i))).mkString("\t"))
      .sorted
  }

  private val pyRunner =
    """import sys, json, duckdb
      |sfdir, qfile, ofile = sys.argv[1], sys.argv[2], sys.argv[3]
      |con = duckdb.connect()
      |for t in ["region","nation","customer","supplier","part","orders","lineitem"]:
      |    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
      |queries = json.load(open(qfile))
      |def cell(v):
      |    if v is None: return "\\N"
      |    if isinstance(v, bool): return "true" if v else "false"
      |    if isinstance(v, float):
      |        if v != v: return "\\N"
      |        if v == 0.0: v = 0.0
      |        return "%.6e" % v
      |    if isinstance(v, int): return str(v)
      |    s = str(v)
      |    return s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")
      |out = []
      |for i, q in enumerate(queries):
      |    try:
      |        res = con.execute(q)
      |        cols = [d[0] for d in res.description]
      |        order = sorted(range(len(cols)), key=lambda j: cols[j])
      |        rows = sorted("\t".join(cell(r[j]) for j in order) for r in res.fetchall())
      |        out.append({"i": i, "rows": rows})
      |    except Exception as e:
      |        out.append({"i": i, "error": str(e)})
      |json.dump(out, open(ofile, "w"))
      |""".stripMargin

  test(s"differential fuzz: $NQueries seeded ANSI texts agree between Catalyst and DuckDB") {
    val r = new Random(Seed)
    diffFuzz((0 until NQueries).map(_ => genQuery(r)))
  }

  test("differential fuzz: 120 seeded ANALYTIC texts (windows, set ops, grouping sets, CTEs) agree") {
    val r = new Random(Seed + 1)
    diffFuzz((0 until 120).map(_ => genAnalyticQuery(r)))
  }

  test("differential fuzz: 80 seeded SCALAR/SUBQUERY texts (string/date funcs, IN/EXISTS, scalar subqueries) agree") {
    val r = new Random(Seed + 2)
    diffFuzz((0 until 80).map(_ => genScalarQuery(r)))
  }

  private def diffFuzz(queries: Seq[String]): Unit = {
    import scala.sys.process._
    val hasPy =
      try Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ())) == 0
      catch { case _: Throwable => false }
    assume(hasPy, "python3+duckdb (driver-side oracle replica) not available")

    // one python invocation for the whole batch
    val dir = java.nio.file.Files.createTempDirectory("sqlfuzz")
    val qfile = dir.resolve("queries.json")
    def jesc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\t' => "\\t"; case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    java.nio.file.Files.writeString(qfile,
      queries.map(q => "\"" + jesc(q) + "\"").mkString("[", ",", "]"))
    val pyfile = dir.resolve("runner.py")
    java.nio.file.Files.writeString(pyfile, pyRunner)
    val ofile = dir.resolve("out.json")
    val rc = Process(Seq("python3", pyfile.toString, Sf0001,
      qfile.toString, ofile.toString)).!
    assert(rc == 0, "duckdb batch runner failed")

    // minimal JSON reader for the runner's fixed shape
    val raw = java.nio.file.Files.readString(ofile)
    val duck: Map[Int, Either[String, Seq[String]]] = {
      import scala.collection.mutable
      val m = mutable.Map.empty[Int, Either[String, Seq[String]]]
      // parse with java's regex-free scanner: the runner emits
      // [{"i": 0, "rows": [...]}, {"i": 1, "error": "..."}]
      var pos = 0
      def skipWs(): Unit = while (pos < raw.length && raw(pos).isWhitespace) pos += 1
      def expect(c: Char): Unit = { skipWs(); require(raw(pos) == c, s"json: want $c at $pos got ${raw(pos)}"); pos += 1 }
      def parseString(): String = {
        skipWs(); require(raw(pos) == '"'); pos += 1
        val sb = new StringBuilder
        while (raw(pos) != '"') {
          if (raw(pos) == '\\') {
            pos += 1
            raw(pos) match {
              case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
              case 'u' => sb += Integer.parseInt(raw.substring(pos + 1, pos + 5), 16).toChar; pos += 4
              case c => sb += c
            }
          } else sb += raw(pos)
          pos += 1
        }
        pos += 1
        sb.toString
      }
      def parseInt(): Int = {
        skipWs(); val st = pos
        while (pos < raw.length && (raw(pos).isDigit || raw(pos) == '-')) pos += 1
        raw.substring(st, pos).toInt
      }
      expect('[')
      skipWs()
      if (raw(pos) != ']') {
        var more = true
        while (more) {
          expect('{')
          var i = -1; var rows: Seq[String] = null; var err: String = null
          var inObj = true
          while (inObj) {
            val key = parseString(); expect(':')
            key match {
              case "i" => i = parseInt()
              case "error" => err = parseString()
              case "rows" =>
                expect('[')
                val buf = scala.collection.mutable.ArrayBuffer.empty[String]
                skipWs()
                if (raw(pos) != ']') {
                  var moreRows = true
                  while (moreRows) {
                    buf += parseString()
                    skipWs()
                    if (raw(pos) == ',') pos += 1 else moreRows = false
                  }
                }
                expect(']')
                rows = buf.toSeq
            }
            skipWs()
            if (raw(pos) == ',') pos += 1 else inObj = false
          }
          expect('}')
          m(i) = if (err != null) Left(err) else Right(rows)
          skipWs()
          if (raw(pos) == ',') pos += 1 else more = false
        }
      }
      m.toMap
    }

    Tables.registerAll(spark, Sf0001)
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    queries.zipWithIndex.foreach { case (q, i) =>
      val sparkRows =
        try Right(canonSpark(spark.sql(q)))
        catch { case e: Throwable => Left(e.toString.take(200)) }
      (sparkRows, duck(i)) match {
        case (Right(a), Right(b)) =>
          if (a != b) {
            val diff = a.zipAll(b, "<missing>", "<missing>")
              .find { case (x, y) => x != y }
            failures += s"#$i rows ${a.size} vs ${b.size}; first diff: ${diff}\nSQL:\n$q"
          }
        case (Left(ea), _) => failures += s"#$i Spark ERROR: $ea\nSQL:\n$q"
        case (_, Left(eb)) => failures += s"#$i DuckDB ERROR: $eb\nSQL:\n$q"
      }
    }
    assert(failures.isEmpty,
      s"${failures.size}/${queries.size} diverged:\n${failures.take(5).mkString("\n---\n")}")
  }
}
