package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.StratifiedSelect

/** Data-quality audits (round 5): referential-integrity orphan counts and
  * robust (IQR) outlier detection — the ingest-QA stage a 100 TB warehouse
  * runs before anything downstream trusts the tables.
  */
object Quality {

  /** q93: referential-integrity audit — for each FK edge of the star
    * schema, how many child rows have no parent (anti-join count) and how
    * many carry a NULL key. Each edge is one left-anti join aggregated to
    * a single row; the union is 4 rows. Dimension parents broadcast; the
    * lineitem→orders edge shuffles both sides on the key — that IS the
    * check, and it is the same shuffle the production join would pay.
    * A healthy fixture reports zeros — the value is the CHECK (and the
    * zeros being hash-verified against an independent engine).
    */
  def q93RefIntegrity(s: SparkSession, dir: String): DataFrame = {
    def edge(name: String, child: DataFrame, childKey: String,
             parent: DataFrame, parentKey: String): DataFrame = {
      val orphans = child.filter(col(childKey).isNotNull)
        .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      val totals = child.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(childKey).isNull, 1L).otherwise(0L)).as("n_null_keys"))
      totals.crossJoin(broadcast(orphans))
        .select(lit(name).as("fk_edge"), col("n_rows"), col("n_null_keys"),
                col("n_orphans"))
    }
    edge("lineitem->orders", Tables.lineitem(s, dir), "l_orderkey",
         Tables.orders(s, dir), "o_orderkey")
      .unionByName(edge("orders->customer", Tables.orders(s, dir), "o_custkey",
         Tables.customer(s, dir), "c_custkey"))
      .unionByName(edge("customer->nation", Tables.customer(s, dir), "c_nationkey",
         Tables.nation(s, dir), "n_nationkey"))
      .unionByName(edge("supplier->nation", Tables.supplier(s, dir), "s_nationkey",
         Tables.nation(s, dir), "n_nationkey"))
  }

  /** q94: robust outlier counts per order priority — Tukey fences at
    * 1.5 IQR off the EXACT type-1 quartiles (values at ranks
    * ceil(n/4), ceil(3n/4)), ranks computed through the chunked-prefix
    * machinery so no priority group ever sorts in one task (q79's
    * pattern). The quartile frame is groups-sized and broadcasts back
    * for the fence count. Fence arithmetic (q1 - 1.5*(q3-q1)) is the
    * same IEEE expression on both engines over raw stored doubles.
    */
  def q94IqrOutliers(s: SparkSession, dir: String): DataFrame = {
    val ranked = StratifiedSelect.chunkedPrefix(
      Tables.orders(s, dir)
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey")),
      stratum = "o_orderpriority", primary = "o_totalprice", desc = false,
      tieBreak = Seq(col("o_orderkey")), value = lit(1L),
      nChunks = defaultChunks(s))
    val quartiles = ranked
      .filter(col("rn") === expr("(n_stratum + 3) DIV 4") ||
              col("rn") === expr("(3 * n_stratum + 3) DIV 4"))
      .groupBy("o_orderpriority")
      .agg(min(when(col("rn") === expr("(n_stratum + 3) DIV 4"),
             col("o_totalprice"))).as("q1"),
           min(when(col("rn") === expr("(3 * n_stratum + 3) DIV 4"),
             col("o_totalprice"))).as("q3"))
      .select(col("o_orderpriority"), col("q1"), col("q3"),
        (col("q1") - lit(1.5) * (col("q3") - col("q1"))).as("lo"),
        (col("q3") + lit(1.5) * (col("q3") - col("q1"))).as("hi"))
    Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_totalprice"))
      .join(broadcast(quartiles), "o_orderpriority")
      .groupBy("o_orderpriority")
      .agg(min("q1").as("q1"), min("q3").as("q3"),
           sum(when(col("o_totalprice") < col("lo") ||
                    col("o_totalprice") > col("hi"), 1L).otherwise(0L))
             .as("n_outliers"),
           count(lit(1)).as("n_rows"))
  }

  /** q98: whole-table text/date profile — the string half of the ingest
    * QA (operators.Profile.stringProfile over the documents table's lang /
    * source / text columns) unioned with the date profile of the events
    * timestamp (Profile.dateProfile). The reference's first data-quality
    * ask on any new table is exactly this `.head()`/`.nunique()`-style
    * dump (/root/reference/main.py:377-434); here every stat is exact and
    * SQL-expressible, so the whole 4-row audit hash-verifies. Plan shape
    * per Profile.numericProfile: one shared scalar pass + one
    * single-DISTINCT pass per column, never an Expand.
    */
  def q98TableProfile(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.stringProfile(
        Tables.documents(s, dir), Seq("lang", "source", "text"))
      .unionByName(graft.operators.Profile.dateProfile(
        Tables.events(s, dir), Seq("ts")))

  /** q194: exact per-group percentiles (p50/p95/p99 of value per
    * event_type) by the nearest-rank definition r = ⌈p·n/100⌉ — the SLO
    * report shape. Ranks come from chunkedPrefix (per-stratum exact rank
    * with NO single-task stratum sort — q79's device), so a popular
    * event type never funnels through one task; each requested
    * percentile is one rank-equality filter, ties broken on event_id so
    * both engines pick the same row.
    */
  def q194GroupPercentiles(s: SparkSession, dir: String): DataFrame = {
    val base = graft.Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("event_id"))
    graft.operators.StratifiedSelect.chunkedPrefix(
        base, "event_type", "value", desc = false,
        tieBreak = Seq(col("event_id")), value = lit(1L), nChunks = 8)
      .withColumn("pct", explode(array(lit(50), lit(95), lit(99))))
      .filter(col("rn") === expr("(n_stratum * pct + 99) DIV 100"))
      .select(col("event_type"), col("pct"), col("value"))
      .orderBy("event_type", "pct")
  }

  /** q195: histogram drift audit — the first 15 days' value distribution
    * vs the rest, as per-mille bucket shares and their squared gaps (the
    * integer-exact cousin of a PSI report: no logs, so no float
    * divergence surface at all). Fixed-width buckets with a clamped tail
    * (value DIV 32 — a power-of-two divide, so floor() is engine-exact);
    * half totals enter as two bounded driver counts; the result frame is
    * ≤ 16 rows.
    */
  def q195HistDrift(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(s, dir).filter(col("value").isNotNull)
    val minDay = ev.agg(min(expr("unix_micros(ts) DIV 86400000000")))
      .head().getLong(0)
    val b = ev.select(
      (expr("unix_micros(ts) DIV 86400000000") - minDay).as("off"),
      least(lit(15L), floor(col("value") / lit(32.0)).cast("long")).as("bucket"))
    def half(f: org.apache.spark.sql.Column): (DataFrame, Long) = {
      val h = b.filter(f)
      (h.groupBy("bucket").agg(count(lit(1)).as("cnt")), h.count())
    }
    val (h1, n1) = half(col("off") < 15)
    val (h2, n2) = half(col("off") >= 15)
    h1.withColumnRenamed("cnt", "n1")
      .join(h2.withColumnRenamed("cnt", "n2"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"))
      .select(col("bucket"), col("n1"), col("n2"),
        expr(s"(n1 * 1000) DIV $n1").as("p1_pm"),
        expr(s"(n2 * 1000) DIV $n2").as("p2_pm"))
      .withColumn("gap_sq",
        expr("(p1_pm - p2_pm) * (p1_pm - p2_pm)"))
      .orderBy("bucket")
  }

  /** q218: declarative expectations suite — the dbt-test / Great
    * Expectations stage made a gated query: [[graft.operators.Expectations
    * .audit]] evaluates each table's rules in ONE conditional-aggregate
    * scan, [[graft.operators.Expectations.fkOrphans]] counts
    * referential-integrity orphans by anti-join, and the union is the
    * 8-row quality report a production ingest gates on. This is the
    * reference's printed-diagnostics stage (/root/reference/main.py:
    * 377-434 — null counts, cardinality cross-checks) re-expressed
    * declaratively. Rules cover the three shapes the engine must get
    * right: always-true invariants (PK non-null), real violations
    * (negative account balances, year-2001 order dates), and a
    * NULL-evaluating predicate (`length(nullif(lang,'en')) = 2` is NULL
    * for 'en' rows — three-valued logic counts unknowns as violations,
    * the conservative convention both engines must share).
    */
  def q218Expectations(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Expectations.{Expect, audit, fkOrphans}
    val orders = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val docs = Tables.documents(s, dir)
    audit(orders, Seq(
        Expect("orders_pk_nonnull", col("o_orderkey").isNotNull),
        Expect("orders_price_positive", col("o_totalprice") > lit(0.0)),
        Expect("orders_date_pre_2001",
          col("o_orderdate") < to_timestamp(lit("2001-01-01")))))
      .unionByName(audit(cust, Seq(
        Expect("customer_acctbal_nonneg", col("c_acctbal") >= lit(0.0)),
        Expect("customer_mktsegment_known", col("c_mktsegment").isin(
          "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")))))
      .unionByName(audit(docs, Seq(
        Expect("doc_text_min_len", length(col("text")) >= lit(10)),
        Expect("doc_lang_latin2",
          length(nullif(col("lang"), lit("en"))) === lit(2)))))
      .unionByName(fkOrphans("orders_fk_customer",
        orders, "o_custkey", cust, "c_custkey"))
  }

  /** q236: the expectations QUARANTINE gate as a gated query — q218's
    * audit tells you HOW MANY rows violate each rule; this one is the
    * admission side ([[graft.operators.Expectations.gateRows]]): every
    * document annotated with the exact rule-set it fails, histogrammed by
    * violation combination. The combination histogram is what a triage
    * owner reads (which failure MODES co-occur), and it proves per-row
    * rule evaluation + the three-valued NULL=violation convention
    * cross-engine, which q218's aggregate cannot. Map-only per-row rule
    * evaluation + one hash-agg; the violation list renders as a
    * comma-join in DECLARATION order on both engines (concat_ws skips
    * the NULL non-violations identically).
    */
  def q236ExpectationsGate(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Expectations.{Expect, gateRows}
    gateRows(Tables.documents(s, dir), Seq(
        Expect("text_nonnull", col("text").isNotNull),
        Expect("text_min_len", length(col("text")) >= lit(200)),
        Expect("lang_known", col("lang").isin("en", "de", "fr", "es"))))
      .groupBy(array_join(col("violations"), ",").as("violation_set"),
        col("admitted"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** q243: perplexity-based quality filter from the PERSISTED bigram LM —
    * the CCNet stage (Wenzek et al. 2020) that was the one standard
    * quality filter still missing after rule-based Gopher (q160) and
    * repetition screens (q56): score every document by its mean
    * per-bigram NLL against the persisted statistics table
    * (TextIndex.saveBigramStats through q169's full lifecycle — build,
    * admit, compact), cut each source into perplexity TERTILES, and keep
    * the head+middle buckets (CCNet's keep rule; the tail tertile is the
    * gibberish/boilerplate band).
    *
    * Cross-engine exactness is BY ENUMERATION (TextIndex.docNllFromStats
    * scaladoc): probabilities quantize to integer ppm, per-pair NLL is
    * floor(-ln(p_ppm/1e6)*1e6) — verified bit-identical between
    * Math.log and DuckDB's ln over all 10^6 possible inputs — and
    * everything downstream is exact BIGINT arithmetic. The per-source
    * tertile rank rides StratifiedSelect.chunkedPrefix (q165's device):
    * NO single-task sort even when one source dominates a 100 TB corpus;
    * the oracle replays it as a plain ROW_NUMBER window.
    */
  def q243PerplexityFilter(s: SparkSession, dir: String): DataFrame = {
    val stats = BigramStatsTables.ensure(s, dir)
    val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
      .select("doc_id", "source", "text")
    val scored = graft.operators.TextIndex.docNllFromStats(
      docs, stats, keyCols = Seq("doc_id", "source"))
    val ranked = StratifiedSelect.chunkedPrefix(scored,
      stratum = "source", primary = "avg_nll_u", desc = false,
      tieBreak = Seq(col("doc_id")), value = lit(1L),
      nChunks = defaultChunks(s))
    ranked
      .withColumn("ppl_bucket", expr("CAST((rn - 1) * 3 DIV n_stratum + 1 AS INT)"))
      .withColumn("keep", col("ppl_bucket") <= 2)
      .select("doc_id", "source", "n_pairs", "sum_nll", "avg_nll_u",
        "ppl_bucket", "keep")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q194_group_percentiles" -> (q194GroupPercentiles _),
    "q195_hist_drift" -> (q195HistDrift _),
    "q93_ref_integrity" -> (q93RefIntegrity _),
    "q94_iqr_outliers"  -> (q94IqrOutliers _),
    "q98_table_profile" -> (q98TableProfile _),
    "q218_expectations" -> (q218Expectations _),
    "q236_expectations_gate" -> (q236ExpectationsGate _),
    "q243_perplexity_filter" -> (q243PerplexityFilter _))

  val oracles: Map[String, String] = Map(
    // replays the persisted-stats fold from the corpus directly (the
    // additive-monoid invariant: any batch split folds to the same
    // statistics — q169's device), then the exact integer NLL algebra
    // and a plain per-source ROW_NUMBER for the chunkedPrefix rank.
    // 13815510 = floor(-ln(1e-6)*1e6), TextIndex.UnkNllMicro.
    "q243_perplexity_filter" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ts
        |           FROM documents WHERE text IS NOT NULL),
        |pr AS (SELECT doc_id, source, ts[i] AS tok, ts[i + 1] AS nxt
        |       FROM t, UNNEST(range(1, len(ts))) AS u(i)
        |       WHERE len(ts) >= 2),
        |c AS (SELECT tok, nxt, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM pr GROUP BY 1, 2),
        |tt AS (SELECT tok, CAST(SUM(cnt) AS BIGINT) AS tot FROM c GROUP BY 1),
        |p AS (SELECT c.tok, c.nxt,
        |        CAST(floor(-ln(CAST(GREATEST(c.cnt * 1000000 // tt.tot, 1)
        |          AS DOUBLE) / 1000000.0) * 1000000.0) AS BIGINT) AS nll_u
        |      FROM c JOIN tt USING (tok)),
        |d AS (SELECT pr.doc_id, pr.source,
        |        CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |        CAST(SUM(COALESCE(p.nll_u, 13815510)) AS BIGINT) AS sum_nll
        |      FROM pr LEFT JOIN p ON pr.tok = p.tok AND pr.nxt = p.nxt
        |      GROUP BY 1, 2),
        |r AS (SELECT doc_id, source, n_pairs, sum_nll,
        |        CAST(sum_nll // n_pairs AS BIGINT) AS avg_nll_u
        |      FROM d),
        |w AS (SELECT *,
        |        ROW_NUMBER() OVER (PARTITION BY source
        |          ORDER BY avg_nll_u, doc_id) AS rn,
        |        COUNT(*) OVER (PARTITION BY source) AS n
        |      FROM r)
        |SELECT doc_id, source, n_pairs, sum_nll, avg_nll_u,
        |  CAST((rn - 1) * 3 // n + 1 AS INTEGER) AS ppl_bucket,
        |  ((rn - 1) * 3 // n + 1) <= 2 AS keep
        |FROM w""".stripMargin,
    "q236_expectations_gate" ->
      """WITH g AS (
        |  SELECT concat_ws(',',
        |    CASE WHEN NOT COALESCE(text IS NOT NULL, FALSE)
        |         THEN 'text_nonnull' END,
        |    CASE WHEN NOT COALESCE(length(text) >= 200, FALSE)
        |         THEN 'text_min_len' END,
        |    CASE WHEN NOT COALESCE(lang IN ('en','de','fr','es'), FALSE)
        |         THEN 'lang_known' END) AS violation_set
        |  FROM documents)
        |SELECT violation_set, violation_set = '' AS admitted,
        |  COUNT(*) AS n_docs
        |FROM g GROUP BY 1, 2""".stripMargin,
    "q218_expectations" ->
      """SELECT 'orders_pk_nonnull' AS rule, COUNT(*) AS n_checked,
        |  CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(o_orderkey IS NOT NULL,
        |    FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations
        |FROM orders
        |UNION ALL
        |SELECT 'orders_price_positive', COUNT(*),
        |  CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(o_totalprice > 0,
        |    FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'orders_date_pre_2001', COUNT(*),
        |  CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(
        |    o_orderdate < TIMESTAMP '2001-01-01',
        |    FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'customer_acctbal_nonneg', COUNT(*),
        |  CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(c_acctbal >= 0,
        |    FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT)
        |FROM customer
        |UNION ALL
        |SELECT 'customer_mktsegment_known', COUNT(*),
        |  CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(c_mktsegment IN
        |    ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY'),
        |    FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT)
        |FROM customer
        |UNION ALL
        |SELECT 'doc_text_min_len', COUNT(*),
        |  CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(length(text) >= 10,
        |    FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT)
        |FROM documents
        |UNION ALL
        |SELECT 'doc_lang_latin2', COUNT(*),
        |  CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(
        |    length(nullif(lang, 'en')) = 2,
        |    FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT)
        |FROM documents
        |UNION ALL
        |SELECT 'orders_fk_customer', (SELECT COUNT(*) FROM orders),
        |  (SELECT COUNT(*) FROM orders o WHERE o_custkey IS NULL OR
        |    NOT EXISTS (SELECT 1 FROM customer c
        |                WHERE c.c_custkey = o.o_custkey))""".stripMargin,
    "q194_group_percentiles" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, p.pct, value
        |FROM r, (VALUES (50), (95), (99)) p(pct)
        |WHERE rn = (n * p.pct + 99) // 100
        |ORDER BY event_type, p.pct""".stripMargin,
    "q195_hist_drift" ->
      """WITH ev AS (
        |  SELECT value,
        |    epoch_us(ts) // 86400000000
        |      - (SELECT MIN(epoch_us(ts) // 86400000000)
        |         FROM events WHERE value IS NOT NULL) AS off
        |  FROM events WHERE value IS NOT NULL),
        |b AS (
        |  SELECT off, LEAST(15, CAST(FLOOR(value / 32.0) AS BIGINT)) AS bucket
        |  FROM ev),
        |h1 AS (SELECT bucket, COUNT(*) AS n1 FROM b WHERE off < 15 GROUP BY 1),
        |h2 AS (SELECT bucket, COUNT(*) AS n2 FROM b WHERE off >= 15 GROUP BY 1),
        |t1 AS (SELECT COUNT(*) AS t FROM b WHERE off < 15),
        |t2 AS (SELECT COUNT(*) AS t FROM b WHERE off >= 15),
        |j AS (
        |  SELECT COALESCE(h1.bucket, h2.bucket) AS bucket,
        |    COALESCE(n1, 0) AS n1, COALESCE(n2, 0) AS n2
        |  FROM h1 FULL OUTER JOIN h2 ON h1.bucket = h2.bucket)
        |SELECT bucket, n1, n2,
        |  (n1 * 1000) // t1.t AS p1_pm,
        |  (n2 * 1000) // t2.t AS p2_pm,
        |  ((n1 * 1000) // t1.t - (n2 * 1000) // t2.t)
        |    * ((n1 * 1000) // t1.t - (n2 * 1000) // t2.t) AS gap_sq
        |FROM j, t1, t2
        |ORDER BY bucket""".stripMargin,
    "q93_ref_integrity" ->
      """SELECT 'lineitem->orders' AS fk_edge, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_keys,
        |  CAST(SUM(CASE WHEN l_orderkey IS NOT NULL AND NOT EXISTS (
        |    SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        |FROM lineitem l
        |UNION ALL
        |SELECT 'orders->customer', COUNT(*),
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(SUM(CASE WHEN o_custkey IS NOT NULL AND NOT EXISTS (
        |    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |    THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders o
        |UNION ALL
        |SELECT 'customer->nation', COUNT(*),
        |  CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(SUM(CASE WHEN c_nationkey IS NOT NULL AND NOT EXISTS (
        |    SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
        |    THEN 1 ELSE 0 END) AS BIGINT)
        |FROM customer c
        |UNION ALL
        |SELECT 'supplier->nation', COUNT(*),
        |  CAST(SUM(CASE WHEN s_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(SUM(CASE WHEN s_nationkey IS NOT NULL AND NOT EXISTS (
        |    SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)
        |    THEN 1 ELSE 0 END) AS BIGINT)
        |FROM supplier s""".stripMargin,
    "q94_iqr_outliers" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders),
        |q AS (
        |  SELECT o_orderpriority,
        |    MIN(CASE WHEN rn = (n + 3) // 4 THEN o_totalprice END) AS q1,
        |    MIN(CASE WHEN rn = (3 * n + 3) // 4 THEN o_totalprice END) AS q3
        |  FROM ranked GROUP BY 1),
        |f AS (
        |  SELECT o_orderpriority, q1, q3,
        |    q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
        |  FROM q)
        |SELECT r.o_orderpriority, f.q1, f.q3,
        |  CAST(SUM(CASE WHEN r.o_totalprice < f.lo OR r.o_totalprice > f.hi
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  COUNT(*) AS n_rows
        |FROM ranked r JOIN f USING (o_orderpriority)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q98_table_profile" ->
      """SELECT 'lang' AS col_name, COUNT(lang) AS n_non_null,
        |  COUNT(*) - COUNT(lang) AS n_nulls,
        |  COUNT(DISTINCT lang) AS n_distinct,
        |  CAST(MIN(length(lang)) AS BIGINT) AS min_len,
        |  CAST(MAX(length(lang)) AS BIGINT) AS max_len,
        |  MIN(lang) AS min_val, MAX(lang) AS max_val
        |FROM documents
        |UNION ALL
        |SELECT 'source', COUNT(source), COUNT(*) - COUNT(source),
        |  COUNT(DISTINCT source),
        |  CAST(MIN(length(source)) AS BIGINT), CAST(MAX(length(source)) AS BIGINT),
        |  MIN(source), MAX(source)
        |FROM documents
        |UNION ALL
        |SELECT 'text', COUNT(text), COUNT(*) - COUNT(text),
        |  COUNT(DISTINCT text),
        |  CAST(MIN(length(text)) AS BIGINT), CAST(MAX(length(text)) AS BIGINT),
        |  MIN(text), MAX(text)
        |FROM documents
        |UNION ALL
        |SELECT 'ts', COUNT(CAST(ts AS DATE)), COUNT(*) - COUNT(CAST(ts AS DATE)),
        |  COUNT(DISTINCT CAST(ts AS DATE)),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |  STRFTIME(MIN(CAST(ts AS DATE)), '%Y-%m-%d'),
        |  STRFTIME(MAX(CAST(ts AS DATE)), '%Y-%m-%d')
        |FROM events""".stripMargin)
}
