package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Privacy, TextFunctions, WordGramHashes}
import graft.operators.RangeJoin

/** Corpus-curation operators (round 4): privacy scrubbing, URL blocklist
  * filtering, cross-document duplicate-n-gram contamination, time-window
  * range joins, and per-stratum quantile filtering. Every query carries a
  * full DuckDB oracle — the PII/URL fixtures plant deterministic synthetic
  * payloads (the q42 pattern) so the scrub paths exercise real matches.
  */
object Curation {

  /** PII redaction — count + mask emails/phones/IPv4s (functions.Privacy).
    * The fixture word soup carries no PII, so deterministic synthetic PII
    * is planted first (pure function of doc_id; oracle rebuilds it).
    */
  def q62PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val t2 = Privacy.withSyntheticPii(col("text"), col("doc_id"))
    // null texts excluded symmetrically (the q59 null contract: legacy
    // size(NULL) = -1 vs the oracle's NULL would drift on one side only)
    Tables.documents(s, dir).filter(col("text").isNotNull).select(
      col("doc_id"),
      Privacy.emailCount(t2).as("n_emails"),
      Privacy.phoneCount(t2).as("n_phones"),
      Privacy.ipv4Count(t2).as("n_ips"),
      Privacy.redactPii(t2).as("redacted"))
  }

  /** Hosts a URL-bearing doc links to, flagged against a blocklist — the
    * domain-filter stage of web-corpus curation. The blocklist joins as a
    * broadcast dim (at 100 TB a blocklist is still dimension-sized).
    */
  val BlockedHosts: Seq[String] =
    Seq("www.site0.example.com", "www.site4.example.com", "blog7.test.org")

  def q63UrlBlocklist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t2 = Privacy.withSyntheticUrl(col("text"), col("doc_id"))
    val hosts = Tables.documents(s, dir)
      .filter(col("text").isNotNull) // q59 null contract, as in q62
      .select(col("doc_id"), Privacy.urlHost(t2).as("domain"))
      .filter(col("domain") =!= "")
    val blocklist = BlockedHosts.toDF("domain").withColumn("is_blocked", lit(true))
    hosts.join(broadcast(blocklist), Seq("domain"), "left")
      .select(col("doc_id"), col("domain"),
        coalesce(col("is_blocked"), lit(false)).as("blocked"))
  }

  /** Cross-document duplicate-n-gram contamination (the Dolma/Gopher
    * "fraction of a doc made of corpus-duplicated n-grams" signal): for
    * each doc, the fraction of its distinct word-3-grams that appear in at
    * least one OTHER document.
    *
    * Distributed shape: one explode of the per-doc distinct shingle-hash
    * set (WordGramHashes — the q38/q56 hash-set == string-set contract),
    * one groupBy(shingle) for corpus df, join the postings back on the
    * same shingle key (exchange reused), one groupBy(doc). Never all-pairs;
    * both shuffles are on high-cardinality keys — linear at 100 TB.
    */
  def q64DupGramRatio(s: SparkSession, dir: String): DataFrame =
    dupGramRatio(Tables.documents(s, dir))

  /** The reusable operator behind q64 (planted-duplicate spec in
    * CurationSpec). `df >= 2` means "this gram occurs in another doc":
    * posting rows are per-doc DISTINCT, so corpus df counts documents.
    */
  def dupGramRatio(docs: DataFrame): DataFrame = {
    val posting = docs.select(col("doc_id"),
      explode(WordGramHashes.wordGramHashes(col("text"), 3)).as("h"))
    val dfCounts = posting.groupBy("h").agg(count(lit(1)).as("df"))
    // posting lists are never broadcast-able (the q38 lesson: Catalyst
    // sizes Generate output at its input's bytes, so it would broadcast
    // the ~shingles-per-doc-times-exploded list); force the distributed
    // hash join on the shingle key, building on the aggregated df side —
    // its exchange is the same one the groupBy(h) already shuffled
    posting.join(dfCounts.hint("shuffle_hash"), "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_ratio",
        col("n_dup_grams").cast("double") / col("n_grams"))
  }

  /** Purchases in the trailing 2 h before each click, per user — the
    * bucketed range join (operators.RangeJoin) under the gate. The oracle
    * is the PLAIN inequality join, proving the bin-explode rewrite is a
    * pure physical optimization (the q52 salted-join pattern).
    */
  def q65RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"),
        col("ts").as("p_ts"))
    val pairs = RangeJoin.trailingWindowJoin(clicks, purchases,
      key = "user_id", probeTs = "ts", buildTs = "p_ts",
      windowUs = 2L * 3600 * 1000000)
    val counts = pairs.groupBy("event_id").agg(count(lit(1)).as("n"))
    clicks.join(counts, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n"), lit(0L)).as("n_prior_purchases"))
  }

  /** Per-language top-quartile quality filter — the "keep the best 25% of
    * each stratum" curation step, exact by rank: keep rn <= ceil(n/4)
    * (integer form rn*4 <= n+3, so both engines compare integers — no
    * float quantile to disagree on).
    *
    * Scale note: like q61 the window partitions by lang only — fine while
    * strata fit a task's sort; at a 100 TB stratum, pre-filter to an
    * approx-quantile band first (the q48→q54 pattern), then rank the
    * survivors exactly.
    */
  def q66QuantileFilter(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("quality").desc, col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .filter(col("rn") * 4 <= col("n") + 3)
      .select("doc_id", "lang", "quality", "rn")
  }

  /** The "new batch" slice for incremental admission: the last five
    * sources (an explicit IN list — source strings sort lexicographically,
    * so a >= comparison would misorder src2 vs src15).
    */
  val NewBatchSources: Seq[String] =
    Seq("src15", "src16", "src17", "src18", "src19")

  /** Incremental corpus admission (operators.Dedup.admitIncremental): the
    * last five sources arrive as a new batch and are screened against the
    * rest of the corpus — exact md5 screen + lossless 4x16-band SimHash
    * screen (Hamming <= 3), one admission row per new doc. Fully
    * oracle-checked: the banding is lossless by pigeonhole, so the oracle
    * is the all-pairs SQL over the shared fingerprint CTEs.
    */
  def q67IncrementalAdmit(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.admitIncremental(
      Tables.documents(s, dir).filter(col("text").isNotNull), // q59 null contract
      isNew = col("source").isin(NewBatchSources: _*),
      maxHamming = 3)

  /** Column profile of lineitem's numeric measures (operators.Profile):
    * one scan, one aggregate, one row per column. Exact distinct counts
    * keep it oracle-checkable (100 TB swaps them for HLL, q44 pattern).
    */
  def q68Profile(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.numericProfile(Tables.lineitem(s, dir),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))

  /** Fixed-width histogram of order totals: 10 x 50k buckets with clamped
    * tails — the distribution-sketch stage of data profiling.
    */
  def q69Histogram(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.histogram(Tables.orders(s, dir),
      "o_totalprice", lo = 0.0, width = 50000.0, nBuckets = 10)

  /** Whitespace/control-char normalization (TextFunctions.normalizeWs):
    * the fixtures are already clean, so deterministic dirt is planted
    * first (tab/CR/LF runs, a pure function of doc_id the oracle
    * rebuilds with chr()), then normalized back — n_chars_raw vs
    * n_chars_norm shows the delta. Pure map work.
    */
  def q70Normalize(s: SparkSession, dir: String): DataFrame = {
    val dirty = concat(col("text"),
      when(col("doc_id") % 4 === 0, lit("\t dirty tail \r\n")).otherwise(lit("")),
      when(col("doc_id") % 6 === 0, lit("  doubled  spaces  ")).otherwise(lit("")))
    Tables.documents(s, dir)
      .filter(col("text").isNotNull) // q59 null contract
      .select(col("doc_id"),
        length(dirty).as("n_chars_raw"),
        TextFunctions.normalizeWs(dirty).as("normalized"))
      .withColumn("n_chars_norm", length(col("normalized")))
  }

  /** Sequence packing — the "concat then chunk" step that turns curated
    * docs into fixed-length training sequences: per language, docs in
    * doc_id order are laid end to end and seq_id = which 2048-token
    * sequence each doc STARTS in (cum_before div 2048; boundary docs
    * straddle, the standard packing semantics). The q61/q66 stratum
    * caveat applies: one task orders one language — at a 100 TB stratum,
    * range-partition by the cumulative sum first (the sort stays global
    * per stratum by construction; same exact window on each range).
    */
  def q71SequencePack(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .filter(col("text").isNotNull) // q59 null contract
      .select(col("doc_id"), col("lang"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens").cast("long")).over(w), lit(0L)))
      // integral div, not `/` (long / int is DOUBLE division in Spark)
      .withColumn("seq_id", expr("cum_before div 2048"))
  }

  /** q219: substring-level exact dedup (Lee et al. 2022) — the maximal
    * repeated token spans [[graft.operators.Dedup.substringSpans]] detects
    * via positional-8-gram anchoring. The oracle replays the identical
    * posting algebra on gram STRINGS (hash vs string keyed — the q64
    * hash-set==string-set contract, here gating positions and span
    * extents, not just counts). The documents fixture repeats full texts
    * across doc_ids, so the spans are whole-document here; the planted
    * partial-overlap case lives in DedupSpec.
    */
  def q219SubstringDedup(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.substringSpans(Tables.documents(s, dir), k = 8)

  /** q221: the substring-dedup family APPLIED — every q219 span excised
    * from its document, all occurrences removed (the Lee et al. tool's
    * default; see [[graft.operators.Dedup.applySpanRemovals]]). Gated on
    * the rebuilt TEXT itself (byte equality), so the oracle proves span
    * detection AND token-exact reassembly in one statement; docs the
    * fixture repeats verbatim collapse to empty cleaned text with
    * n_kept = 0, which both engines must agree on.
    */
  def q221SubstringScrub(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    graft.operators.Dedup.applySpanRemovals(
        docs, graft.operators.Dedup.substringSpans(docs, k = 8))
      // bench honesty, not semantics: under a bare count() Spark's
      // distinct-key propagation (the grouped spans side is unique on
      // doc_id) ELIMINATES the left join and with it the whole scrub —
      // 0.12 s "scrubs" that scrubbed nothing. The always-true guard
      // references a scrub-derived column, pinning the real work into
      // any consumer's plan. (Verify's parquet write never pruned it.)
      .filter(col("n_removed") >= 0L)
  }

  /** q222: the keep-one-copy substring scrub — the corpus-FIRST
    * occurrence of a repeated span keeps its text, later copies are
    * excised ([[graft.operators.Dedup.substringSpansKeepFirst]]).
    * Against q221's remove-every-copy: the fixture's verbatim duplicate
    * documents stay intact under their lowest doc_id and empty elsewhere.
    */
  def q222SubstringKeepFirst(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    graft.operators.Dedup.applySpanRemovals(
        docs, graft.operators.Dedup.substringSpansKeepFirst(docs, k = 8))
      .filter(col("n_removed") >= 0L) // q221's count-pruning honesty guard
  }

  /** q225: substring-contamination screen at admission time — each NEW
    * batch document's k-gram overlap with the existing corpus
    * ([[graft.operators.Dedup.substrContamination]]): the signal that
    * catches a fresh document QUOTING corpus text, which whole-doc
    * (q67) and near-dup (q96/q103) admission both pass. Same
    * new-vs-corpus split as the admission family (NewBatchSources);
    * contam_ppm is integer, so the gate is exact.
    */
  def q225SubstrContam(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val isNew = col("source").isin(NewBatchSources: _*)
    graft.operators.Dedup.substrContamination(
      docs.filter(isNew),
      graft.operators.Dedup.gramIndexFrame(docs.filter(!isNew), k = 8),
      k = 8)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q225_substr_contam"   -> (q225SubstrContam _),
    "q219_substring_dedup" -> (q219SubstringDedup _),
    "q221_substring_scrub" -> (q221SubstringScrub _),
    "q222_substring_keepfirst" -> (q222SubstringKeepFirst _),
    "q71_sequence_pack"   -> (q71SequencePack _),
    "q70_normalize"       -> (q70Normalize _),
    "q68_profile"         -> (q68Profile _),
    "q69_histogram"       -> (q69Histogram _),
    "q62_pii_redact"      -> (q62PiiRedact _),
    "q63_url_blocklist"   -> (q63UrlBlocklist _),
    "q64_dup_gram_ratio"  -> (q64DupGramRatio _),
    "q65_range_join"      -> (q65RangeJoin _),
    "q66_quantile_filter" -> (q66QuantileFilter _),
    "q67_incremental_admit" -> (q67IncrementalAdmit _))

  /** Shared CTE planting the synthetic PII — must mirror
    * Privacy.withSyntheticPii verbatim. (Concatenation operators sit at
    * line ENDS: this string is re-interpolated into a stripMargin literal,
    * which would eat a line-leading `||` as a margin `|`.)
    */
  private val piiInjectCte: String =
    """inj AS (
      |  SELECT doc_id,
      |    text ||
      |    CASE WHEN doc_id % 5 = 0
      |         THEN ' contact user' || doc_id::VARCHAR || '@example.com for details'
      |         ELSE '' END ||
      |    CASE WHEN doc_id % 7 = 0
      |         THEN ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' now'
      |         ELSE '' END ||
      |    CASE WHEN doc_id % 11 = 0
      |         THEN ' from 10.' || (doc_id % 256)::VARCHAR || '.0.' || ((doc_id * 7) % 256)::VARCHAR
      |         ELSE '' END
      |    AS t2
      |  FROM documents WHERE text IS NOT NULL)""".stripMargin

  val oracles: Map[String, String] = Map(
    // SUM(int) widens to HUGEINT in DuckDB -> cast back to BIGINT; // is
    // DuckDB's integral floor division, matching Spark's `div` on the
    // non-negative cumulative sum
    "q71_sequence_pack" ->
      """SELECT doc_id, lang, n_tokens, cum_before, cum_before // 2048 AS seq_id
        |FROM (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |    CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER (
        |      PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_before
        |  FROM documents WHERE text IS NOT NULL) t""".stripMargin,
    // planted dirt rebuilt with chr(): 9=TAB, 13=CR, 10=LF; normalization
    // is C0 -> space, collapse space runs, trim — same explicit ASCII
    // classes on both regex engines
    "q70_normalize" ->
      """WITH dirty AS (
        |  SELECT doc_id,
        |    text ||
        |    CASE WHEN doc_id % 4 = 0
        |         THEN chr(9) || ' dirty tail ' || chr(13) || chr(10)
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 6 = 0 THEN '  doubled  spaces  ' ELSE '' END AS t2
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id,
        |  CAST(LENGTH(t2) AS INTEGER) AS n_chars_raw,
        |  trim(regexp_replace(regexp_replace(t2, '[\x00-\x1F]', ' ', 'g'),
        |       '  +', ' ', 'g')) AS normalized,
        |  CAST(LENGTH(trim(regexp_replace(regexp_replace(t2, '[\x00-\x1F]', ' ', 'g'),
        |       '  +', ' ', 'g'))) AS INTEGER) AS n_chars_norm
        |FROM dirty""".stripMargin,
    "q68_profile" -> Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(c =>
        s"""SELECT '$c' AS col_name, COUNT($c) AS n_non_null,
           |  COUNT(*) - COUNT($c) AS n_nulls,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  CAST(MIN($c) AS DOUBLE) AS min_val,
           |  CAST(MAX($c) AS DOUBLE) AS max_val
           |FROM lineitem""".stripMargin)
      .mkString("\nUNION ALL\n"),
    // bucket arithmetic is identical IEEE on both engines: x/50000.0,
    // floor, clamp to [0, 9]; bucket_lo = bucket * width
    "q69_histogram" ->
      """SELECT bucket, n, min_val, max_val, 0.0 + bucket * 50000.0 AS bucket_lo
        |FROM (
        |  SELECT CAST(LEAST(GREATEST(FLOOR(o_totalprice / 50000.0), 0), 9) AS BIGINT)
        |      AS bucket,
        |    COUNT(*) AS n,
        |    CAST(MIN(o_totalprice) AS DOUBLE) AS min_val,
        |    CAST(MAX(o_totalprice) AS DOUBLE) AS max_val
        |  FROM orders WHERE o_totalprice IS NOT NULL AND NOT isnan(o_totalprice)
        |  GROUP BY 1) t""".stripMargin,
    "q62_pii_redact" ->
      s"""WITH $piiInjectCte
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t2, '${Privacy.EmailPattern}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(t2, '${Privacy.PhonePattern}')) AS INTEGER) AS n_phones,
        |  CAST(len(regexp_extract_all(t2, '${Privacy.Ipv4Pattern}')) AS INTEGER) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(t2,
        |    '${Privacy.EmailPattern}', '<EMAIL>', 'g'),
        |    '${Privacy.PhonePattern}', '<PHONE>', 'g'),
        |    '${Privacy.Ipv4Pattern}', '<IP>', 'g') AS redacted
        |FROM inj""".stripMargin,
    "q63_url_blocklist" ->
      s"""WITH inj AS (
        |  SELECT doc_id,
        |    text || CASE WHEN doc_id % 3 = 0
        |        THEN ' see https://www.site' || (doc_id % 10)::VARCHAR
        |             || '.example.com/page' || doc_id::VARCHAR || ' ok'
        |      WHEN doc_id % 3 = 1
        |        THEN ' see http://blog' || (doc_id % 10)::VARCHAR || '.test.org/a ok'
        |      ELSE '' END AS t2
        |  FROM documents WHERE text IS NOT NULL),
        |h AS (SELECT doc_id, regexp_extract(t2, '${Privacy.UrlHostPattern}', 1) AS domain
        |      FROM inj)
        |SELECT doc_id, domain,
        |  domain IN (${BlockedHosts.map(h => s"'$h'").mkString(", ")}) AS blocked
        |FROM h WHERE domain <> ''""".stripMargin,
    // same string-trigram formulation as q38/q56/q57 (shared
    // trigramListSql); df counts DOCUMENTS per gram because the unnest is
    // over the per-doc DISTINCT gram list
    // same positional algebra as the Spark side, keyed on gram STRINGS
    // (the engine side keys on xxhash64 of the same string — collisions
    // would only widen a span, and the compare is exact)
    "q219_substring_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id, CAST(r.i AS BIGINT) AS pos,
        |        array_to_string(toks[r.i : r.i + 7], ' ') AS gram
        |      FROM t, unnest(generate_series(1, len(toks) - 7, 1)) AS r(i)),
        |c AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
        |a AS (SELECT doc_id, pos FROM g JOIN c USING (gram)),
        |w AS (SELECT doc_id, pos,
        |        CASE WHEN pos > LAG(pos) OVER
        |          (PARTITION BY doc_id ORDER BY pos) + 8
        |        THEN 1 ELSE 0 END AS brk
        |      FROM a),
        |isl AS (SELECT doc_id, pos,
        |          SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS island
        |        FROM w)
        |SELECT doc_id, MIN(pos) AS span_start,
        |  MAX(pos) - MIN(pos) + 8 AS span_len,
        |  COUNT(*) AS n_anchors
        |FROM isl GROUP BY doc_id, island""".stripMargin,
    // gram-string replay of the hash-keyed screen (the q64 contract);
    // contam_ppm integral on both engines
    "q225_substr_contam" -> {
      val inList = NewBatchSources.map(x => s"'$x'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |cg AS (SELECT DISTINCT array_to_string(toks[r.i : r.i + 7], ' ') AS gram
        |       FROM t, unnest(generate_series(1, len(toks) - 7, 1)) AS r(i)
        |       WHERE source NOT IN ($inList)),
        |ng AS (SELECT doc_id, array_to_string(toks[r.i : r.i + 7], ' ') AS gram
        |       FROM t, unnest(generate_series(1, len(toks) - 7, 1)) AS r(i)
        |       WHERE source IN ($inList))
        |SELECT ng.doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN cg.gram IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hit,
        |  (CAST(SUM(CASE WHEN cg.gram IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000) // COUNT(*) AS contam_ppm
        |FROM ng LEFT JOIN cg USING (gram)
        |GROUP BY ng.doc_id""".stripMargin
    },
    // q219's span algebra + token-exact reassembly: string_agg skips the
    // covered tokens (CASE -> NULL), ORDER BY pos restores document
    // order, COALESCE('') keeps fully-scrubbed docs as empty strings —
    // matching Spark's array_join over the filtered array.
    "q221_substring_scrub" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id, CAST(r.i AS BIGINT) AS pos,
        |        array_to_string(toks[r.i : r.i + 7], ' ') AS gram
        |      FROM t, unnest(generate_series(1, len(toks) - 7, 1)) AS r(i)),
        |c AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
        |a AS (SELECT doc_id, pos FROM g JOIN c USING (gram)),
        |w AS (SELECT doc_id, pos,
        |        CASE WHEN pos > LAG(pos) OVER
        |          (PARTITION BY doc_id ORDER BY pos) + 8
        |        THEN 1 ELSE 0 END AS brk
        |      FROM a),
        |isl AS (SELECT doc_id, pos,
        |          SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS island
        |        FROM w),
        |sp AS (SELECT doc_id, MIN(pos) AS span_start,
        |         MAX(pos) - MIN(pos) + 8 AS span_len
        |       FROM isl GROUP BY doc_id, island),
        |tok AS (SELECT t.doc_id, CAST(r.i AS BIGINT) AS pos, toks[r.i] AS tok
        |        FROM t, unnest(generate_series(1, len(toks), 1)) AS r(i)),
        |mark AS (SELECT k.doc_id, k.pos, k.tok,
        |           EXISTS (SELECT 1 FROM sp
        |                   WHERE sp.doc_id = k.doc_id
        |                     AND k.pos >= sp.span_start
        |                     AND k.pos < sp.span_start + sp.span_len) AS cov
        |         FROM tok k)
        |SELECT doc_id,
        |  COALESCE(string_agg(CASE WHEN NOT cov THEN tok END, ' '
        |    ORDER BY pos), '') AS cleaned,
        |  CAST(COALESCE(SUM(CASE WHEN NOT cov THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_kept,
        |  CAST(COALESCE(SUM(CASE WHEN cov THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_removed
        |FROM mark GROUP BY doc_id""".stripMargin,
    // q221's algebra with the canonical-occurrence election: rn=1 over
    // (gram ORDER BY doc_id, pos) is Spark's min(struct(doc_id, pos))
    "q222_substring_keepfirst" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id, CAST(r.i AS BIGINT) AS pos,
        |        array_to_string(toks[r.i : r.i + 7], ' ') AS gram
        |      FROM t, unnest(generate_series(1, len(toks) - 7, 1)) AS r(i)),
        |a AS (SELECT doc_id, pos FROM (
        |        SELECT doc_id, pos,
        |          COUNT(*) OVER (PARTITION BY gram) AS cnt,
        |          ROW_NUMBER() OVER (PARTITION BY gram
        |            ORDER BY doc_id, pos) AS rn
        |        FROM g) z WHERE cnt >= 2 AND rn > 1),
        |w AS (SELECT doc_id, pos,
        |        CASE WHEN pos > LAG(pos) OVER
        |          (PARTITION BY doc_id ORDER BY pos) + 8
        |        THEN 1 ELSE 0 END AS brk
        |      FROM a),
        |isl AS (SELECT doc_id, pos,
        |          SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS island
        |        FROM w),
        |sp AS (SELECT doc_id, MIN(pos) AS span_start,
        |         MAX(pos) - MIN(pos) + 8 AS span_len
        |       FROM isl GROUP BY doc_id, island),
        |tok AS (SELECT t.doc_id, CAST(r.i AS BIGINT) AS pos, toks[r.i] AS tok
        |        FROM t, unnest(generate_series(1, len(toks), 1)) AS r(i)),
        |mark AS (SELECT k.doc_id, k.pos, k.tok,
        |           EXISTS (SELECT 1 FROM sp
        |                   WHERE sp.doc_id = k.doc_id
        |                     AND k.pos >= sp.span_start
        |                     AND k.pos < sp.span_start + sp.span_len) AS cov
        |         FROM tok k)
        |SELECT doc_id,
        |  COALESCE(string_agg(CASE WHEN NOT cov THEN tok END, ' '
        |    ORDER BY pos), '') AS cleaned,
        |  CAST(COALESCE(SUM(CASE WHEN NOT cov THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_kept,
        |  CAST(COALESCE(SUM(CASE WHEN cov THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_removed
        |FROM mark GROUP BY doc_id""".stripMargin,
    "q64_dup_gram_ratio" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
        |g AS (SELECT doc_id, unnest(${Extensions.trigramListSql("sp")}) AS h
        |  FROM t),
        |d AS (SELECT h, COUNT(*) AS df FROM g GROUP BY h)
        |SELECT doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
        |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_ratio
        |FROM g JOIN d USING (h)
        |GROUP BY doc_id""".stripMargin,
    // the range join must equal the plain inequality join — the oracle IS
    // the unbinned formulation (epoch_us matches unix_micros integrally)
    "q65_range_join" ->
      """SELECT c.event_id, c.user_id, COUNT(p.event_id) AS n_prior_purchases
        |FROM events c LEFT JOIN events p
        |  ON p.user_id = c.user_id AND p.event_type = 'purchase'
        |  AND epoch_us(p.ts) >= epoch_us(c.ts) - 7200000000
        |  AND epoch_us(p.ts) < epoch_us(c.ts)
        |WHERE c.event_type = 'click'
        |GROUP BY c.event_id, c.user_id""".stripMargin,
    // the band join is lossless at Hamming <= 3 (pigeonhole over 4 bands),
    // so the all-pairs SQL below is EXACTLY the operator's candidate+verify
    // output; near-dup counts include exact dups (Hamming 0), same as the
    // engine. Note n JOIN c is new-vs-corpus only — never corpus²
    "q67_incremental_admit" -> {
      val inList = NewBatchSources.map(x => s"'$x'").mkString(", ")
      s"""WITH ${Extensions.simhashFpCtes},
        |base AS (
        |  SELECT d.doc_id, d.source, md5(d.text) AS xfp, f.fp
        |  FROM documents d JOIN fps f USING (doc_id)
        |  WHERE d.text IS NOT NULL),
        |n AS (SELECT * FROM base WHERE source IN ($inList)),
        |c AS (SELECT * FROM base WHERE source NOT IN ($inList)),
        |ex AS (SELECT DISTINCT n.doc_id FROM n JOIN c ON n.xfp = c.xfp),
        |nd AS (SELECT n.doc_id, COUNT(*) AS n_neardup
        |       FROM n JOIN c ON bit_count(xor(n.fp, c.fp)) <= 3
        |       GROUP BY n.doc_id)
        |SELECT b.doc_id,
        |  ex.doc_id IS NOT NULL AS exact_dup,
        |  CAST(COALESCE(nd.n_neardup, 0) AS BIGINT) AS n_neardup,
        |  ex.doc_id IS NULL AND COALESCE(nd.n_neardup, 0) = 0 AS admitted
        |FROM n b
        |LEFT JOIN ex ON b.doc_id = ex.doc_id
        |LEFT JOIN nd ON b.doc_id = nd.doc_id""".stripMargin
    },
    "q66_quantile_filter" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang, ${Extensions.qualitySqlExpr} AS quality
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, lang, quality,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY quality DESC, doc_id) AS INTEGER) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM t)
        |SELECT doc_id, lang, quality, rn
        |FROM w WHERE rn * 4 <= n + 3""".stripMargin)
}
