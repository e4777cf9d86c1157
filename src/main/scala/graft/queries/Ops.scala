package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Corpus-operations queries: the day-2 audits a team running a 100 TB
  * training corpus needs BETWEEN pipeline runs — what changed since the
  * last snapshot, where to put the near-dup threshold, and whether the
  * declared language labels can be trusted. Reference behavioral analog:
  * the dashboard's between-run summary reads (/root/reference/app.py:231,
  * 373); the operators themselves are beyond-reference extension tier.
  */
object Ops {

  /** Key offset used to synthesize "other snapshot" rows (q112's retired
    * ids, q121's inserts) outside the real id range.
    */
  private[queries] val SyntheticIdOffset = 10000000L

  /** Guard the synthetic-key fixtures: if the corpus's own ids ever reach
    * [[SyntheticIdOffset]], the offset rows would alias onto real docs and
    * silently corrupt the diff/CDC results — fail loudly instead. The
    * max() is an eager single-column scan (Spark's v1 parquet reader does
    * NOT push aggregates to footer stats), so when `cacheKey` names the
    * fixture dir the verdict is memoized per session — one scan per dir,
    * not one per query construction (Bench constructs each query 4×).
    */
  private val checkedDomains =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private[queries] def requireKeyDomain(docs: DataFrame,
                                        cacheKey: String = ""): DataFrame = {
    def check(): java.lang.Boolean = {
      val mx = docs.agg(max("doc_id")).head()
      require(mx.isNullAt(0) || mx.getLong(0) < SyntheticIdOffset,
        s"documents doc_id domain [..${if (mx.isNullAt(0)) "∅" else mx.getLong(0)}] " +
          s"collides with the synthetic snapshot offset $SyntheticIdOffset; " +
          "raise the offset above max(doc_id) before using the CDC fixtures")
      java.lang.Boolean.TRUE
    }
    if (cacheKey.isEmpty) check()
    else checkedDomains.computeIfAbsent(cacheKey, _ => check())
    docs
  }

  /** The "previous" corpus snapshot, derived deterministically from the
    * current documents table so every engine (and every scale factor)
    * reconstructs the identical frame with no extra fixture:
    *   - docs with doc_id % 11 == 0 are absent from the old snapshot
    *     (they read as ADDED in the new one);
    *   - docs with doc_id % 7 == 3 carry a ' v0' text suffix in the old
    *     snapshot (they read as CHANGED);
    *   - for every doc_id % 13 == 0 the old snapshot holds an extra row
    *     at doc_id + 10_000_000 (absent from the new one → REMOVED).
    */
  private[queries] def oldSnapshot(s: SparkSession, dir: String): DataFrame = {
    val docs = requireKeyDomain(Tables.documents(s, dir), cacheKey = dir)
    val kept = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 3, concat(col("text"), lit(" v0")))
          .otherwise(col("text")).as("text"),
        col("source"))
    val retired = docs.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + SyntheticIdOffset).as("doc_id"), col("text"),
        col("source"))
    kept.unionByName(retired)
  }

  /** q112: snapshot diff audit — classify every doc_id across two corpus
    * snapshots as added / removed / changed / unchanged by content hash,
    * rolled up per source. The change-data-capture read a corpus operator
    * does before promoting a new crawl: "what did this run actually do?".
    *
    * Scale shape: one full-outer shuffle join on doc_id (the natural
    * key — co-partitioned if both snapshots are bucketed by doc_id, see
    * Sinks.parquetBucketed) carrying only (doc_id, md5, source); text
    * never survives the projection, so the shuffle payload is ~50 bytes
    * per doc regardless of document size. The rollup is a bounded
    * (source × 4-status) hash-agg.
    */
  def q112SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val oldS = oldSnapshot(s, dir)
      .select(col("doc_id"), md5(coalesce(col("text"), lit(""))).as("h_old"),
        col("source").as("src_old"))
    val newS = Tables.documents(s, dir)
      .select(col("doc_id"), md5(coalesce(col("text"), lit(""))).as("h_new"),
        col("source").as("src_new"))
    oldS.join(newS, Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("src_new"), col("src_old")).as("source"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("source", "status")
      .agg(count(lit(1)).as("n_docs"))
  }

  /** q113: near-dup threshold sweep — the Jaccard histogram (0.05 bins,
    * floor-of-20ths) over all blocked candidate pairs scoring >= 0.5, the
    * curve a curation team reads before FIXING the dedup threshold: a
    * bimodal histogram separates true dupes from soup, and the valley is
    * where the threshold goes. One extra aggregation over q24's existing
    * blocked-pair generation (same O(block²) contract and codegen
    * merge-walk kernel); the output is at most 10 bin rows, so everything
    * after the pair scan is free.
    */
  def q113ThresholdSweep(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(s, dir), threshold = 0.5)
      .withColumn("bin_lo", floor(col("jaccard") * 20) / 20)
      .groupBy("bin_lo")
      .agg(count(lit(1)).as("n_pairs"),
        min("jaccard").as("min_j"), max("jaccard").as("max_j"))

  /** q114: declared-vs-detected language confusion matrix — q22's marker
    * detector (functions.TextFunctions.langId) cross-tabulated against
    * the corpus's own `lang` column. Off-diagonal mass is either
    * mislabeled ingest or detector drift; a curation team reads this
    * before trusting per-language mixture weights (q88) or per-language
    * quality fences. Map-side codegen kernel + one bounded
    * (|langs|² cells) hash-agg — no join, no shuffle beyond the final
    * tiny aggregation.
    */
  def q114LangMismatch(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), TextFunctions.langId(col("text")).as("lang_pred"))
      .groupBy("lang", "lang_pred")
      .agg(count(lit(1)).as("n_docs"))

  /** q121: MERGE/CDC apply (operators.Upsert.applyChanges) — the snapshot
    * maintenance between q112's diffs: a deterministic change batch
    * (updates for doc_id%10==3, deletes for %10==7, inserts keyed past
    * the id range for %10==1) lands on the documents snapshot in ONE
    * full-outer key join. The update rows carry NULL source — the
    * partial-update contract (NULL change column keeps the snapshot's
    * value). Output fingerprints text (md5) so the full merged corpus
    * stays hash-comparable without shipping megabytes of text.
    */
  def q121MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val snap = requireKeyDomain(Tables.documents(s, dir), cacheKey = dir)
      .select("doc_id", "source", "text")
    val withText = snap.filter(col("text").isNotNull)
    val changes = withText.filter(col("doc_id") % 10 === 3)
      .select(col("doc_id"), lit(null).cast("string").as("source"),
        concat(col("text"), lit(" v2")).as("text"), lit("U").as("op"))
      .unionByName(snap.filter(col("doc_id") % 10 === 7)
        .select(col("doc_id"), lit(null).cast("string").as("source"),
          lit(null).cast("string").as("text"), lit("D").as("op")))
      .unionByName(withText.filter(col("doc_id") % 10 === 1)
        .select((col("doc_id") + SyntheticIdOffset).as("doc_id"), col("source"),
          lit("fresh insert").as("text"), lit("I").as("op")))
    graft.operators.Upsert.applyChanges(snap, changes, key = "doc_id")
      .select(col("doc_id"), col("source"),
        md5(coalesce(col("text"), lit(""))).as("fp"))
  }

  /** Deterministic multi-op CDC log over the documents snapshot — the
    * fixture q122/q123 share. Seqs are unique per key; the mod ladder
    * nests so every D/I/U interplay appears:
    *   seq 1  U  %4==1   text overlay ' e1', source untouched (NULL)
    *   seq 2  D  %8==5   (⊂ %4==1: U-then-D — the overlay must die)
    *   seq 3  I  %16==13 (⊂ %8==5: D-then-I rebirth — replace semantics)
    *   seq 4  U  %32==29 (⊂ %16==13: I-then-U overlay on the reborn row)
    *   seq 5  U  %4==1 ∧ %8≠5: source:='s2', text NULL — column-wise
    *          fold with seq 1 (text from 1, source from 5)
    */
  private def changeLog(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .filter(col("text").isNotNull)
      .select("doc_id", "source", "text")
    val nullS = lit(null).cast("string")
    def batch(pred: org.apache.spark.sql.Column, seq: Int, op: String,
              src: org.apache.spark.sql.Column,
              txt: org.apache.spark.sql.Column): DataFrame =
      d.filter(pred).select(col("doc_id"), src.as("source"), txt.as("text"),
        lit(seq).cast("long").as("seq"), lit(op).as("op"))
    batch(col("doc_id") % 4 === 1, 1, "U", nullS,
        concat(col("text"), lit(" e1")))
      .unionByName(batch(col("doc_id") % 8 === 5, 2, "D", nullS, nullS))
      .unionByName(batch(col("doc_id") % 16 === 13, 3, "I",
        lit("sys"), lit("reborn")))
      .unionByName(batch(col("doc_id") % 32 === 29, 4, "U", nullS,
        lit("reborn e4")))
      .unionByName(batch(col("doc_id") % 4 === 1 && col("doc_id") % 8 =!= 5,
        5, "U", lit("s2"), nullS))
  }

  /** q122: CDC log compaction + merge (operators.Upsert.compactChanges →
    * applyChanges) — five seq-ordered op batches collapse to ONE change
    * row per key in a single window-free hash aggregation, then land on
    * the snapshot in one full-outer join. The mod-ladder fixture makes
    * every compaction rule observable in the output hash: U-then-D keys
    * vanish, D-then-I keys are reborn WITHOUT their old source (replace,
    * not coalesce), I-then-U keys carry the overlay, U+U keys fold
    * column-wise. Two shuffles total on the same key at any corpus size.
    */
  def q122CdcCompact(s: SparkSession, dir: String): DataFrame = {
    val snap = Tables.documents(s, dir).select("doc_id", "source", "text")
    val compact = graft.operators.Upsert
      .compactChanges(changeLog(s, dir), key = "doc_id", seqCol = "seq")
    graft.operators.Upsert.applyChanges(snap, compact, key = "doc_id")
      .select(col("doc_id"), col("source"),
        md5(coalesce(col("text"), lit(""))).as("fp"))
  }

  /** q123: SCD Type-2 dimension history (operators.Upsert.scd2History)
    * over the same log — every surviving op becomes a version row with
    * [valid_from, valid_to) bounds, carry-forward of partial-update
    * columns within its epoch, and an is_current flag. Per-key windows
    * only (bounded by ops-per-key, the q89/q90 contract); text is
    * fingerprinted so the history of a TB-scale corpus hashes in bytes.
    */
  def q123Scd2(s: SparkSession, dir: String): DataFrame =
    graft.operators.Upsert
      .scd2History(changeLog(s, dir), key = "doc_id", seqCol = "seq")
      .select(col("doc_id"), col("valid_from"), col("valid_to"),
        col("is_current"), col("source"),
        md5(coalesce(col("text"), lit(""))).as("fp"))

  /** q125: point-in-time join (operators.Upsert.pointInTime) — every
    * doc_id probed at two instants of the q123 history's seq axis: ts=2
    * (mid-log, after the deletes landed but before the rebirths) and
    * ts=10 (after everything). Each probe gets the version row covering
    * its instant or NULLs — including the deleted-interval gap at ts=2
    * that a plain as-of join would wrongly bridge. One union+sort pass
    * (AsOfJoin's carry-forward), never an inequality join.
    */
  def q125PointInTime(s: SparkSession, dir: String): DataFrame = {
    val hist = graft.operators.Upsert
      .scd2History(changeLog(s, dir), key = "doc_id", seqCol = "seq")
      .select("doc_id", "valid_from", "valid_to", "source", "text")
    val keys = Tables.documents(s, dir).select("doc_id")
    val probe = keys.select(col("doc_id"), lit(2L).as("ts"))
      .unionByName(keys.select(col("doc_id"), lit(10L).as("ts")))
    graft.operators.Upsert.pointInTime(probe, hist, "doc_id", "ts")
      .select(col("doc_id"), col("ts"),
        col("asof_source").as("source"),
        md5(coalesce(col("asof_text"), lit(""))).as("fp"),
        col("asof_valid_from").as("version_from"))
  }

  /** q130: time-travel diff — q112's snapshot audit replayed between two
    * INSTANTS of the q123 history instead of two materialized snapshots:
    * reconstruct per-key state at ts=1 and ts=10 via two point-in-time
    * masks over the SAME history frame (one scd2 build, reused), then
    * classify added/removed/changed/unchanged per source. The op a CDC
    * consumer runs when asked "what changed between yesterday's and
    * today's corpus" WITHOUT having kept either snapshot. Keys absent
    * from the log at an instant are simply absent that side (the log is
    * the universe here — this diffs history states, not the snapshot).
    */
  def q130TimeTravelDiff(s: SparkSession, dir: String): DataFrame = {
    val hist = graft.operators.Upsert
      .scd2History(changeLog(s, dir), key = "doc_id", seqCol = "seq")
      .select("doc_id", "valid_from", "valid_to", "source", "text")
    def stateAt(ts: Long) = hist
      .filter(col("valid_from") <= ts &&
        (col("valid_to").isNull || lit(ts) < col("valid_to")))
      .select(col("doc_id"), col("source"),
        md5(coalesce(col("text"), lit(""))).as("h"))
    stateAt(1L).select(col("doc_id"), col("source").as("src_old"),
        col("h").as("h_old"))
      .join(stateAt(10L).select(col("doc_id"), col("source").as("src_new"),
        col("h").as("h_new")), Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("src_new"), col("src_old")).as("source"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("source", "status")
      .agg(count(lit(1)).as("n_docs"))
  }

  /** q133: the CDC-family composed chain — q99's wiring-level verification
    * applied to the Upsert operators. Four individually-gated stages run
    * END TO END, each load-bearing in the output:
    *
    *  1. ADMIT (Dedup.admitIncremental, q67's gate): the new-batch
    *     sources are screened against the corpus; only admitted docs
    *     (no exact or SimHash near-dup) proceed.
    *  2. APPLY (compactChanges → applyChanges, q122's gate): the admitted
    *     docs extend the q122 mod-ladder log as seq-6 inserts keyed past
    *     the id range, the log compacts to one change row per key, and
    *     lands on the snapshot in one full-outer key join.
    *  3. SCD2 (scd2History, q123's gate): the SAME extended log builds
    *     the version history.
    *  4. PIT (pointInTime, q125's gate): every merged row is probed at
    *     the log horizon (ts=10) and annotated with the valid_from of the
    *     covering version — "when did this key last change", NULL for
    *     keys the log never touched.
    *
    * A doc REJECTED at admission is absent from the output (its offset
    * key never inserts); a compaction or history bug shifts fp/source or
    * version_from — so the single hash gate covers the whole composition,
    * the cross-stage wiring no individual gate sees. Scale shape: the
    * admission screen's broadcast corpus-band join + two key-shuffle
    * joins (merge, PIT union) — each stage's individually-audited plan,
    * composed.
    */
  def q133CdcChain(s: SparkSession, dir: String): DataFrame = {
    val docs0 = requireKeyDomain(Tables.documents(s, dir), cacheKey = dir)
      .filter(col("text").isNotNull)
    val isNew = col("source").isin(Curation.NewBatchSources: _*)
    // stage 0: expectations gate on the ARRIVING batch only (round-13
    // verdict ask #8 — validate before admit; the corpus snapshot is
    // already-landed data and passes through). Map-only (gateRows); the
    // len_max rule is live on the fixture, and the oracle's new-batch CTE
    // carries the same predicates.
    val docs = graft.operators.Expectations.gateRows(docs0, Seq(
        graft.operators.Expectations.Expect("len_min_20",
          length(col("text")) >= 20),
        graft.operators.Expectations.Expect("len_max_520",
          length(col("text")) <= 520),
        graft.operators.Expectations.Expect("tokens_min_3",
          graft.functions.TextFunctions.tokenCount(col("text")) >= 3)))
      .filter(!isNew || col("admitted")).drop("violations", "admitted")
    val admitted = Dedup.admitIncremental(docs,
        isNew = isNew, maxHamming = 3)
      .filter(col("admitted")).select("doc_id")
    val inserts = docs.join(admitted, "doc_id")
      .select((col("doc_id") + SyntheticIdOffset).as("doc_id"), col("source"),
        col("text"), lit(6L).as("seq"), lit("I").as("op"))
    val log = changeLog(s, dir).unionByName(inserts)
    val snap = Tables.documents(s, dir).select("doc_id", "source", "text")
    val merged = graft.operators.Upsert.applyChanges(snap,
      graft.operators.Upsert.compactChanges(log, key = "doc_id", seqCol = "seq"),
      key = "doc_id")
    val hist = graft.operators.Upsert
      .scd2History(log, key = "doc_id", seqCol = "seq")
      .select("doc_id", "valid_from", "valid_to")
    val probe = merged
      .select(col("doc_id"), col("source"),
        md5(coalesce(col("text"), lit(""))).as("fp"))
      .withColumn("ts", lit(10L))
    graft.operators.Upsert.pointInTime(probe, hist, "doc_id", "ts")
      .select(col("doc_id"), col("source"), col("fp"),
        col("asof_valid_from").as("version_from"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q133_cdc_chain"      -> (q133CdcChain _),
    "q130_time_travel_diff" -> (q130TimeTravelDiff _),
    "q112_snapshot_diff"  -> (q112SnapshotDiff _),
    "q113_threshold_sweep" -> (q113ThresholdSweep _),
    "q114_lang_mismatch"  -> (q114LangMismatch _),
    "q121_merge_upsert"   -> (q121MergeUpsert _),
    "q122_cdc_compact"    -> (q122CdcCompact _),
    "q123_scd2_history"   -> (q123Scd2 _),
    "q125_point_in_time"  -> (q125PointInTime _))

  /** The changeLog fixture as a DuckDB CTE body (shared by q122/q123).
    * Seqs ≥ 1, so 0 serves as the -infinity sentinel in the boundary
    * algebra (the Spark side uses Long.MinValue — equivalent here).
    */
  private val changeLogSql: String =
    """d AS (SELECT doc_id, source, text FROM documents
      |       WHERE text IS NOT NULL),
      |log AS (
      |  SELECT doc_id, CAST(NULL AS VARCHAR) AS source,
      |    text || ' e1' AS text, CAST(1 AS BIGINT) AS seq, 'U' AS op
      |  FROM d WHERE doc_id % 4 = 1
      |  UNION ALL
      |  SELECT doc_id, NULL, NULL, CAST(2 AS BIGINT), 'D'
      |  FROM d WHERE doc_id % 8 = 5
      |  UNION ALL
      |  SELECT doc_id, 'sys', 'reborn', CAST(3 AS BIGINT), 'I'
      |  FROM d WHERE doc_id % 16 = 13
      |  UNION ALL
      |  SELECT doc_id, NULL, 'reborn e4', CAST(4 AS BIGINT), 'U'
      |  FROM d WHERE doc_id % 32 = 29
      |  UNION ALL
      |  SELECT doc_id, 's2', NULL, CAST(5 AS BIGINT), 'U'
      |  FROM d WHERE doc_id % 4 = 1 AND doc_id % 8 <> 5)""".stripMargin

  /** [[oldSnapshot]] as a DuckDB CTE (named `old_s`) — shared by the q112
    * oracle and the export-delta oracle (queries.Exports) so the synthetic
    * previous-snapshot arithmetic cannot drift between them.
    */
  private[queries] val oldSnapshotCte: String =
    """old_s AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 3 THEN text || ' v0' ELSE text END AS text,
      |    source
      |  FROM documents WHERE doc_id % 11 <> 0
      |  UNION ALL
      |  SELECT doc_id + 10000000 AS doc_id, text, source
      |  FROM documents WHERE doc_id % 13 = 0)""".stripMargin

  val oracles: Map[String, String] = Map(
    // the four gated stages composed: q67's admission CTEs feed seq-6
    // inserts into the q122/q123 log, whose compaction+merge and
    // history+PIT mask reproduce the engine's chain end to end
    "q133_cdc_chain" -> {
      val inList = Curation.NewBatchSources.map(x => s"'$x'").mkString(", ")
      s"""WITH ${Extensions.simhashFpCtes},
        |base AS (
        |  SELECT dd.doc_id, dd.source, md5(dd.text) AS xfp, f.fp,
        |    length(dd.text) AS tlen,
        |    len(string_split(dd.text, ' ')) AS ntok
        |  FROM documents dd JOIN fps f USING (doc_id)
        |  WHERE dd.text IS NOT NULL),
        |n AS (SELECT * FROM base WHERE source IN ($inList)
        |      AND tlen >= 20 AND tlen <= 520 AND ntok >= 3),
        |c AS (SELECT * FROM base WHERE source NOT IN ($inList)),
        |ex AS (SELECT DISTINCT n.doc_id FROM n JOIN c ON n.xfp = c.xfp),
        |nd AS (SELECT n.doc_id, COUNT(*) AS n_neardup
        |       FROM n JOIN c ON bit_count(xor(n.fp, c.fp)) <= 3
        |       GROUP BY n.doc_id),
        |adm AS (
        |  SELECT b.doc_id FROM n b
        |  LEFT JOIN ex ON b.doc_id = ex.doc_id
        |  LEFT JOIN nd ON b.doc_id = nd.doc_id
        |  WHERE ex.doc_id IS NULL AND COALESCE(nd.n_neardup, 0) = 0),
        |$changeLogSql,
        |log2 AS (
        |  SELECT * FROM log
        |  UNION ALL
        |  SELECT d.doc_id + 10000000, d.source, d.text,
        |    CAST(6 AS BIGINT), 'I'
        |  FROM d JOIN adm ON d.doc_id = adm.doc_id),
        |comp AS (
        |  SELECT doc_id,
        |    COALESCE(max(seq) FILTER (WHERE op = 'D'), 0) AS last_d,
        |    COALESCE(max(seq) FILTER (WHERE op = 'I'), 0) AS last_i,
        |    arg_max(op, seq) AS last_op,
        |    max(seq) FILTER (WHERE op = 'U' AND source IS NOT NULL)
        |      AS us_source,
        |    arg_max(source, seq)
        |      FILTER (WHERE op = 'U' AND source IS NOT NULL) AS uv_source,
        |    max(seq) FILTER (WHERE op = 'U' AND text IS NOT NULL) AS us_text,
        |    arg_max(text, seq)
        |      FILTER (WHERE op = 'U' AND text IS NOT NULL) AS uv_text,
        |    arg_max(source, seq) FILTER (WHERE op = 'I') AS iv_source,
        |    arg_max(text, seq) FILTER (WHERE op = 'I') AS iv_text
        |  FROM log2 GROUP BY doc_id),
        |c2 AS (
        |  SELECT doc_id,
        |    CASE WHEN us_source > GREATEST(last_d, last_i) THEN uv_source
        |         WHEN last_i > last_d THEN iv_source END AS source,
        |    CASE WHEN us_text > GREATEST(last_d, last_i) THEN uv_text
        |         WHEN last_i > last_d THEN iv_text END AS text,
        |    CASE WHEN last_op = 'D' THEN 'D'
        |         WHEN last_d > 0 OR last_i > 0 THEN 'I'
        |         ELSE 'U' END AS op
        |  FROM comp),
        |snap AS (SELECT doc_id, source, text FROM documents),
        |merged AS (
        |  SELECT COALESCE(s.doc_id, c.doc_id) AS doc_id,
        |    CASE WHEN c.op = 'I' THEN c.source
        |         ELSE COALESCE(c.source, s.source) END AS source,
        |    CASE WHEN c.op = 'I' THEN c.text
        |         ELSE COALESCE(c.text, s.text) END AS text
        |  FROM snap s FULL OUTER JOIN c2 c ON s.doc_id = c.doc_id
        |  WHERE COALESCE(c.op, '') <> 'D'),
        |hist AS (
        |  SELECT doc_id, seq, op,
        |    LEAD(seq) OVER (PARTITION BY doc_id ORDER BY seq) AS valid_to
        |  FROM log2),
        |versions AS (
        |  SELECT doc_id, seq AS valid_from, valid_to
        |  FROM hist WHERE op <> 'D')
        |SELECT m.doc_id, m.source, md5(COALESCE(m.text, '')) AS fp,
        |  h.valid_from AS version_from
        |FROM merged m LEFT JOIN versions h
        |  ON m.doc_id = h.doc_id AND h.valid_from <= 10
        |  AND (h.valid_to IS NULL OR 10 < h.valid_to)""".stripMargin
    },
    // q123's version CTEs + two interval masks + q112's classification
    "q130_time_travel_diff" ->
      s"""WITH $changeLogSql,
        |hist AS (
        |  SELECT doc_id, seq, op, source, text,
        |    SUM(CASE WHEN op IN ('D','I') THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY seq) AS epoch,
        |    LEAD(seq) OVER (PARTITION BY doc_id ORDER BY seq) AS valid_to
        |  FROM log),
        |filled AS (
        |  SELECT doc_id, seq AS valid_from, valid_to, op,
        |    LAST_VALUE(source IGNORE NULLS)
        |      OVER (PARTITION BY doc_id, epoch ORDER BY seq
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS source,
        |    LAST_VALUE(text IGNORE NULLS)
        |      OVER (PARTITION BY doc_id, epoch ORDER BY seq
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS text
        |  FROM hist),
        |versions AS (SELECT * FROM filled WHERE op <> 'D'),
        |o AS (SELECT doc_id, source AS src_old, md5(COALESCE(text, '')) AS h_old
        |      FROM versions
        |      WHERE valid_from <= 1 AND (valid_to IS NULL OR 1 < valid_to)),
        |n AS (SELECT doc_id, source AS src_new, md5(COALESCE(text, '')) AS h_new
        |      FROM versions
        |      WHERE valid_from <= 10 AND (valid_to IS NULL OR 10 < valid_to))
        |SELECT COALESCE(src_new, src_old) AS source,
        |  CASE WHEN h_old IS NULL THEN 'added'
        |       WHEN h_new IS NULL THEN 'removed'
        |       WHEN h_old <> h_new THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  COUNT(*) AS n_docs
        |FROM o FULL OUTER JOIN n USING (doc_id)
        |GROUP BY 1, 2""".stripMargin,
    // the honest interval join: DuckDB probes every (key, ts) against the
    // covering [valid_from, valid_to) version directly
    "q125_point_in_time" ->
      s"""WITH $changeLogSql,
        |hist AS (
        |  SELECT doc_id, seq, op, source, text,
        |    SUM(CASE WHEN op IN ('D','I') THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY seq) AS epoch,
        |    LEAD(seq) OVER (PARTITION BY doc_id ORDER BY seq) AS valid_to
        |  FROM log),
        |filled AS (
        |  SELECT doc_id, seq AS valid_from, valid_to, op,
        |    LAST_VALUE(source IGNORE NULLS)
        |      OVER (PARTITION BY doc_id, epoch ORDER BY seq
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS source,
        |    LAST_VALUE(text IGNORE NULLS)
        |      OVER (PARTITION BY doc_id, epoch ORDER BY seq
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS text
        |  FROM hist),
        |versions AS (SELECT * FROM filled WHERE op <> 'D'),
        |probes AS (
        |  SELECT doc_id, CAST(2 AS BIGINT) AS ts FROM documents
        |  UNION ALL
        |  SELECT doc_id, CAST(10 AS BIGINT) FROM documents)
        |SELECT p.doc_id, p.ts, h.source,
        |  md5(COALESCE(h.text, '')) AS fp,
        |  h.valid_from AS version_from
        |FROM probes p LEFT JOIN versions h
        |  ON p.doc_id = h.doc_id AND h.valid_from <= p.ts
        |  AND (h.valid_to IS NULL OR p.ts < h.valid_to)""".stripMargin,
    // the compaction algebra re-expressed with FILTERed arg_max
    "q122_cdc_compact" ->
      s"""WITH $changeLogSql,
        |comp AS (
        |  SELECT doc_id,
        |    COALESCE(max(seq) FILTER (WHERE op = 'D'), 0) AS last_d,
        |    COALESCE(max(seq) FILTER (WHERE op = 'I'), 0) AS last_i,
        |    arg_max(op, seq) AS last_op,
        |    max(seq) FILTER (WHERE op = 'U' AND source IS NOT NULL)
        |      AS us_source,
        |    arg_max(source, seq)
        |      FILTER (WHERE op = 'U' AND source IS NOT NULL) AS uv_source,
        |    max(seq) FILTER (WHERE op = 'U' AND text IS NOT NULL) AS us_text,
        |    arg_max(text, seq)
        |      FILTER (WHERE op = 'U' AND text IS NOT NULL) AS uv_text,
        |    arg_max(source, seq) FILTER (WHERE op = 'I') AS iv_source,
        |    arg_max(text, seq) FILTER (WHERE op = 'I') AS iv_text
        |  FROM log GROUP BY doc_id),
        |c2 AS (
        |  SELECT doc_id,
        |    CASE WHEN us_source > GREATEST(last_d, last_i) THEN uv_source
        |         WHEN last_i > last_d THEN iv_source END AS source,
        |    CASE WHEN us_text > GREATEST(last_d, last_i) THEN uv_text
        |         WHEN last_i > last_d THEN iv_text END AS text,
        |    CASE WHEN last_op = 'D' THEN 'D'
        |         WHEN last_d > 0 OR last_i > 0 THEN 'I'
        |         ELSE 'U' END AS op
        |  FROM comp),
        |snap AS (SELECT doc_id, source, text FROM documents)
        |SELECT COALESCE(s.doc_id, c.doc_id) AS doc_id,
        |  CASE WHEN c.op = 'I' THEN c.source
        |       ELSE COALESCE(c.source, s.source) END AS source,
        |  md5(COALESCE(CASE WHEN c.op = 'I' THEN c.text
        |                    ELSE COALESCE(c.text, s.text) END, '')) AS fp
        |FROM snap s FULL OUTER JOIN c2 c ON s.doc_id = c.doc_id
        |WHERE COALESCE(c.op, '') <> 'D'""".stripMargin,
    // lead bounds + epoch-partitioned carry-forward
    "q123_scd2_history" ->
      s"""WITH $changeLogSql,
        |hist AS (
        |  SELECT doc_id, seq, op, source, text,
        |    SUM(CASE WHEN op IN ('D','I') THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY seq) AS epoch,
        |    LEAD(seq) OVER (PARTITION BY doc_id ORDER BY seq) AS valid_to
        |  FROM log),
        |filled AS (
        |  SELECT doc_id, seq AS valid_from, valid_to, op,
        |    LAST_VALUE(source IGNORE NULLS)
        |      OVER (PARTITION BY doc_id, epoch ORDER BY seq
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS source,
        |    LAST_VALUE(text IGNORE NULLS)
        |      OVER (PARTITION BY doc_id, epoch ORDER BY seq
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS text
        |  FROM hist)
        |SELECT doc_id, valid_from, valid_to, valid_to IS NULL AS is_current,
        |  source, md5(COALESCE(text, '')) AS fp
        |FROM filled WHERE op <> 'D'""".stripMargin,
    // same change derivation; the COALESCE chain IS the merge semantics
    "q121_merge_upsert" ->
      """WITH snap AS (SELECT doc_id, source, text FROM documents),
        |ch AS (
        |  SELECT doc_id, CAST(NULL AS VARCHAR) AS source,
        |    text || ' v2' AS text, 'U' AS op
        |  FROM snap WHERE doc_id % 10 = 3 AND text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'D'
        |  FROM snap WHERE doc_id % 10 = 7
        |  UNION ALL
        |  SELECT doc_id + 10000000, source, 'fresh insert', 'I'
        |  FROM snap WHERE doc_id % 10 = 1 AND text IS NOT NULL)
        |SELECT COALESCE(s.doc_id, c.doc_id) AS doc_id,
        |  COALESCE(c.source, s.source) AS source,
        |  md5(COALESCE(COALESCE(c.text, s.text), '')) AS fp
        |FROM snap s FULL OUTER JOIN ch c ON s.doc_id = c.doc_id
        |WHERE COALESCE(c.op, '') <> 'D'""".stripMargin,
    // identical snapshot derivation + md5 classification
    "q112_snapshot_diff" ->
      s"""WITH $oldSnapshotCte,
        |o AS (SELECT doc_id, md5(COALESCE(text, '')) AS h_old,
        |        source AS src_old FROM old_s),
        |n AS (SELECT doc_id, md5(COALESCE(text, '')) AS h_new,
        |        source AS src_new FROM documents)
        |SELECT COALESCE(src_new, src_old) AS source,
        |  CASE WHEN h_old IS NULL THEN 'added'
        |       WHEN h_new IS NULL THEN 'removed'
        |       WHEN h_old <> h_new THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  COUNT(*) AS n_docs
        |FROM o FULL OUTER JOIN n USING (doc_id)
        |GROUP BY 1, 2""".stripMargin,
    // q24's pair CTEs at threshold 0.5, then the same floor-of-20ths bins
    "q113_threshold_sweep" ->
      s"""WITH ${Extensions.unigramPairCtesOver("documents", threshold = 0.5)}
        |SELECT FLOOR(jaccard * 20) / 20 AS bin_lo, COUNT(*) AS n_pairs,
        |  MIN(jaccard) AS min_j, MAX(jaccard) AS max_j
        |FROM p GROUP BY 1""".stripMargin,
    // q22's detector CASE joined back to the declared label
    "q114_lang_mismatch" ->
      s"""WITH pred AS (${Extensions.langCase})
        |SELECT d.lang, p.lang_pred, COUNT(*) AS n_docs
        |FROM documents d JOIN pred p USING (doc_id)
        |GROUP BY 1, 2""".stripMargin)
}
