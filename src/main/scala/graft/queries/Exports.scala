package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.operators.Export

/** Export-stage queries: the terminal "ship it to the trainer" step of the
  * curation pipeline — deterministic global shuffle + fixed-count sharding
  * with an auditable manifest (operators.Export). Reference behavioral
  * analog: the CSV/DB export tails (/root/reference/main.py:420-437); the
  * manifest/determinism contract is extension tier.
  */
object Exports {

  /** Shard count for the declared queries: fixed, so the manifest is
    * scale-factor- and cluster-size-independent (empty shards at tiny SFs
    * simply have no manifest row, same as the SQL GROUP BY).
    */
  private val NShards = 16

  /** q135: shard manifest — every non-null-text document assigned its
    * deterministic shard and intra-shard order key, rolled up to the
    * per-shard audit row: doc/token/byte totals, source spread, an
    * order-independent content checksum, and the [first_key, last_key]
    * order bounds a reader verifies per file. One projection + one
    * O(NShards)-row hash-agg; the physical write path
    * (Export.writeShards) is gated by ExportSpec against THIS manifest.
    */
  def q135ShardManifest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .filter(col("text").isNotNull)
      .select("doc_id", "source", "text")
    Export.manifest(Export.assignShards(docs, "doc_id", NShards))
  }

  /** q136: the export chain composed end to end — three individually-gated
    * stages whose WIRING only a composition gate sees:
    *
    *  1. DEDUP (q20's exact-dedup semantics, Dedup.exactByFingerprint's
    *     32-byte-key shape): one min-struct hash-agg on md5(text) keeps
    *     the smallest doc_id per identical text WITHOUT a join-back —
    *     duplicate texts combine map-side, the shuffle ships each
    *     distinct text once.
    *  2. QUALITY FENCE (q39's scoring function, bit-identical IEEE
    *     arithmetic on both engines): survivors below 0.5 are dropped.
    *  3. SHARD + MANIFEST (q135's gate) over what remains.
    *
    * A dedup bug shifts n_docs/checksum; a fence bug shifts tok_sum; a
    * shard bug moves rows between manifest lines — the single hash gate
    * covers all three hand-offs. Scale shape: one text-bearing shuffle
    * (the dedup agg), then map-only scoring, then the O(NShards) rollup.
    */
  def q136ExportChain(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .filter(col("text").isNotNull)
      .select(md5(col("text")).as("fp"),
        struct(col("doc_id"), col("source"), col("text")).as("r"))
    val survivors = docs.groupBy("fp")
      .agg(min("r").as("r")) // struct order = (doc_id, ...): min doc_id wins
      .select(col("r.doc_id").as("doc_id"), col("r.source").as("source"),
        col("r.text").as("text"))
      .filter(TextFunctions.qualityScore(col("text")) >= 0.5)
    Export.manifest(Export.assignShards(survivors, "doc_id", NShards))
  }

  /** q137: incremental-export audit — which shards changed between two
    * corpus versions, i.e. exactly what a trainer (or a shard mirror) must
    * re-fetch after a corpus update. Both versions' manifests are built
    * with the SAME deterministic shard algebra (q135's), so a shard whose
    * audit quadruple (n_docs, tok_sum, byte_sum, checksum) is unchanged is
    * byte-identical on disk (up to checksum collision — deterministic,
    * hence gate-safe) and need not be re-exported; `dirty` marks the rest.
    * The previous version is q112's synthetic old snapshot — the
    * adds/changes/removes exercise all three ways a shard can go dirty.
    *
    * Scale shape: two manifest aggregations (each one shuffle of
    * fixed-width rows — text is reduced map-side to its token/byte/md5
    * stats by the projection inside Export.manifest) and an O(nShards)
    * full-outer join the planner broadcasts. The corpus is never joined
    * to itself; only the two 16-row manifests meet.
    */
  def q137ExportDelta(s: SparkSession, dir: String): DataFrame = {
    def man(docs: DataFrame): DataFrame =
      Export.manifest(Export.assignShards(
        docs.filter(col("text").isNotNull).select("doc_id", "source", "text"),
        "doc_id", NShards))
    val o = man(Ops.oldSnapshot(s, dir)).select(
      col("shard"), col("n_docs").as("n_old"), col("tok_sum").as("t_old"),
      col("byte_sum").as("b_old"), col("checksum").as("c_old"))
    val n = man(Tables.documents(s, dir)).select(
      col("shard"), col("n_docs").as("n_new"), col("tok_sum").as("t_new"),
      col("byte_sum").as("b_new"), col("checksum").as("c_new"))
    o.join(n, Seq("shard"), "full_outer")
      .select(
        col("shard"),
        coalesce(col("n_old"), lit(0L)).as("n_docs_old"),
        coalesce(col("n_new"), lit(0L)).as("n_docs_new"),
        (coalesce(col("t_new"), lit(0L)) - coalesce(col("t_old"), lit(0L)))
          .as("tok_delta"),
        (coalesce(col("b_new"), lit(0L)) - coalesce(col("b_old"), lit(0L)))
          .as("byte_delta"),
        (!(col("n_old") <=> col("n_new") && col("t_old") <=> col("t_new") &&
           col("b_old") <=> col("b_new") && col("c_old") <=> col("c_new")))
          .as("dirty"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q135_shard_manifest" -> (q135ShardManifest _),
    "q136_export_chain"   -> (q136ExportChain _),
    "q137_export_delta"   -> (q137ExportDelta _))

  /** The manifest rollup as DuckDB SQL over a prepared relation `from`
    * carrying (shard, shuffle_key, source, text, n_tokens). SUM widens to
    * HUGEINT in DuckDB → cast back to BIGINT to match Spark's long.
    */
  private def manifestSelect(from: String = "a"): String =
    s"""SELECT shard, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS tok_sum,
      |  CAST(SUM(LENGTH(text)) AS BIGINT) AS byte_sum,
      |  COUNT(DISTINCT source) AS n_sources,
      |  CAST(SUM(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT)
      |    AS checksum,
      |  MIN(shuffle_key) AS first_key, MAX(shuffle_key) AS last_key
      |FROM $from GROUP BY shard""".stripMargin

  /** Shard/order-key assignment as DuckDB SQL — the md5 device of the
    * sampling family (operators.Sampling), so both engines agree bit-wise.
    */
  private def assignSql(from: String, name: String = "a"): String =
    s"""$name AS (
      |  SELECT doc_id, source, text,
      |    CAST(('0x' || substr(md5('shard:' || doc_id), 1, 8))::BIGINT
      |      % $NShards AS INT) AS shard,
      |    md5('order:' || doc_id) AS shuffle_key,
      |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
      |  FROM $from)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q135_shard_manifest" ->
      s"""WITH d AS (SELECT doc_id, source, text FROM documents
        |        WHERE text IS NOT NULL),
        |${assignSql("d")}
        |${manifestSelect()}""".stripMargin,
    // q20's keep-min-id dedup + q39's scoring expression + q135's rollup
    "q136_export_chain" ->
      s"""WITH k AS (
        |  SELECT md5(text) AS fp, MIN(doc_id) AS doc_id
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1),
        |s AS (
        |  SELECT d.doc_id, d.source, d.text
        |  FROM documents d JOIN k ON d.doc_id = k.doc_id),
        |q AS (
        |  SELECT doc_id, source, text FROM s
        |  WHERE ${Extensions.qualitySqlExpr.linesIterator.mkString(" ")} >= 0.5),
        |${assignSql("q")}
        |${manifestSelect()}""".stripMargin,
    // q112's old-snapshot CTE + two q135 manifest chains + the O(nShards)
    // full-outer audit join
    "q137_export_delta" ->
      s"""WITH ${graft.queries.Ops.oldSnapshotCte},
        |od AS (SELECT doc_id, source, text FROM old_s WHERE text IS NOT NULL),
        |nd AS (SELECT doc_id, source, text FROM documents
        |       WHERE text IS NOT NULL),
        |${assignSql("od", "ao")},
        |${assignSql("nd", "an")},
        |mo AS (${manifestSelect("ao").linesIterator.mkString(" ")}),
        |mn AS (${manifestSelect("an").linesIterator.mkString(" ")})
        |SELECT COALESCE(mo.shard, mn.shard) AS shard,
        |  COALESCE(mo.n_docs, 0) AS n_docs_old,
        |  COALESCE(mn.n_docs, 0) AS n_docs_new,
        |  COALESCE(mn.tok_sum, 0) - COALESCE(mo.tok_sum, 0) AS tok_delta,
        |  COALESCE(mn.byte_sum, 0) - COALESCE(mo.byte_sum, 0) AS byte_delta,
        |  NOT (mo.n_docs IS NOT DISTINCT FROM mn.n_docs
        |    AND mo.tok_sum IS NOT DISTINCT FROM mn.tok_sum
        |    AND mo.byte_sum IS NOT DISTINCT FROM mn.byte_sum
        |    AND mo.checksum IS NOT DISTINCT FROM mn.checksum) AS dirty
        |FROM mo FULL OUTER JOIN mn ON mo.shard = mn.shard""".stripMargin)
}
