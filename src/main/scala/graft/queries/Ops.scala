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
  private def oldSnapshot(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val kept = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 3, concat(col("text"), lit(" v0")))
          .otherwise(col("text")).as("text"),
        col("source"))
    val retired = docs.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"),
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q112_snapshot_diff"  -> (q112SnapshotDiff _),
    "q113_threshold_sweep" -> (q113ThresholdSweep _),
    "q114_lang_mismatch"  -> (q114LangMismatch _))

  val oracles: Map[String, String] = Map(
    // identical snapshot derivation + md5 classification
    "q112_snapshot_diff" ->
      """WITH old_s AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 3 THEN text || ' v0' ELSE text END AS text,
        |    source
        |  FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000000 AS doc_id, text, source
        |  FROM documents WHERE doc_id % 13 = 0),
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
