package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Expectations}

/** Crawl-shaped streaming ingest (round-14 verdict ask #10): the front of
  * the q244 web pipeline as a stream-capable composition —
  *
  *   raw page → visible text (functions.Html.htmlExtract, map-only) →
  *   expectation gate (Expectations.gateRows, map-only; violating pages
  *   route to a self-describing quarantine disposition instead of
  *   admission — the gateBatch convention at row granularity) →
  *   NEAR-DUP-SAFE split assignment against the frozen corpus index
  *   (Dedup.splitStreamMinhash — the q239 twin: an arrival inherits its
  *   matched cluster's split, so a crawl result whose near-duplicate is
  *   already in train can never land in test).
  *
  * Every stage is append-mode streaming-legal (no new-side aggregation:
  * two map-only projections and splitStreamMinhash's stream-static
  * equi-joins), so the SAME function body serves the batch backfill and
  * the readStream/foreachBatch ingest — WebIngestSpec pins MemoryStream
  * output equal to the batch run row-for-row, and the no-broadcast plan
  * contract (index side shuffle_hash, never broadcast: an O(corpus)
  * broadcast is the round-5 scale-killer).
  *
  * Output, one row per page: (doc_id, cluster, n_clusters, split,
  * violations, disposition) — disposition 'admit' rows carry the split
  * assignment; 'quarantine' rows carry the violated rule names and NULL
  * split, so nothing partial ever reaches a training shard.
  */
object WebIngest {

  def ingest(pages: DataFrame, index: Dedup.MinhashSplitIndex,
             rules: Seq[Expectations.Expect],
             threshold: Double,
             htmlCol: String = "html",
             minBandCollisions: Int = 1,
             trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val extracted = pages.select(col("doc_id"),
      graft.functions.Html.htmlExtract(col(htmlCol)).as("text"))
    val gated = Expectations.gateRows(extracted, rules)
    val ok = Dedup.splitStreamMinhash(
        gated.filter(col("admitted")).select("doc_id", "text"),
        index, threshold, minBandCollisions, trainPct, valPct)
      .withColumn("violations", array().cast("array<string>"))
      .withColumn("disposition", lit("admit"))
    val quarantined = gated.filter(!col("admitted"))
      .select(col("doc_id"),
        lit(null).cast("bigint").as("cluster"),
        lit(null).cast("bigint").as("n_clusters"),
        lit(null).cast("string").as("split"),
        col("violations"),
        lit("quarantine").as("disposition"))
    ok.unionByName(quarantined)
  }
}
