package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Terminal export stage of a training-data pipeline: deterministic global
  * shuffle, fixed-count sharding, one sorted file per shard, and a manifest
  * the training job (and the next pipeline run) can audit against.
  *
  * Why this is an operator and not "just a write": a trainer consuming a
  * 100 TB corpus needs (a) example order decorrelated from crawl/ingest
  * order — a GLOBAL shuffle — but reproducible run-to-run so a resumed or
  * re-sharded job sees the identical stream; (b) a file count fixed by the
  * training topology (readers × prefetch), not by whatever
  * `spark.sql.shuffle.partitions` happened to be; (c) a per-shard manifest
  * (docs, tokens, bytes, an order-independent content checksum) so a
  * half-written or re-run export is detectable without re-reading the data.
  *
  * Determinism comes from the same md5 device the sampling family uses
  * (operators.Sampling): shard and intra-shard order are pure functions of
  * the doc id, identical on every engine that agrees on md5 — so the DuckDB
  * oracle reproduces the manifest bit-for-bit, and a re-export after a
  * cluster resize yields byte-identical shards.
  *
  * Scale shape: ONE hash shuffle on the shard id (each output shard built by
  * exactly one task — `repartition(nShards, shard)` is a no-collision
  * assignment because the shard id is already in [0, nShards)), an in-task
  * sort for the intra-shard order (spill-backed, never driver-side), and a
  * map-side-combined manifest aggregation of O(nShards) rows. Nothing is
  * collected; shard count, not data size, bounds the writer fan-in.
  * Reference analog: the CSV/DB export tails of the reference pipeline
  * (/root/reference/main.py:420-437) — here grown the manifest + determinism
  * contract a multi-day distributed training read requires.
  */
object Export {

  /** Deterministic shard id in [0, nShards): first 32 md5 bits of
    * "<salt>:<id>" mod nShards. Uniform across shards, independent of the
    * id distribution (sequential ids, skewed sources — md5 mixes them).
    */
  def shardOf(id: Column, nShards: Int, salt: String = "shard"): Column = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    (conv(substring(md5(concat(lit(s"$salt:"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % nShards).cast("int")
  }

  /** Intra-shard order key: md5("order:<id>"). Sorting a shard by it IS the
    * deterministic global shuffle — example order is decorrelated from
    * ingest order but identical on every run and at every cluster size.
    */
  def shuffleKey(id: Column, salt: String = "order"): Column =
    md5(concat(lit(s"$salt:"), id.cast("string")))

  /** Assign every row a (shard, shuffle_key). Pure projection — map-side,
    * no shuffle; the physical movement happens only in [[writeShards]].
    */
  def assignShards(docs: DataFrame, idCol: String, nShards: Int): DataFrame =
    docs
      .withColumn("shard", shardOf(col(idCol), nShards))
      .withColumn("shuffle_key", shuffleKey(col(idCol)))

  /** Per-shard manifest over an [[assignShards]] frame: row/token/byte
    * totals, source spread, an order-independent content checksum (sum of
    * the first 32 md5 bits of each text — commutative, so partial
    * aggregation and shard-internal order don't matter), and the
    * [first_key, last_key] order-bounds the reader can verify per file.
    */
  def manifest(assigned: DataFrame, textCol: String = "text",
               tokenCol: Column = null): DataFrame = {
    val toks = Option(tokenCol).getOrElse(
      graft.functions.TextFunctions.tokenCount(col(textCol)))
    assigned
      .select(col("shard"), col("shuffle_key"), col("source"),
        toks.cast("long").as("__tok"),
        length(col(textCol)).cast("long").as("__bytes"),
        conv(substring(md5(col(textCol)), 1, 8), 16, 10)
          .cast("long").as("__ck"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__tok").as("tok_sum"),
        sum("__bytes").as("byte_sum"),
        countDistinct("source").as("n_sources"),
        sum("__ck").as("checksum"),
        min("shuffle_key").as("first_key"),
        max("shuffle_key").as("last_key"))
  }

  /** Physically write one sorted parquet file per shard under
    * `path/shard=N/`. `repartition(nShards, shard)` puts each shard id in
    * its own task (ids are already dense in [0, nShards), so the hash
    * partitioner cannot split a shard; distinct shards MAY share a task,
    * which `partitionBy` then fans back out to per-shard directories);
    * `sortWithinPartitions(shard, shuffle_key)` makes every file internally
    * ordered by the deterministic shuffle key. One shuffle, one spillable
    * sort, zero driver materialization.
    */
  def writeShards(assigned: DataFrame, path: String, nShards: Int): Unit =
    assigned
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_key"))
      .write
      .mode("overwrite")
      .partitionBy("shard")
      .parquet(path)
}
