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
    *
    * Defined as the [[manifestFromPartials]] rollup of [[partialManifest]]
    * — ONE projection/aggregation algebra for the batch, streaming, and
    * oracle paths, so they cannot drift (a reviewer caught the duplicated
    * version disagreeing on NULL sources).
    */
  def manifest(assigned: DataFrame, textCol: String = "text",
               tokenCol: Column = null): DataFrame =
    manifestFromPartials(partialManifest(assigned, textCol, tokenCol))

  /** The (shard, source)-grained partial manifest of an [[assignShards]]
    * frame. Strictly finer than [[manifest]]: every statistic is a
    * commutative monoid over inserts (sums add, min/max combine), so
    * partials from disjoint document batches MERGE exactly — the property
    * [[manifestStream]] relies on. [[manifest]] itself cannot be
    * incrementally merged at shard grain (n_sources is a COUNT DISTINCT),
    * which is why the streaming state keeps this finer key.
    */
  def partialManifest(assigned: DataFrame, textCol: String = "text",
                      tokenCol: Column = null): DataFrame =
    assigned
      .select(col("shard"), col("shuffle_key"), col("source"),
        Option(tokenCol).getOrElse(
          graft.functions.TextFunctions.tokenCount(col(textCol)))
          .cast("long").as("__tok"),
        length(col(textCol)).cast("long").as("__bytes"),
        conv(substring(md5(col(textCol)), 1, 8), 16, 10)
          .cast("long").as("__ck"))
      .groupBy("shard", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__tok").as("tok_sum"),
        sum("__bytes").as("byte_sum"),
        sum("__ck").as("checksum"),
        min("shuffle_key").as("first_key"),
        max("shuffle_key").as("last_key"))

  /** Merge two [[partialManifest]] frames (associative + commutative). */
  def mergePartials(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("shard", "source")
      .agg(
        sum("n_docs").as("n_docs"),
        sum("tok_sum").as("tok_sum"),
        sum("byte_sum").as("byte_sum"),
        sum("checksum").as("checksum"),
        min("first_key").as("first_key"),
        max("last_key").as("last_key"))

  /** Roll a [[partialManifest]] state up to [[manifest]]'s shape — each
    * (shard, source) state row is one distinct source, so n_sources is a
    * count of NON-NULL source rows (matching COUNT(DISTINCT source)'s
    * null-skipping on both engines). O(nShards × nSources) input rows;
    * free.
    */
  def manifestFromPartials(partials: DataFrame): DataFrame =
    partials.groupBy("shard")
      .agg(
        sum("n_docs").as("n_docs"),
        sum("tok_sum").as("tok_sum"),
        sum("byte_sum").as("byte_sum"),
        count(col("source")).as("n_sources"),
        sum("checksum").as("checksum"),
        min("first_key").as("first_key"),
        max("last_key").as("last_key"))

  /** Streaming manifest maintenance: keep the export manifest current
    * while an INSERT-ONLY document stream (e.g. Dedup.admitStream's
    * admitted output — admission guarantees each doc_id arrives once) is
    * being accumulated, so the trainer hand-off needs no full-corpus
    * re-scan when the export cut is taken.
    *
    * State is the (shard, source) [[partialManifest]] under versioned
    * parquet (`stateDir/v{batchId+1}` — the Upsert.applyChangesStream
    * device): each microbatch merges its partial into the last committed
    * version and writes the next one, so a replayed batch id OVERWRITES
    * its own version instead of double-counting — exactly-once
    * materialization without a table format. Per batch the work is one
    * partial agg over the batch plus a merge with O(nShards × nSources)
    * state rows; the corpus itself is never re-read. Read the current
    * manifest at any time with
    * `manifestFromPartials(Upsert.latestSnapshot(spark, stateDir))`.
    *
    * `docsStream` must carry (`idCol`, source, `textCol`); null-text rows
    * are dropped to match [[manifest]]'s contract. `tokenCol` is the same
    * override [[manifest]] takes — pass the SAME expression to both paths
    * or their tok_sums will (correctly) disagree.
    */
  def manifestStream(docsStream: DataFrame, idCol: String, nShards: Int,
                     stateDir: String, checkpointDir: String,
                     textCol: String = "text", tokenCol: Column = null,
                     retainVersions: Int = 3)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatchIntoState(batch, batchId, idCol, nShards, stateDir, textCol,
          tokenCol, retainVersions)
      }
      .start()

  /** One micro-batch of [[manifestStream]]: merge the batch's partial into
    * the newest COMPLETE (`_SUCCESS`-carrying) state version AT OR BEFORE
    * batchId and write version batchId+1. Reading strictly-older state is
    * what makes a REPLAYED batch id idempotent — it re-reads the same
    * predecessor and overwrites its own version instead of compounding
    * (ExportSpec pins it); the completeness filter keeps a crash-truncated
    * overwrite from ever becoming a merge base. After the write commits,
    * complete versions older than the newest `retainVersions` are pruned —
    * without pruning the state dir grows one full copy per micro-batch
    * forever. `retainVersions >= 2` keeps the replay predecessor: Spark
    * replays at most the one uncommitted trailing batch, whose base is the
    * immediately preceding version.
    */
  private[operators] def mergeBatchIntoState(batch: DataFrame, batchId: Long,
      idCol: String, nShards: Int, stateDir: String, textCol: String,
      tokenCol: Column = null, retainVersions: Int = 3): Unit = {
    require(retainVersions >= 2,
      s"retainVersions must be >= 2 (replay needs the predecessor), got $retainVersions")
    val s = batch.sparkSession
    val part = partialManifest(
      assignShards(batch.filter(col(textCol).isNotNull), idCol, nShards),
      textCol, tokenCol)
    val prev = Upsert.completeVersions(s, stateDir).filter(_ <= batchId).lastOption
    val merged = prev match {
      case Some(v) => mergePartials(s.read.parquet(s"$stateDir/v$v"), part)
      case None    => part
    }
    // The predecessor version is materialized before the overwrite can
    // touch it (different version dirs), so no read-under-write hazard.
    merged.write.mode("overwrite").parquet(s"$stateDir/v${batchId + 1}")
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    Upsert.completeVersions(s, stateDir).dropRight(retainVersions).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/v$v"), true)
    }
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
