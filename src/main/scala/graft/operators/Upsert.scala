package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO / CDC-apply semantics as one co-partitioned join — the
  * snapshot-maintenance op between ingest rounds (reference analog: the
  * app's overwrite-vs-append table loads, app.py JDBC sinks, generalized
  * to keyed row-level changes).
  *
  * Scale shape: a single full-outer shuffle join on the key — no window,
  * no driver loop; with snapshot AND change batch bucketed on the key
  * (sources.Sinks.parquetBucketed) the Exchange disappears entirely
  * (q75's proof). A billion-row snapshot with a million-row change batch
  * shuffles the change batch and streams the snapshot.
  */
object Upsert {

  /** Apply a keyed change batch to a snapshot.
    *
    * `changes` carries the snapshot's columns plus `opCol` ∈ {I, U, D}:
    * D drops the key; U lands its non-null columns over the snapshot's
    * (NULL change column = keep the old value — the partial-update
    * contract; a U for an absent key inserts, the upsert half); I is a
    * full-row replace — its columns land verbatim, NULL included (the
    * delete-then-recreate compaction shape needs a replace op, or the
    * dead row's columns would bleed through the coalesce). Exactly one
    * change row per key (the caller's CDC-compaction contract —
    * [[compactChanges]] produces it from a multi-op log).
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, key: String,
                   opCol: String = "op"): DataFrame = {
    val joined = snapshot.alias("s")
      .join(changes.alias("c"), Seq(key), "full_outer")
    joined
      .filter(coalesce(col(s"c.$opCol"), lit("")) =!= "D")
      .select(col(key) +: snapshot.columns.filter(_ != key).toSeq.map { f =>
        when(col(s"c.$opCol") === "I", col(s"c.$f"))
          .otherwise(coalesce(col(s"c.$f"), col(s"s.$f"))).as(f) }: _*)
  }

  /** Compact a multi-op CDC log (many ops per key, ordered by `seqCol`,
    * seqs unique within a key) to the single equivalent change row per
    * key that [[applyChanges]] consumes — Kafka-compaction semantics
    * extended with column-level folding of partial updates.
    *
    * Per key, in seq order: D deletes, I replaces the whole row, U
    * overlays its non-null columns. The compacted row is therefore:
    *   - op D if the last op is a delete;
    *   - op I if the pre-image was destroyed or re-created along the way
    *     (any D or I in the log) — base = the last I's row if it follows
    *     the last D, overlaid with every later U's non-null columns;
    *     columns never touched after the reset come out NULL (the old
    *     row is gone — they must NOT bleed through the U-coalesce);
    *   - op U otherwise — each column folds to its latest non-null U
    *     value, NULL meaning "keep the snapshot's".
    *
    * Scale shape: ONE hash aggregation on the key — no window, no
    * self-join, no per-key sort task. Each column costs two conditional
    * struct-max slots (latest non-null U, value at last I); the boundary
    * algebra is a post-agg projection. The latest-non-null-U-overall
    * equals the latest valid overlay because the valid set is a seq
    * suffix: if the overall max is below the boundary, the set is empty.
    */
  def compactChanges(changes: DataFrame, key: String, seqCol: String,
                     opCol: String = "op"): DataFrame = {
    val dataCols = changes.columns
      .filterNot(c => c == key || c == seqCol || c == opCol).toSeq
    val s  = col(seqCol)
    val op = col(opCol)
    val aggs =
      max(when(op === "D", s)).as("__last_d") +:
      max(when(op === "I", s)).as("__last_i") +:
      max_by(op, s).as("__last_op") +:
      dataCols.flatMap { c =>
        Seq(
          max(when(op === "U" && col(c).isNotNull,
            struct(s.as("s"), col(c).as("v")))).as(s"__u_$c"),
          max(when(op === "I", struct(s.as("s"), col(c).as("v"))))
            .as(s"__i_$c"))
      }
    val lo  = lit(Long.MinValue)
    val agg = changes.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
    val lastD = coalesce(col("__last_d"), lo)
    val lastI = coalesce(col("__last_i"), lo)
    // the I that survives is the last one AFTER the last D; the overlay
    // boundary is the last reset of either kind
    val effI     = col("__last_i").isNotNull && lastI > lastD
    val boundary = greatest(lastD, lastI)
    val outOp = when(col("__last_op") === "D", "D")
      .when(col("__last_d").isNotNull || col("__last_i").isNotNull, "I")
      .otherwise("U")
    agg.select(
      col(key) +:
      dataCols.map { c =>
        when(col(s"__u_$c").isNotNull && col(s"__u_$c.s") > boundary,
            col(s"__u_$c.v"))
          .when(effI, col(s"__i_$c.v"))
          .as(c)
      } :+ outOp.as(opCol): _*)
  }

  /** Streaming CDC materialization: keep a snapshot table current under
    * an unbounded change stream. Each microbatch is compacted
    * ([[compactChanges]], one hash-agg) and merged ([[applyChanges]], one
    * key join) onto the previous snapshot version, written as
    * `snapshotDir/v{batchId+1}` — plain parquet, no table format needed.
    *
    * Exactly-once across restarts WITHOUT a transaction log: the base
    * version is resolved as max(v_i ≤ batchId), never "latest", so a
    * replayed batch re-reads the same base it read the first time and
    * idempotently overwrites the same output version (changes carry
    * absolute values, so even a double-apply is a fixpoint). The caller
    * seeds `snapshotDir/v0` with the initial snapshot; per-key seq order
    * across microbatches is the CDC source's contract.
    *
    * Scale shape per trigger: shuffle of the (small) change batch plus
    * one join against the snapshot — the snapshot is never shuffled if
    * both sides are bucketed on the key (q75's proof); state lives in
    * the filesystem, not executor memory, so corpus size is unbounded.
    */
  def applyChangesStream(changes: DataFrame, key: String, seqCol: String,
                         snapshotDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val base = s.read.parquet(versionAtOrBefore(s, snapshotDir, batchId))
        applyChanges(base, compactChanges(batch, key, seqCol), key)
          .write.mode("overwrite").parquet(s"$snapshotDir/v${batchId + 1}")
      }
      .start()

  /** Largest committed version directory with index <= batchId (empty
    * microbatches can skip ids, so "previous" is a search, not an
    * increment). Driver-side listing of O(#versions) names only.
    */
  /** Version ids under `dir` whose directory carries `_SUCCESS` — the
    * parquet committer's completeness marker. Only COMPLETE versions
    * participate in base resolution and latest-read: a reader concurrent
    * with a writer (or arriving after a crash mid-overwrite during
    * replay) must never see a partially-written version, and the
    * max-numbered directory is exactly the one that can be mid-write.
    * Driver-side listing of O(#versions) names + one marker probe each.
    */
  private[operators] def completeVersions(
      s: org.apache.spark.sql.SparkSession, dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case nm if nm.matches("v\\d+") => nm.drop(1).toLong }
      .filter(v => fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v$v/_SUCCESS")))
      .sorted
  }

  private def versionAtOrBefore(s: org.apache.spark.sql.SparkSession,
                                dir: String, batchId: Long): String = {
    val vs = completeVersions(s, dir).filter(_ <= batchId)
    require(vs.nonEmpty,
      s"no complete snapshot version <= $batchId under $dir — seed v0")
    s"$dir/v${vs.max}"
  }

  /** Read the newest COMPLETE materialized snapshot version (any id):
    * the max-numbered version carrying `_SUCCESS`, so a version still
    * being overwritten by a concurrent or replayed microbatch is skipped
    * in favor of its committed predecessor.
    */
  def latestSnapshot(s: org.apache.spark.sql.SparkSession,
                     dir: String): DataFrame = {
    val vs = completeVersions(s, dir)
    require(vs.nonEmpty, s"no complete snapshot versions under $dir")
    s.read.parquet(s"$dir/v${vs.max}")
  }

  /** Point-in-time (temporal) join: each probe row (key, ts) gets the
    * [[scd2History]] version whose [valid_from, valid_to) interval covers
    * ts — the "dimension as of event time" lookup that makes SCD2 worth
    * building. NOT an inequality join: the probe rides [[AsOfJoin]]'s
    * union-and-carry-forward on valid_from (one shuffle + per-key sort),
    * and a post-mask nulls the payload when the carried version was
    * CLOSED before ts (`valid_to <= ts`) — the deleted-interval gap an
    * as-of join alone cannot see. ≤1 version covers any ts (intervals
    * are disjoint by construction), so no dedup pass is needed.
    */
  def pointInTime(probe: DataFrame, history: DataFrame, key: String,
                  tsCol: String): DataFrame = {
    val payload = history.columns.filterNot(_ == key).toSeq
    val joined = AsOfJoin(probe, history, key, tsCol, "valid_from", payload)
    val valid = col("asof_valid_to").isNull ||
      col(tsCol) < col("asof_valid_to")
    joined.select(
      probe.columns.toIndexedSeq.map(col) ++
      payload.map(p => when(valid, col(s"asof_$p")).as(s"asof_$p")): _*)
  }

  /** Streaming twin of [[pointInTime]]: enrich an unbounded probe stream
    * against a STATIC history table. The batch shape (AsOfJoin's window
    * carry-forward) is not available on streams, so this is the
    * stream-static join Spark does support: hash on the key, interval
    * residual as a post-filter. ≤1 history version matches any probe
    * (disjoint intervals), so the left join preserves stream cardinality.
    * Scale: per-microbatch join against the history — broadcast when the
    * dimension is broadcast-sized, shuffled stream side otherwise (the
    * static side reuses its exchange across batches); UpsertSpec proves
    * row equality with the batch operator.
    */
  def pointInTimeStream(probe: DataFrame, history: DataFrame, key: String,
                        tsCol: String): DataFrame = {
    val p = probe.alias("p")
    val h = history.alias("h")
    val payload = history.columns.filterNot(_ == key).toSeq
    p.join(h,
        col(s"p.$key") === col(s"h.$key") &&
          col("h.valid_from") <= col(s"p.$tsCol") &&
          (col("h.valid_to").isNull || col(s"p.$tsCol") < col("h.valid_to")),
        "left")
      .select(probe.columns.toIndexedSeq.map(c => col(s"p.$c")) ++
        payload.map(c => col(s"h.$c").as(s"asof_$c")): _*)
  }

  /** SCD Type-2 dimension history from the same multi-op log: every
    * surviving U/I row becomes a version with `valid_from` = its seq and
    * `valid_to` = the NEXT op's seq on that key (NULL = still current; a
    * D closes the last version without opening one). Partial-update Us
    * carry forward the previous version's columns (latest non-null wins)
    * — but only within an "epoch": each D or I resets the carry-forward,
    * so recreated rows never inherit a dead row's columns.
    *
    * D rows contribute NO payload: a delete marks the key dead, so any
    * column values riding on the D row are semantically void and are
    * nulled before the carry-forward window — otherwise a non-null D
    * payload would bleed into same-epoch successors (the D opens the
    * epoch it increments into).
    *
    * Scale shape: per-key windows only — bounded by ops-per-key (the
    * q89/q90 contract), never a global sort. The epoch counter is a
    * running conditional sum over the same window; carry-forward is
    * `last(_, ignoreNulls)` over (key, epoch).
    */
  def scd2History(changes: DataFrame, key: String, seqCol: String,
                  opCol: String = "op"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dataCols = changes.columns
      .filterNot(c => c == key || c == seqCol || c == opCol).toSeq
    val sanitized = dataCols.foldLeft(changes) { (df, c) =>
      df.withColumn(c, when(col(opCol) === "D", lit(null)).otherwise(col(c)))
    }
    val wKey   = Window.partitionBy(key).orderBy(seqCol)
    val epochd = sanitized.withColumn("__epoch",
      sum(when(col(opCol).isin("D", "I"), 1).otherwise(0)).over(wKey))
    val wRun = Window.partitionBy(col(key), col("__epoch")).orderBy(seqCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    epochd
      .select(
        col(key) +: col(seqCol).as("valid_from") +: col(opCol) +:
        lead(seqCol, 1).over(wKey).as("valid_to") +:
        dataCols.map(c => last(col(c), ignoreNulls = true).over(wRun).as(c)): _*)
      .filter(col(opCol) =!= "D")
      .drop(opCol)
      .withColumn("is_current", col("valid_to").isNull)
  }
}
