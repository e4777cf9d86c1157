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

  /** SCD Type-2 dimension history from the same multi-op log: every
    * surviving U/I row becomes a version with `valid_from` = its seq and
    * `valid_to` = the NEXT op's seq on that key (NULL = still current; a
    * D closes the last version without opening one). Partial-update Us
    * carry forward the previous version's columns (latest non-null wins)
    * — but only within an "epoch": each D or I resets the carry-forward,
    * so recreated rows never inherit a dead row's columns.
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
    val wKey   = Window.partitionBy(key).orderBy(seqCol)
    val epochd = changes.withColumn("__epoch",
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
