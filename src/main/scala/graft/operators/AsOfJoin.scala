package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of join: for every left row, attach the most recent right row
  * with the same key and right.time <= left.time.
  *
  * Implementation is the union-and-carry-forward shape (one shuffle + one
  * sort, like a sort-merge join — never a per-row range probe and never a
  * time-banded cross join):
  *
  *   1. tag and union both inputs on (key, time);
  *   2. sort within key by (time, tag) — right rows sort BEFORE left rows at
  *      equal times so an exactly-simultaneous right row is visible;
  *   3. last_value(right payload, ignoreNulls) over rows unbounded-preceding
  *      carries the latest right row forward;
  *   4. keep left rows.
  *
  * At 100 TB this is exactly one hash-partition on the key + per-partition
  * sort, both streaming-friendly; skewed keys split under AQE.
  */
object AsOfJoin {

  /** @param left      left (probe) rows
    * @param right     right (reference) rows
    * @param keyCol    equi-key present in both
    * @param leftTime  event-time column on the left
    * @param rightTime event-time column on the right
    * @param payload   right columns to attach (null when no right row is <=)
    */
  def apply(left: DataFrame, right: DataFrame, keyCol: String,
            leftTime: String, rightTime: String,
            payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // The payload travels as ONE struct so the carried-forward value is
    // always an atomic right row. Per-column last(ignoreNulls) would stitch
    // columns from DIFFERENT right rows whenever the matched row holds a
    // NULL payload value (stale-column resurrection).
    val payloadStructType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p).copy(name = p)))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
      .select((Seq("__t", "__tag") ++ leftCols).map(col) :+
        lit(null).cast(payloadStructType).as("__p"): _*)
    val r = right
      // NULL-time right rows can never satisfy rightTime <= leftTime; left
      // in, they would sort nulls-first and be carried forward as spurious
      // "earliest" matches
      .filter(col(rightTime).isNotNull)
      .withColumn("__t", col(rightTime))
      .withColumn("__tag", lit(0))
      .select(Seq(col("__t"), col("__tag"), col(keyCol)) ++
        leftCols.filter(_ != keyCol).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__p"): _*)

    // __p joins the sort key as a deterministic tiebreak: multiple right
    // rows at the SAME (key, time) would otherwise be picked arbitrarily
    // per run/partitioning (the largest payload struct wins, consistently).
    val w = Window.partitionBy(keyCol).orderBy(col("__t"), col("__tag"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.toIndexedSeq.map(col) ++
        payload.map(p => col(s"__last.$p").as(s"asof_$p")): _*)
  }
}
