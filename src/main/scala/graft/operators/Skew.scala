package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (the 100 TB brief: "skewed keys ->
  * salting or AQE skew-join"). AQE's skew handling covers sort-merge JOINS;
  * these helpers cover the shapes AQE does not re-plan:
  *
  *  - `saltedSumCount`: two-stage aggregation. Stage 1 aggregates on
  *    (key, salt) so a hot key's rows spread over `saltBuckets` reducers;
  *    stage 2 merges the partials. Identical results to a direct groupBy for
  *    algebraic aggregates — decimal sums keep it bit-identical.
  *  - `saltedJoin`: replicates the SMALL side `saltBuckets` times and salts
  *    the big side deterministically (hash of a caller-chosen column), so a
  *    hot join key's rows land on `saltBuckets` different reducers.
  */
object Skew {

  /** Deterministic salt in [0, n) from a source column (NOT rand() — results
    * must be reproducible run-to-run).
    */
  def saltFor(src: Column, n: Int): Column = pmod(xxhash64(src), lit(n.toLong)).cast("int")

  /** Per-key SUM (decimal-exact, rendered as double) + COUNT through a
    * two-stage salted aggregation.
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     saltSrc: Column, saltBuckets: Int): DataFrame = {
    val dec = col(valueCol).cast(org.apache.spark.sql.types.DecimalType(28, 6))
    df.withColumn("__salt", saltFor(saltSrc, saltBuckets))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(dec).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).cast("double").as(s"sum_$valueCol"),
           sum(col("__pcnt")).as("n_rows"))
  }

  /** Equi-join where `big` is skewed on `keyCol`: small side is exploded
    * `saltBuckets`x, big side salted deterministically from `saltSrc`.
    * Semantics identical to `big.join(small, keyCol, "inner"|"left")`.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
                 saltSrc: Column, saltBuckets: Int,
                 joinType: String = "inner"): DataFrame = {
    // outer/right types would emit each unmatched small-side row once per
    // salt replica — only shapes where small-side rows surface solely on
    // match are semantics-preserving
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"saltedJoin preserves semantics only for inner/left joins, got $joinType")
    val saltedBig = big.withColumn("__salt", saltFor(saltSrc, saltBuckets))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(explodedSmall, Seq(keyCol, "__salt"), joinType)
      .drop("__salt")
  }
}
