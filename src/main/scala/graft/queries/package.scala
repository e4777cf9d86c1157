package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the declared-query modules. */
package object queries {

  /** Order-independent double aggregation: sum through DECIMAL(28, scale)
    * and render back as double. IEEE double sums depend on partition/merge
    * order; decimal sums do not, so results are bit-identical across
    * parallelism levels AND to the DuckDB oracle running the same cast.
    * (The engine-parity contract — see SURVEY.md §8.)
    *
    * Precision 28 (not 18) is the 100x-scale headroom: with ANSI off Spark
    * returns NULL on decimal-sum overflow, so an 18-digit accumulator that
    * fits sf0.1 would silently null out a single-group sum of
    * l_extendedprice-sized values somewhere past sf100. 28 digits cover a
    * ~1e9x row-count growth over the fixtures at the same value magnitudes
    * while still fitting Spark's 128-bit unscaled representation after the
    * +10-digit sum widening (28+10 = 38 = max precision).
    */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** The chunk count the chunkedPrefix call sites derive from the
    * session's shuffle parallelism — clamped into chunkedPrefix's
    * [2, 1024] contract, so a deployment running >1024 shuffle
    * partitions degrades to the 1024-chunk sketch instead of aborting
    * on chunkedPrefix's own require (round-15 advice). 1024 chunks keep
    * the per-chunk slice ~N/1024 — still never a single-task sort.
    */
  def defaultChunks(s: org.apache.spark.sql.SparkSession): Int =
    math.min(1024,
      math.max(2, s.conf.get("spark.sql.shuffle.partitions").toInt))
}
