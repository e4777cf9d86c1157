package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the declared-query modules. */
package object queries {

  /** Order-independent double aggregation: sum through DECIMAL(18, scale)
    * and render back as double. IEEE double sums depend on partition/merge
    * order; decimal sums do not, so results are bit-identical across
    * parallelism levels AND to the DuckDB oracle running the same cast.
    * (The engine-parity contract — see SURVEY.md §8.)
    */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")
}
