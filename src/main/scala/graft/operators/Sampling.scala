package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for corpus curation — the "data
  * mixture" step of a training pipeline: downsample over-represented
  * strata (language/source/quality band) by fixed per-stratum rates.
  *
  * Sampling decisions are a pure function of the row's id: bucket =
  * first 16 bits of md5(id) mod 100 — identical on every engine that
  * agrees on md5 (Spark and the DuckDB oracle do), stable across runs,
  * partitionings, and cluster sizes, and independent per id (md5 mixes
  * fully, unlike `id % 100` which aliases any systematic id stride).
  * Map-only: no shuffle, no RNG state, nothing on the driver.
  */
object Sampling {

  /** Bucket in [0, 100) from the row id — the shared kernel. NULL ids get
    * a defined bucket (md5 of the empty string) instead of a NULL
    * predicate that would silently drop them at every rate including 100.
    */
  def hashBucket(id: Column): Column =
    (conv(substring(md5(coalesce(id.cast("string"), lit(""))), 1, 4), 16, 10)
      .cast("int") % 100).as("bucket")

  /** Keep ~pct% of rows, deterministically by id. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol)) < pct)

  /** Per-stratum keep rates (percent), e.g. Map("en" -> 100, "de" -> 50);
    * strata absent from the map keep `defaultPct`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < rate)
  }
}
