package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join — the equi-join rewrite of the time-window join
  * `b.ts ∈ [p.ts - window, p.ts)` that event-analytics and feature-
  * engineering pipelines run constantly (e.g. "purchases in the 2 h before
  * each click").
  *
  * Why not express the predicate directly: Catalyst plans a pure
  * inequality join (even with an equi key, the range residual on top of a
  * skewed key) and at worst falls back to BroadcastNestedLoopJoin — O(n·m)
  * comparisons and a broadcast of a fact table. The standard scale shape
  * is binning: floor-divide both sides' event times into bins exactly one
  * window wide. A build row in bin c can only match probe rows in bins c
  * or c+1, so exploding each build row to those two bin keys turns the
  * range predicate into ONE hash equi-join on (key, bin) + a cheap exact
  * residual filter. Cost: 2× the build rows through one shuffle, never a
  * nested loop; bin width = window keeps the candidate set minimal.
  * (Same family as Dedup's LSH banding: coarse equi-bucket, exact verify.)
  */
object RangeJoin {

  /** Inner-join `probe` to the `build` rows whose `buildTs` falls in
    * `[probeTs - windowUs, probeTs)`, equi-keyed on `key`.
    *
    * `build`'s non-key column names must be disjoint from `probe`'s
    * (rename before calling — keeps the operator free of silent column
    * shadowing). Timestamps compare in integral microseconds
    * (`unix_micros`); floor division is exact for any epoch sign.
    */
  def trailingWindowJoin(probe: DataFrame, build: DataFrame, key: String,
                         probeTs: String, buildTs: String,
                         windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val overlap = build.columns.toSet.intersect(probe.columns.toSet) - key
    require(overlap.isEmpty,
      s"build columns must not shadow probe columns (rename: $overlap)")
    val p = probe.withColumn("__bin", expr(s"unix_micros(`$probeTs`) div $windowUs"))
    val b = build
      .withColumn("__bbin", expr(s"unix_micros(`$buildTs`) div $windowUs"))
      // a build row in bin c serves probes in bins c and c+1
      .withColumn("__bin", explode(array(col("__bbin"), col("__bbin") + 1)))
      .drop("__bbin")
    p.join(b, Seq(key, "__bin"))
      .filter(unix_micros(col(buildTs)) >= unix_micros(col(probeTs)) - windowUs &&
              unix_micros(col(buildTs)) <  unix_micros(col(probeTs)))
      .drop("__bin")
  }
}
