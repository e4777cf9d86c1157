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
    * shadowing). Neither input may contain the reserved temp columns
    * `__bin`/`__bbin`. Timestamps compare in integral microseconds
    * (`unix_micros`); `div` truncates toward zero (not floor), but the
    * two-bin covering invariant probe_bin ∈ {build_bin, build_bin + 1}
    * holds for either epoch sign because both sides truncate identically
    * and the match window is exactly one bin wide. A TIMESTAMP_NTZ ts
    * column — which `unix_micros` rejects — is cast to TIMESTAMP
    * (wall-clock in the session time zone); ONLY that case is widened, so
    * any other type (a raw nanosAsLong Long, a string) still fails
    * analysis loudly instead of being silently reinterpreted as epoch
    * seconds by a blanket cast.
    *
    * Join strategy is left to Catalyst/AQE deliberately: unlike a
    * posting-list explode (q38/q64, ~100× under-estimated), this explode
    * is exactly 2×, so the build side's size estimate tracks its parquet
    * scan and scales with the data — small build → broadcast (correct),
    * 100 TB build → sort-merge/shuffle-hash on (key, bin) (correct). A
    * forced hint would lock the small-scale plan into two shuffles.
    */
  def trailingWindowJoin(probe: DataFrame, build: DataFrame, key: String,
                         probeTs: String, buildTs: String,
                         windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val overlap = build.columns.toSet.intersect(probe.columns.toSet) - key
    require(overlap.isEmpty,
      s"build columns must not shadow probe columns (rename: $overlap)")
    val reserved = (probe.columns ++ build.columns).toSet
      .intersect(Set("__bin", "__bbin"))
    require(reserved.isEmpty,
      s"inputs must not contain the operator's temp columns ($reserved)")
    import org.apache.spark.sql.types.TimestampNTZType
    def usSql(df: DataFrame, c: String) =
      if (df.schema(c).dataType == TimestampNTZType)
        s"unix_micros(cast(`$c` as timestamp))"
      else s"unix_micros(`$c`)"
    val pUs = usSql(probe, probeTs)
    val bUs = usSql(build, buildTs)
    val p = probe.withColumn("__bin", expr(s"$pUs div $windowUs"))
    val b = build
      .withColumn("__bbin", expr(s"$bUs div $windowUs"))
      // a build row in bin c serves probes in bins c and c+1
      .withColumn("__bin", explode(array(col("__bbin"), col("__bbin") + 1)))
      .drop("__bbin")
    p.join(b, Seq(key, "__bin"))
      .filter(expr(s"$bUs >= $pUs - $windowUs AND $bUs < $pUs"))
      .drop("__bin")
  }
}
