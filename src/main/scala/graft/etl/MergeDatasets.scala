package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Cleaning

/** Merge of the three per-suburb frames — reference `merge_datasets`
  * (/root/reference/main.py:171-202): two chained full-outer equi-joins on
  * SUBURB (the `Seq` join form coalesces the key like pandas `on=`), a
  * per-column NaN->0 fill map, and three derived metrics.
  *
  * Scale: at reference scale all three sides broadcast; at 100 TB the suburb
  * cardinality is still far below fact row counts, so these remain
  * dimension-sized joins — Catalyst/AQE picks broadcast-hash automatically.
  */
object MergeDatasets {

  val FillCols: Seq[String] = Seq(
    "TOTAL_EVs", "BEV_COUNT", "PHEV_COUNT", "AVG_RANGE_KM", "AVG_PRICE",
    "CONSUMPTION_2022", "CONSUMPTION_2023", "CONSUMPTION_CHANGE_PCT",
    "NO2_2022", "NO2_2023", "NO2_CHANGE", "NO2_CHANGE_PCT")

  def apply(evSummary: DataFrame, electricity: DataFrame, pollution: DataFrame): DataFrame = {
    val merged = evSummary
      .join(electricity, Seq("SUBURB"), "full_outer")
      .join(pollution, Seq("SUBURB"), "full_outer")
      .na.fill(0.0, FillCols)
      .na.fill(0L, Seq("TOTAL_EVs", "BEV_COUNT", "PHEV_COUNT"))

    merged
      // x/0 -> NULL here (pandas inf); scrubbed to 0 at the fact boundary.
      .withColumn("EV_PER_ENERGY_UNIT",
        col("TOTAL_EVs") / (col("CONSUMPTION_2023") / 1000000.0))
      .withColumn("NO2_PER_EV",
        col("NO2_2023") / Cleaning.zeroToOne(col("TOTAL_EVs")))
      // The change-pct columns carry pandas-style ±inf (Cleaning.pctChange),
      // which na.fill above did NOT touch (matching pandas fillna) — so the
      // score propagates ∓inf/NaN exactly as the reference does, and the
      // fact-boundary scrub lands both engines on the same 0.
      .withColumn("EV_ADOPTION_SCORE",
        col("TOTAL_EVs") * (lit(1.0) - col("NO2_CHANGE_PCT") / 100.0))
  }
}
