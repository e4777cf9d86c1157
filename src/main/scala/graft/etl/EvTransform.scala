package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Cleaning

/** EV population transform — reference `transform_ev_data`
  * (/root/reference/main.py:41-81), re-expressed as a single groupBy with
  * conditional aggregation: the reference's five separate groupby passes
  * (main.py:70-76) collapse into one shuffle (SURVEY.md §2.4 A4).
  */
object EvTransform {

  /** Row-level cleaning (main.py:46-64): BEV/PHEV filter, trimmed category,
    * model-year regex, price with literal `*` stripped then coerce-cast,
    * range coerce-cast, trimmed suburb.
    */
  def clean(evRaw: DataFrame): DataFrame =
    evRaw
      .filter(col("FUEL_TYPE").isin("BEV", "PHEV"))
      .withColumn("VEHICLE_CATEGORY", trim(col("VEHICLE_TYPE")))
      // pandas str.extract returns NaN on no match; Spark regexp_extract
      // returns "" -> nullif before the cast (SURVEY §7.3.5).
      .withColumn("MODEL_YEAR",
        nullif(regexp_extract(col("MODEL"), "(\\d{4})", 1), lit("")).cast("double"))
      .withColumn("PRICE", Cleaning.coerceDouble(translate(col("LISTED_PRICE"), "*", "")))
      .withColumn("RANGE_KM", Cleaning.coerceDouble(col("RANGE")))
      .withColumn("SUBURB", trim(col("SUBURB")))

  /** Per-suburb summary (main.py:67-79): total/BEV/PHEV counts + avg range
    * and price, NaN-filled with 0. COUNT(CASE) is the conditional-count
    * rewrite of the reference's filtered groupbys (main.py:72-73).
    */
  def summary(evClean: DataFrame): DataFrame =
    evClean
      .groupBy("SUBURB")
      .agg(
        count(lit(1)).as("TOTAL_EVs"),
        count(when(col("FUEL_TYPE") === "BEV", 1)).as("BEV_COUNT"),
        count(when(col("FUEL_TYPE") === "PHEV", 1)).as("PHEV_COUNT"),
        avg("RANGE_KM").as("AVG_RANGE_KM"),
        avg("PRICE").as("AVG_PRICE"))
      .na.fill(0.0)
}
