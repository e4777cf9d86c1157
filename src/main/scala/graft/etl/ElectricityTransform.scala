package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Cleaning

/** Electricity consumption transform — reference `transform_electricity_data`
  * (/root/reference/main.py:83-108): project the two fiscal-year columns,
  * rename, split composite suburb names on `+` keeping the first token
  * (main.py:101), and compute the year-over-year change percentage.
  *
  * Division semantics: `CONSUMPTION_2022 == 0` yields pandas-style ±inf via
  * Cleaning.pctChange (NULL only for 0/0 or missing, like pandas NaN) —
  * fills touch only the NULLs and the fact-boundary scrub zeroes the infs,
  * step-for-step like the reference (SURVEY.md §7.3.3).
  */
object ElectricityTransform {
  def apply(elecRaw: DataFrame): DataFrame =
    elecRaw
      .select(
        col("Name").as("SUBURB"),
        Cleaning.coerceDouble(col("F2021_22")).as("CONSUMPTION_2022"),
        Cleaning.coerceDouble(col("F2022_23")).as("CONSUMPTION_2023"))
      .withColumn("SUBURB", trim(split(col("SUBURB"), "\\+").getItem(0)))
      .withColumn("CONSUMPTION_CHANGE_PCT",
        Cleaning.pctChange(col("CONSUMPTION_2022"), col("CONSUMPTION_2023")))
}
