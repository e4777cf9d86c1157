package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cleaning

/** Star-schema construction — reference `create_dimension_tables` +
  * `create_fact_tables` (/root/reference/main.py:204-349): four dimensions
  * (two literal, two derived) and two fact tables, with dense 1..N surrogate
  * keys and synthesized 2022 history rows for the energy fact.
  *
  * Surrogate keys use `row_number` over an explicit `SUBURB` ordering —
  * deterministic, unlike `monotonically_increasing_id` (SURVEY.md §2.7 K1).
  * The reference's ids follow pandas insertion order, which its own golden
  * files prove unstable across revisions (SURVEY §5); parity tests compare
  * on business keys. The global window only ever sees dimension-sized row
  * counts (suburbs), never fact-sized data.
  */
object StarSchema {

  final case class Dims(time: DataFrame, suburb: DataFrame,
                        vehicleType: DataFrame, fuelType: DataFrame)

  def timeDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((2022, 2022, false), (2023, 2023, true))
      .toDF("id_time", "YEAR", "IS_CURRENT_YEAR")
  }

  def fuelTypeDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1, "BEV", "Battery Electric Vehicle"),
      (2, "PHEV", "Plug-in Hybrid Electric Vehicle"))
      .toDF("id_fuel_type", "FUEL_TYPE", "FUEL_DESCRIPTION")
  }

  /** main.py:217-221 — one row per merged suburb, dense ids. */
  def suburbDim(finalDf: DataFrame): DataFrame =
    finalDf.select(col("SUBURB").as("SUBURB_NAME"))
      .withColumn("id_suburb", row_number().over(Window.orderBy("SUBURB_NAME")))
      .select("id_suburb", "SUBURB_NAME")

  /** main.py:224-228 — sorted distinct raw VEHICLE_TYPE over ALL fuel types
    * (the reference passes the unfiltered extract frame).
    */
  def vehicleTypeDim(evRaw: DataFrame): DataFrame =
    evRaw.select(col("VEHICLE_TYPE")).distinct()
      .withColumn("id_vehicle_type", row_number().over(Window.orderBy("VEHICLE_TYPE")))
      .select("id_vehicle_type", "VEHICLE_TYPE")

  def dims(spark: SparkSession, finalDf: DataFrame, evRaw: DataFrame): Dims =
    Dims(timeDim(spark), suburbDim(finalDf), vehicleTypeDim(evRaw), fuelTypeDim(spark))

  /** Left-join the suburb dimension back onto the merged frame to pick up
    * `id_suburb` (main.py:245-251; keeps both key columns like pandas).
    */
  def withKeys(finalDf: DataFrame, suburbDim: DataFrame): DataFrame =
    finalDf.join(broadcast(suburbDim),
      finalDf("SUBURB") === suburbDim("SUBURB_NAME"), "left")

  /** main.py:254-267 — EV impact fact (2023 only), scrubbed and rounded. */
  def evImpactFact(withKeys: DataFrame): DataFrame = {
    val base = withKeys.select(
      col("id_suburb"),
      lit(2023).as("YEAR"),
      col("TOTAL_EVs").cast("double").as("TOTAL_EVS"),
      col("BEV_COUNT").cast("double").as("BEV_COUNT"),
      col("PHEV_COUNT").cast("double").as("PHEV_COUNT"),
      col("AVG_RANGE_KM"), col("AVG_PRICE"), col("EV_ADOPTION_SCORE"))
    val scrubbed = Cleaning.round6(Cleaning.scrubDoubles(base))
    scrubbed
      .withColumn("fact_ev_impact_id", row_number().over(Window.orderBy("id_suburb")))
      .select("fact_ev_impact_id", "id_suburb", "YEAR", "TOTAL_EVS", "BEV_COUNT",
              "PHEV_COUNT", "AVG_RANGE_KM", "AVG_PRICE", "EV_ADOPTION_SCORE")
  }

  /** main.py:270-343 — energy/pollution fact: 2023 rows plus synthesized
    * 2022 history rows with the safe-division guards (main.py:304-331).
    * Ids: 2023 rows take 1..N, 2022 rows N+1..2N — realized as one
    * row_number over the unioned frame ordered by (YEAR desc, id_suburb),
    * which reproduces the reference's continuation exactly (SURVEY §7.3.8).
    */
  def energyPollutionFact(withKeys: DataFrame): DataFrame = {
    val y2023 = withKeys.select(
      col("id_suburb"),
      lit(2023).as("YEAR"),
      col("CONSUMPTION_2023").as("ENERGY_CONSUMPTION"),
      col("CONSUMPTION_CHANGE_PCT").as("ENERGY_CHANGE_PCT"),
      col("NO2_2023").as("NO2_LEVEL"),
      col("NO2_CHANGE"), col("NO2_CHANGE_PCT"),
      col("EV_PER_ENERGY_UNIT"),
      col("NO2_PER_EV"))

    val y2022 = withKeys.select(
      col("id_suburb"),
      lit(2022).as("YEAR"),
      col("CONSUMPTION_2022").as("ENERGY_CONSUMPTION"),
      lit(0.0).as("ENERGY_CHANGE_PCT"),
      col("NO2_2022").as("NO2_LEVEL"),
      lit(0.0).as("NO2_CHANGE"), lit(0.0).as("NO2_CHANGE_PCT"),
      Cleaning.safeRatio(col("TOTAL_EVs"), col("CONSUMPTION_2022") / 1000000.0,
        col("CONSUMPTION_2022") > 0).as("EV_PER_ENERGY_UNIT"),
      Cleaning.safeRatio(col("NO2_2022"), col("TOTAL_EVs"),
        col("TOTAL_EVs") > 0).as("NO2_PER_EV"))

    val unioned = Cleaning.round6(Cleaning.scrubDoubles(y2023.unionByName(y2022)))
    unioned
      .withColumn("fact_energy_pollution_id",
        row_number().over(Window.orderBy(col("YEAR").desc, col("id_suburb"))))
      .select("fact_energy_pollution_id", "id_suburb", "YEAR", "ENERGY_CONSUMPTION",
              "ENERGY_CHANGE_PCT", "NO2_LEVEL", "NO2_CHANGE", "NO2_CHANGE_PCT",
              "EV_PER_ENERGY_UNIT", "NO2_PER_EV")
  }
}
