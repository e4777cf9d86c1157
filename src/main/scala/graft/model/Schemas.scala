package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Explicit StructTypes for the engine's public star schema (SURVEY §1.4) —
  * the contract the pipeline's six output tables must satisfy. Raw CSV
  * inputs deliberately have NO static schema (every column arrives as
  * string and is cast explicitly, pandas-coerce style; see CsvSource), but
  * outputs are pinned so downstream consumers and the JDBC DDL path can
  * rely on them.
  */
object Schemas {

  val DimTime: StructType = StructType(Seq(
    StructField("id_time", IntegerType, nullable = false),
    StructField("YEAR", IntegerType, nullable = false),
    StructField("IS_CURRENT_YEAR", BooleanType, nullable = false)))

  val DimSuburb: StructType = StructType(Seq(
    StructField("id_suburb", IntegerType, nullable = false),
    StructField("SUBURB_NAME", StringType)))

  val DimVehicleType: StructType = StructType(Seq(
    StructField("id_vehicle_type", IntegerType, nullable = false),
    StructField("VEHICLE_TYPE", StringType)))

  val DimFuelType: StructType = StructType(Seq(
    StructField("id_fuel_type", IntegerType, nullable = false),
    StructField("FUEL_TYPE", StringType),
    StructField("FUEL_DESCRIPTION", StringType)))

  val FactEvImpact: StructType = StructType(Seq(
    StructField("fact_ev_impact_id", IntegerType, nullable = false),
    StructField("id_suburb", IntegerType),
    StructField("YEAR", IntegerType, nullable = false),
    StructField("TOTAL_EVS", DoubleType),
    StructField("BEV_COUNT", DoubleType),
    StructField("PHEV_COUNT", DoubleType),
    StructField("AVG_RANGE_KM", DoubleType),
    StructField("AVG_PRICE", DoubleType),
    StructField("EV_ADOPTION_SCORE", DoubleType)))

  val FactEnergyPollution: StructType = StructType(Seq(
    StructField("fact_energy_pollution_id", IntegerType, nullable = false),
    StructField("id_suburb", IntegerType),
    StructField("YEAR", IntegerType, nullable = false),
    StructField("ENERGY_CONSUMPTION", DoubleType),
    StructField("ENERGY_CHANGE_PCT", DoubleType),
    StructField("NO2_LEVEL", DoubleType),
    StructField("NO2_CHANGE", DoubleType),
    StructField("NO2_CHANGE_PCT", DoubleType),
    StructField("EV_PER_ENERGY_UNIT", DoubleType),
    StructField("NO2_PER_EV", DoubleType)))

  val StarSchema: Map[String, StructType] = Map(
    "dim_time" -> DimTime,
    "dim_suburb" -> DimSuburb,
    "dim_vehicle_type" -> DimVehicleType,
    "dim_fuel_type" -> DimFuelType,
    "fact_ev_impact" -> FactEvImpact,
    "fact_energy_pollution" -> FactEnergyPollution)

  /** Column names + types must match exactly (nullability intentionally
    * lax — Spark's inference of nullable differs by construction path).
    */
  def conforms(df: DataFrame, expected: StructType): Boolean =
    df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      expected.fields.map(f => (f.name, f.dataType)).toSeq
}
