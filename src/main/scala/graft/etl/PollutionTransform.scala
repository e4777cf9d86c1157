package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NO2 pollution transform — reference `transform_pollution_data`
  * (/root/reference/main.py:110-169): name-pattern projection of the
  * `* NO2 annual average [pphm]` columns, wide->long melt, suburb extraction
  * via regex + title-casing, a 7-entry measurement-site -> suburb lookup,
  * year filter, and a long->wide mean pivot over (SUBURB, YEAR).
  *
  * Spark-first notes:
  *  - the melt is `Dataset.unpivot` (one narrow pass, no shuffle);
  *  - the dict lookup (main.py:134-146) becomes an inner broadcast join
  *    against a 7-row literal frame — the inner join performs the
  *    reference's filter-to-mapped-keys AND the rename in one step;
  *  - the pivot uses an explicit year list so the plan is deterministic
  *    (SURVEY.md §7.3.6).
  */
object PollutionTransform {

  /** Measurement site (title-cased) -> suburb (main.py:134-142). */
  val SuburbMapping: Seq[(String, String)] = Seq(
    "Alexandria"       -> "Alexandria",
    "Rozelle"          -> "Rozelle",
    "Earlwood"         -> "Earlwood",
    "Cook And Phillip" -> "Sydney",
    "Randwick"         -> "Randwick",
    "Macquarie Park"   -> "Macquarie Park",
    "Parramatta North" -> "Parramatta")

  def apply(spark: SparkSession, pollRaw: DataFrame): DataFrame = {
    import spark.implicits._
    // P3 name-pattern projection: column list computed from the schema at
    // plan-build time, exactly like main.py:115-116.
    val no2Cols = pollRaw.columns.filter(_.contains("NO2 annual average"))
    val long = pollRaw
      .unpivot(Array(col("Date")), no2Cols.map(col), "LOCATION", "NO2_LEVEL")
      .withColumn("SITE",
        initcap(lower(regexp_extract(col("LOCATION"), "(.*) NO2 annual average", 1))))

    val mapping = SuburbMapping.toDF("SITE", "SUBURB")
    val mapped = long
      .join(broadcast(mapping), Seq("SITE"), "inner") // filter + rename in one
      .withColumn("YEAR", year(to_date(col("Date"), "d/M/yyyy")))
      .filter(col("YEAR").isin(2022, 2023))
      .withColumn("NO2_LEVEL", col("NO2_LEVEL").cast("double"))

    mapped
      .groupBy("SUBURB")
      .pivot("YEAR", Seq(2022, 2023))
      .agg(avg("NO2_LEVEL"))
      .withColumnsRenamed(Map("2022" -> "NO2_2022", "2023" -> "NO2_2023"))
      .withColumn("NO2_CHANGE", col("NO2_2023") - col("NO2_2022"))
      .withColumn("NO2_CHANGE_PCT",
        graft.functions.Cleaning.pctChange(col("NO2_2022"), col("NO2_2023")))
  }
}
