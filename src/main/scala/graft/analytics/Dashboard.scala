package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Cleaning

/** Dashboard read path — reference `app.py` tabs 1-4 re-expressed as lazy
  * DataFrame computations returning presentation-sized frames. The
  * reference loads all six tables from Azure SQL and joins client-side in
  * pandas (app.py:59-109); here the star tables are parquet-backed
  * DataFrames, dims broadcast into fact joins, and the 600-second
  * `st.cache_data` becomes an explicit `.cache()` on the joined frames.
  */
final case class Dashboard(
    dimSuburb: DataFrame,
    factEvImpact: DataFrame,
    factEnergyPollution: DataFrame) {

  /** app.py:85-109 — fact ⋈ dim_suburb left joins, cached (the reference's
    * 600-second st.cache_data): each dashboard computation below re-reads
    * these frames, and without the cache every action would re-execute the
    * join (and whatever upstream ETL produced the facts).
    */
  lazy val evImpactWithSuburb: DataFrame =
    factEvImpact.join(broadcast(dimSuburb), Seq("id_suburb"), "left").cache()

  lazy val energyPollutionWithSuburb: DataFrame =
    factEnergyPollution.join(broadcast(dimSuburb), Seq("id_suburb"), "left").cache()

  /** app.py:158-175 — KPI tiles: global sums + BEV percentage. */
  def kpis: DataFrame =
    evImpactWithSuburb.agg(
      sum("TOTAL_EVS").cast("long").as("total_evs"),
      sum("BEV_COUNT").cast("long").as("bev_count"),
      sum("PHEV_COUNT").cast("long").as("phev_count"),
      (sum("BEV_COUNT") / sum("TOTAL_EVS") * 100.0).as("bev_percentage"))

  /** app.py:182 — suburbs ordered by EV count for the stacked bar. */
  def evBySuburb: DataFrame =
    evImpactWithSuburb
      .select("SUBURB_NAME", "TOTAL_EVS", "BEV_COUNT", "PHEV_COUNT")
      .orderBy(col("TOTAL_EVS").desc)

  /** app.py:231 — current-year slice of the energy/pollution fact. */
  def energy2023: DataFrame =
    energyPollutionWithSuburb.filter(col("YEAR") === 2023)

  /** app.py:266-309 — two-year drilldown for one suburb. */
  def suburbDrilldown(suburbName: String): DataFrame =
    energyPollutionWithSuburb
      .filter(col("SUBURB_NAME") === suburbName)
      .select("YEAR", "ENERGY_CONSUMPTION", "NO2_LEVEL")
      .orderBy("YEAR")

  /** app.py:312 — 2023 rows ordered by NO2 change percentage. */
  def no2ChangeSorted: DataFrame =
    energy2023.select("SUBURB_NAME", "NO2_CHANGE_PCT").orderBy("NO2_CHANGE_PCT")

  /** app.py:335-359 — fact⋈fact combination + min-max-normalized adoption
    * score with the constant-column -> 50 fallback. The global min/max is a
    * 1-row aggregate crossJoined back (broadcast by construction) rather
    * than an empty-partitionBy window, which would serialize at scale.
    */
  def combined: DataFrame = {
    val c = evImpactWithSuburb.join(
      energy2023.select("id_suburb", "ENERGY_CONSUMPTION", "NO2_LEVEL", "NO2_CHANGE_PCT"),
      Seq("id_suburb"), "left")
    val stats = c.agg(
      min("EV_ADOPTION_SCORE").as("mn"), max("EV_ADOPTION_SCORE").as("mx"))
    c.crossJoin(broadcast(stats))
      .withColumn("EV_ADOPTION_NORMALIZED",
        Cleaning.minMaxNorm(col("EV_ADOPTION_SCORE"), col("mn"), col("mx")))
      .drop("mn", "mx")
  }

  /** app.py:376-398 — radar metrics normalized to [0,100] over the SELECTED
    * suburbs, inverted for lower-is-better NO2_LEVEL / AVG_PRICE.
    */
  def radar(selectedSuburbs: Seq[String]): DataFrame = {
    val metrics = Seq("TOTAL_EVS", "AVG_RANGE_KM", "AVG_PRICE",
                      "ENERGY_CONSUMPTION", "NO2_LEVEL")
    val inverted = Set("NO2_LEVEL", "AVG_PRICE")
    val data = combined.filter(col("SUBURB_NAME").isin(selectedSuburbs: _*))
    val statCols = metrics.flatMap(m => Seq(min(m).as(s"${m}_mn"), max(m).as(s"${m}_mx")))
    val stats = data.agg(statCols.head, statCols.tail: _*)
    metrics.foldLeft(data.crossJoin(broadcast(stats))) { (d, m) =>
      d.withColumn(m,
        Cleaning.minMaxNorm(col(m), col(s"${m}_mn"), col(s"${m}_mx"), inverted(m)))
    }.select("SUBURB_NAME", metrics: _*)
  }
}

object Dashboard {

  /** Build from a pipeline output directory (the six parquet tables). */
  def fromParquet(spark: SparkSession, dir: String): Dashboard = Dashboard(
    spark.read.parquet(s"$dir/dim_suburb"),
    spark.read.parquet(s"$dir/fact_ev_impact"),
    spark.read.parquet(s"$dir/fact_energy_pollution"))

  /** app.py:505-538 — the custom-SQL surface. The reference ships user SQL
    * text to Azure SQL Server; here the six star tables are temp views and
    * Catalyst parses/optimizes/executes the text locally — a strictly more
    * capable replacement (SURVEY.md E3). T-SQL `SELECT TOP n` is rewritten
    * to `LIMIT n` for compatibility with the reference's default query.
    */
  def registerViews(tables: Map[String, DataFrame]): Unit =
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }

  /** utils/datsetup.py:125-130 — table -> JSON records (S9).
    *
    * DRIVER-SIDE MATERIALIZATION by contract: the reference API returns a
    * Python list of dicts, so this is presentation plumbing, not a data
    * path. The `maxRows` fence makes the contract enforceable instead of
    * documentary — the limit+count probe costs one bounded action, and a
    * caller pointing this at a fact-sized frame fails with sizing advice
    * instead of OOMing the driver. Raise the fence explicitly if a larger
    * presentation frame is really intended.
    */
  def toJsonRecords(df: DataFrame, maxRows: Int = 100000): Seq[String] = {
    val probe = df.limit(maxRows + 1).toJSON.collect()
    require(probe.length <= maxRows,
      s"toJsonRecords materializes on the driver and the input exceeds " +
        s"maxRows=$maxRows — this API is for presentation-sized frames " +
        "(reference S9, utils/datsetup.py:125-130); aggregate or limit " +
        "first, or raise maxRows deliberately")
    probe.toSeq
  }

  def sql(spark: SparkSession, query: String): DataFrame = {
    // (?is): the dashboard's SQL box is a multi-line text area, so the
    // rewrite must span newlines. Handles the parenthesized T-SQL form
    // `TOP (n)` and a trailing semicolon (both SSMS habits).
    val trimmed = query.trim.stripSuffix(";").trim
    val rewritten = trimmed.replaceAll(
      "(?is)^SELECT\\s+TOP\\s*\\(?\\s*(\\d+)\\s*\\)?\\s+(.*)$", "SELECT $2 LIMIT $1")
    spark.sql(rewritten)
  }
}
