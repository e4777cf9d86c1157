package graft.etl

/** CLI entry point mirroring the reference's `python main.py` (E1): run the
  * full ETL over the three CSVs and materialize the six star-schema tables
  * as parquet.
  *
  * Usage: runMain graft.etl.RunPipeline <evCsv> <electricityCsv> <pollutionCsv> <outDir>
  * (defaults to the reference's data directory and /tmp/graft_star).
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val Array(ev, elec, poll, out) =
      if (args.length == 4) args
      else Array(
        "/root/reference/data/Ev_Population.csv",
        "/root/reference/data/Electricity_Consumption.csv",
        "/root/reference/data/Pollution_Index.csv",
        "/tmp/graft_star")
    val spark = graft.GraftSession.get()
    val result = Pipeline.run(spark, Pipeline.Config(ev, elec, poll, Some(out)))
    result.tables.toSeq.sortBy(_._1).foreach { case (name, _) =>
      val n = spark.read.parquet(s"$out/$name").count()
      println(s"$name: $n rows -> $out/$name")
    }
    spark.stop()
  }
}
