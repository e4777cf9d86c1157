package graft.tools

import org.apache.spark.sql.functions._

/** Decomposes q54's ~1.5 s at sf0.1: boundary sketch, pid tagging, the
  * (pid, stratum) window pass, the mark filter + final agg, and the
  * sampled percentile sketch — to find which stage pays for the miss of
  * the round-10 "q54 under 1 s" target.
  */
object Q54Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.StratifiedSelect
    val nChunks = spark.conf.get("spark.sql.shuffle.partitions").toInt

    def t(label: String)(f: => Any): Unit = {
      (1 to 2).foreach(_ => f)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q54] $label: min=${times.min}%.3f s runs=${times.map(x => f"$x%.3f").mkString(",")}")
    }

    def base = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))

    t("scan only")(base.count())
    t("boundary sketch acc=640") {
      val qs = (1 until nChunks).map(_.toDouble / nChunks)
      base.select(percentile_approx(col("l_extendedprice").cast("double"),
        array(qs.map(lit): _*), lit(20 * nChunks)).as("b")).head()
    }
    t("full chunkedPrefix + count") {
      StratifiedSelect.chunkedPrefix(base, "l_returnflag", "l_extendedprice",
        desc = false, tieBreak = Seq(col("l_orderkey"), col("l_linenumber")),
        value = lit(1L), nChunks = nChunks).count()
    }
    t("sampled sketch only") {
      base.filter(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(10)) === 0)
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"))
        .collect()
    }
    t("q54 full")(graft.SparkEntry.queries("q54_approx_median")(spark, sfDir).count())
    spark.stop()
  }
}

import org.apache.spark.sql.functions._
object Q54RankProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.StratifiedSelect
    val nChunks = spark.conf.get("spark.sql.shuffle.partitions").toInt
    def t(label: String)(f: => Any): Unit = {
      (1 to 2).foreach(_ => f)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q54r] $label: min=${times.min}%.3f s")
    }
    def base = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
    t("stratumRanks construct+count") {
      StratifiedSelect.stratumRanks(base, "l_returnflag", "l_extendedprice",
        desc = false, tieBreak = Seq(col("l_orderkey"), col("l_linenumber")),
        targets = n => Seq((n + 1) / 2, (n + 2) / 2, (2 * n + 4) / 5, (3 * n + 4) / 5),
        nChunks = nChunks).count()
    }
    val sr = StratifiedSelect.stratumRanks(base, "l_returnflag", "l_extendedprice",
      desc = false, tieBreak = Seq(col("l_orderkey"), col("l_linenumber")),
      targets = n => Seq((n + 1) / 2, (n + 2) / 2, (2 * n + 4) / 5, (3 * n + 4) / 5),
      nChunks = nChunks)
    t("re-count cached construct")(sr.count())
    println(sr.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
