package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness: decomposes q167's cost — edge construction vs the
  * PageRank rounds vs top-k — the measurements behind Graph.scala's
  * persist/broadcast/laziness choices (per-round localCheckpoint and
  * per-round meta joins were measured here and rejected).
  */
object PrProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    graft.Tables.lineitem(spark, dir).count() // FS warm-up
    for (i <- 1 to 3) {
      spark.sharedState.cacheManager.clearCache()
      time(s"q167 full, run $i")(
        graft.queries.Signals.q167PageRank(spark, dir).collect())
    }
    spark.sharedState.cacheManager.clearCache()
    val sc0 = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey").cast("long") * 2).as("sk"),
        (col("o_custkey").cast("long") * 2 + 1).as("ck"))
      .distinct().persist()
    time("edge pairs materialized alone")(sc0.count())
    val edges = sc0.select(col("sk").as("src"), col("ck").as("dst"))
      .union(sc0.select(col("ck").as("src"), col("sk").as("dst")))
    val pr = time("operator construction (decorated-edge cache + n)")(
      graft.operators.Graph.fixedPointPageRank(edges, 3))
    time("3 lazy rounds fused into one action")(pr.count())
    sc0.unpersist()
  }
}
