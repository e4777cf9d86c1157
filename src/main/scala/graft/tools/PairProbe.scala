package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness: the fixture's exact near-dup pair graph at a threshold —
  * the measurement that picks splitStreamMinhash's spec slice (which docs
  * can be "arrivals" such that duplicate relations route through the
  * corpus). Usage: runMain graft.tools.PairProbe [sfDir] [threshold]
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val thr = if (args.length > 1) args(1).toDouble else 0.5
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir).filter(col("text").isNotNull)
    val p = graft.operators.Dedup.jaccardPairs(docs, thr)
      .select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    println(s"[pairs] n=${p.length}")
    println(p.sortBy(_._1).map { case (a, b) => s"$a-$b" }.mkString(" "))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    println(s"[docs] n=${ids.length} min=${ids.min} max=${ids.max}")
    spark.stop()
  }
}
