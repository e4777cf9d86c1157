package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Stage-by-stage timing of the q38 inverted-index n-gram Jaccard pipeline. */
object Q38Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    val docs = graft.Tables.documents(spark, sfDir)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q38] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    t("warm docs count")(docs.count())
    val withSets = docs.select(
      col("doc_id"), col("lang"), col("source"),
      graft.functions.WordGramHashes.wordGramHashes(col("text"), 3).as("sh"))
    t("sets only")(withSets.agg(sum(size(col("sh")))).collect())
    val posting = withSets.select(col("lang"), col("source"), col("doc_id"),
      size(col("sh")).as("sz"), explode(col("sh")).as("h"))
    println(s"[q38] postings: ${t("posting count")(posting.count())}")
    val full = graft.queries.Extensions.q38NgramJaccard(spark, sfDir)
    println(s"[q38] pairs: ${t("full pipeline")(full.count())}")
    t("full again")(full.count())
    spark.stop()
  }
}
