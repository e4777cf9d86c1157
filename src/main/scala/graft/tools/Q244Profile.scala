package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness: stage-by-stage wall of the q244 web-pipeline chain —
  * which of the eight stages carries the latency at a given sf.
  * Usage: runMain graft.tools.Q244Profile [sfDir]
  */
object Q244Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, TextChunks, TextIndex, StratifiedSelect}
    import graft.functions.TextFunctions

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q244] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm up session + JIT on the full chain once
    t("full chain (cold)")(
      graft.queries.Curation2.q244WebPipeline(spark, sfDir).count())
    t("full chain (warm)")(
      graft.queries.Curation2.q244WebPipeline(spark, sfDir).count())

    val docs = graft.Tables.documents(spark, sfDir).filter(col("text").isNotNull)
    val extracted = docs.select(col("doc_id"), col("lang"), col("source"),
      graft.functions.Html.htmlExtract(concat(lit("<p>"), col("text"),
        lit("</p><script>nav()</script>"))).as("text"))
    t("extract only")(extracted.count())
    val flat = TextChunks.stripFrequentLines(extracted, maxDf = 5,
        carryCols = Seq("lang", "source"))
      .filter(col("cleaned").isNotNull)
      .select(col("doc_id"), col("lang"), col("source"),
        call_function("replace", col("cleaned"), lit("\n"), lit(" ")).as("text"))
    t("extract+strip")(flat.count())
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val stats = t("stats table read")(spark.table(s"graft_bigram_$tag"))
    val scored = TextIndex.docNllFromStats(flat, stats,
      keyCols = Seq("doc_id", "source"))
    t("extract+strip+nll")(scored.count())
    val ranked = StratifiedSelect.chunkedPrefix(
      scored.select("doc_id", "source", "avg_nll_u"),
      stratum = "source", primary = "avg_nll_u", desc = false,
      tieBreak = Seq(col("doc_id")), value = lit(1L), nChunks = 32)
    t("…+chunkedPrefix")(ranked.count())
    val pairs = Dedup.jaccardPairs(flat, threshold = 0.8)
    t("pairs over flat")(pairs.count())
    val labels = Dedup.contractedComponents(pairs, stitch = "star")
    t("pairs+CC")(labels.count())
    spark.stop()
  }
}
