package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness: recall of ivfTopK with the k-means quantizer
  * (kmeansIters > 0, the production path) vs the exact brute-force top-k
  * (q27), per SF — the measurement that picks q240's recall band. Also
  * prints the first-N-quantizer recall for reference (q28's path).
  * Usage: runMain graft.tools.KmeansProbe [kmeansIters] [nProbe]
  */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val iters = if (args.length > 0) args(0).toInt else 2
    val nProbe = if (args.length > 1) args(1).toInt else 4
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = graft.Tables.embeddings(spark, dir)
      val exact = graft.operators.Similarity
        .bruteForceTopK(emb, k = 10, maxQueryId = 8)
        .select("qid", "neighbor_id")
      def recall(approx: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val f = exact.join(approx.select(col("qid"), col("neighbor_id"),
            lit(1).as("__f")),
          Seq("qid", "neighbor_id"), "left")
          .agg(count(lit(1)), count(col("__f"))).head()
        (f.getLong(0), f.getLong(1))
      }
      val t0 = System.nanoTime()
      val (ne, nfKm) = recall(graft.operators.Similarity.ivfTopK(
        emb, k = 10, maxQueryId = 8, nList = 16, nProbe = nProbe,
        kmeansIters = iters))
      val kmS = (System.nanoTime() - t0) / 1e9
      val (_, nfFirst) = recall(graft.operators.Similarity.ivfTopK(
        emb, k = 10, maxQueryId = 8, nList = 16, nProbe = nProbe))
      println(f"[$sf] exact=$ne kmeans($iters,p$nProbe)=$nfKm " +
        f"(${nfKm.toDouble / ne}%.3f, $kmS%.1fs) firstN=$nfFirst " +
        f"(${nfFirst.toDouble / ne}%.3f)")
    }
    spark.stop()
  }
}
