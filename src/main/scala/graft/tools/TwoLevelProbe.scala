package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness: recall of the TWO-LEVEL quantizer route vs the exact
  * label-blocked walk (q234's comparison) and vs the flat route, per SF —
  * the measurement that picks q234/q238's nSuper/cSuper. Usage:
  *   runMain graft.tools.TwoLevelProbe [nSuper] [cSuper]
  */
object TwoLevelProbe {
  def main(args: Array[String]): Unit = {
    val nSuper = if (args.length > 0) args(0).toInt else 4
    val cSuper = if (args.length > 1) args(1).toInt else 2
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = graft.Tables.embeddings(spark, dir)
      val exact = graft.operators.Dedup.embeddingNearDups(emb, 0.3)
        .select("vec_id_a", "vec_id_b")
      def recall(cells: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val f = exact.join(cells.select(col("vec_id_a"), col("vec_id_b"),
            lit(1).as("__f")),
          Seq("vec_id_a", "vec_id_b"), "left")
          .agg(count(lit(1)), count(col("__f"))).head()
        (f.getLong(0), f.getLong(1))
      }
      val flat = graft.operators.Dedup.embeddingNearDupsCells(emb, 0.3,
        nList = 16, nProbe = 4, maxBlockSize = 1 << 20)
      val two = graft.operators.Dedup.embeddingNearDupsCells(emb, 0.3,
        nList = 16, nProbe = 4, maxBlockSize = 1 << 20,
        nSuper = nSuper, cSuper = cSuper)
      val (ne, nfFlat) = recall(flat)
      val (_, nfTwo) = recall(two)
      println(f"[$sf] exact=$ne flat=$nfFlat (${nfFlat.toDouble / ne}%.3f) " +
        f"two($nSuper,$cSuper)=$nfTwo (${nfTwo.toDouble / ne}%.3f)")
      // q238 two-level vs flat admission delta
      val corpus = emb.filter(col("vec_id") % 7 =!= 3)
      val batch = emb.filter(col("vec_id") % 7 === 3)
      val admFlat = graft.operators.Similarity.admitEmbedding(batch,
        graft.operators.Similarity.ivfIndexFrames(corpus, 16), 0.3, 4)
      val admTwo = graft.operators.Similarity.admitEmbedding(batch,
        graft.operators.Similarity.ivfIndexFramesTwoLevel(corpus, 16, nSuper, cSuper),
        0.3, 4, nSuper = nSuper, cSuper = cSuper)
      val nb = batch.count()
      val aF = admFlat.filter(col("admitted")).count()
      val aT = admTwo.filter(col("admitted")).count()
      val diff = admFlat.select("vec_id", "admitted")
        .join(admTwo.select(col("vec_id"), col("admitted").as("a2")), "vec_id")
        .filter(col("admitted") =!= col("a2")).count()
      println(s"[$sf] q238: batch=$nb admitted flat=$aF two=$aT verdictDiff=$diff")
    }
    spark.stop()
  }
}
