package graft.tools

import org.apache.spark.sql.functions._

/** Stage timing for q138's semantic-dedup chain at a given sf. */
object Q138Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q138] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = graft.Tables.embeddings(spark, sfDir)
    val blockedPairs = graft.operators.Dedup.embeddingNearDups(emb, 0.3)
      .select(col("label"), col("vec_id_a").as("doc_id_a"),
        col("vec_id_b").as("doc_id_b"))
    val pairs = blockedPairs.select("doc_id_a", "doc_id_b")
    println(s"[q138] n_pairs ${t("pairs cold")(pairs.count())}")
    t("pairs warm")(pairs.count())
    // the cell-blocked pair walk q138 actually runs since round 13
    val cellPairs = graft.operators.Dedup.embeddingNearDupsCells(emb, 0.3,
        nList = 16, nProbe = 4, maxBlockSize = 1 << 20)
      .select(col("vec_id_a").as("doc_id_a"), col("vec_id_b").as("doc_id_b"))
    println(s"[q138] n_cell_pairs ${t("cell pairs cold")(cellPairs.count())}")
    t("cell pairs warm")(cellPairs.count())
    t("cc contracted-star over cell pairs")(graft.operators.Dedup
      .contractedComponents(cellPairs, stitch = "star").count())
    val (starLabels, rounds) = graft.operators.Dedup.starComponents(pairs)
    t("cc star")(starLabels.count())
    println(s"[q138] star rounds: $rounds")
    t("cc prop")(graft.operators.Dedup.connectedComponents(pairs).count())
    val comp = starLabels.groupBy("component").count()
      .agg(max("count"), count(lit(1))).collect()(0)
    println(s"[q138] biggest cluster ${comp.getLong(0)}, n clusters ${comp.getLong(1)}")
    val docs = graft.Tables.documents(spark, sfDir)
    val scored = docs
      .join(emb.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_semi")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
    t("scored")(scored.count())
    t("keepBest star")(graft.operators.Dedup
      .keepBest(scored, pairs, algorithm = "star").count())
    val labels = graft.operators.Dedup.blockedComponents(blockedPairs, "label")
    t("cc blocked")(labels.count())
    // isolates the argmax stage (the blocked labels recompute inside the
    // same lazy plan, already priced by the line above)
    t("argmax over blocked labels")(
      graft.operators.Dedup.keepBestLabeled(scored, labels).count())
    spark.stop()
  }
}
