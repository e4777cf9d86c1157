package graft.tools

import org.apache.spark.sql.functions._

/** Stage timing for q234's banded gate: exact-count algebra side vs the
  * two-level-quantized cells walk vs the label joins — isolates which of
  * the round-17 reshapes carries the sf0.1 wall.
  */
object Q234Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q234] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = graft.Tables.embeddings(spark, sfDir)
    emb.count() // file listing / footer warm
    val nExact = graft.operators.Dedup.embeddingNearDupCount(emb, 0.3)
    t("exact-count algebra cold")(nExact.count())
    t("exact-count algebra warm")(nExact.count())
    val oldExact = graft.operators.Dedup.embeddingNearDups(emb, 0.3)
    t("old exact pair walk cold")(oldExact.count())
    t("old exact pair walk warm")(oldExact.count())
    val cellsFlat = graft.operators.Dedup.embeddingNearDupsCells(emb, 0.3,
      nList = 16, nProbe = 4, maxBlockSize = 1 << 20)
    t("cells walk flat cold")(cellsFlat.count())
    t("cells walk flat warm")(cellsFlat.count())
    val cells2L = graft.operators.Dedup.embeddingNearDupsCells(emb, 0.3,
      nList = 16, nProbe = 4, maxBlockSize = 1 << 20, nSuper = 4, cSuper = 3)
    t("cells walk two-level cold")(cells2L.count())
    t("cells walk two-level warm")(cells2L.count())
    val lbl = emb.select(col("vec_id"), col("label"))
    val found = cells2L
      .join(lbl.select(col("vec_id").as("vec_id_a"), col("label").as("__la"))
        .hint("shuffle_hash"), Seq("vec_id_a"))
      .join(lbl.select(col("vec_id").as("vec_id_b"), col("label").as("__lb"))
        .hint("shuffle_hash"), Seq("vec_id_b"))
      .filter(col("__la") === col("__lb"))
      .agg(count(lit(1)).as("n_found"))
    t("cells + label joins + agg cold")(found.count())
    t("cells + label joins + agg warm")(found.count())
    val full = graft.queries.Extensions.q234EmbedNeardupCellBanded(spark, sfDir)
    t("full q234 cold")(full.count())
    t("full q234 warm")(full.count())
    t("full q234 warm2")(full.count())
    spark.stop()
  }
}
