package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions

/** Stage-by-stage timing of the MinHash-LSH pipeline at a given sf, using
  * Dedup's own stage functions (q25 parameters: shingleSize=1, numHashes=32,
  * bands=8, minBandCollisions=2) so the profile measures the shipped code.
  */
object Q25Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    val docs = graft.Tables.documents(spark, sfDir).filter(col("lang") === "en")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q25] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    t("warm docs count")(docs.count())
    // mirror of minhashLsh's shipped stages: sorted hashed sets + the
    // MinHashSig codegen kernel
    val withSets = docs.select(col("doc_id"),
      array_sort(array_distinct(transform(
        TextFunctions.shingles(col("text"), 1), s => xxhash64(s)))).as("xh"))
    t("sets only")(withSets.agg(sum(size(col("xh")))).collect())
    val withSig = withSets
      .withColumn("sig", graft.functions.MinHashSig.minhashSig(col("xh"), 32))
      .select(col("doc_id"), col("sig"))
    t("sets+sig")(withSig.agg(sum(size(col("sig")))).collect())
    val candidates = Dedup.lshCandidates(withSig, bands = 8, rows = 4, minBandCollisions = 2)
    println(s"[q25] candidates: ${t("candidates")(candidates.count())}")
    val full = Dedup.minhashLsh(docs, 1, 32, 8, 0.8, minBandCollisions = 2)
    println(s"[q25] verified pairs: ${t("full pipeline")(full.count())}")
    spark.stop()
  }
}
