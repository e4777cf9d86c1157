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
      graft.functions.WordGramHashes.wordGramHashes(col("text"), 1).as("xh"))
    t("sets only")(withSets.agg(sum(size(col("xh")))).collect())
    val withSig = withSets
      .withColumn("sig", graft.functions.MinHashSig.minhashSig(col("xh"), 32))
      .select(col("doc_id"), col("sig"))
    t("sets+sig")(withSig.agg(sum(size(col("sig")))).collect())
    val candidates = Dedup.lshCandidates(withSig, bands = 8, rows = 4, minBandCollisions = 2)
    println(s"[q25] candidates: ${t("candidates")(candidates.count())}")
    // bucket-size distribution: what does a cap cost/buy?
    val buckets = withSig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(7)),
        i => hash(slice(col("sig"), i * 4 + 1, lit(4))))).as(Seq("band", "bucket")))
      .groupBy("band", "bucket").count()
    val top = buckets.orderBy(col("count").desc).limit(20).collect()
    println(s"[q25] top bucket sizes: ${top.map(_.getLong(2)).mkString(",")}")
    val pairMass = buckets.agg(sum(col("count") * (col("count") - 1) / 2)).first().getDouble(0).toLong
    println(s"[q25] total in-bucket pair mass: $pairMass")
    val full = Dedup.minhashLsh(docs, 1, 32, 8, 0.8, minBandCollisions = 2)
    println(s"[q25] verified pairs: ${t("full pipeline")(full.count())}")
    for (cap <- Seq(400, 200, 100)) {
      val capped = Dedup.minhashLsh(docs, 1, 32, 8, 0.8,
        minBandCollisions = 2, maxBucketSize = cap)
      println(s"[q25] capped($cap) pairs: ${t(s"full capped($cap)")(capped.count())}")
    }
    spark.stop()
  }
}
