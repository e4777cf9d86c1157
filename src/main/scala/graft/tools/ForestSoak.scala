package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness for the round-16 forest-mode soak: on a given fixture
  * dir, time the q25-parameter LSH walk in `all` vs `forest` pair modes,
  * verify the forest carries the full walk's exact pair count as its
  * n_pairs aggregate, and prove the two edge sets resolve to IDENTICAL
  * connected-component labels — the claim DedupSpec pins at fixture
  * scale, re-measured here at sf1 where the r15 soak spent ~772 s
  * materializing 3.69 M true pairs the resolver immediately collapsed.
  *
  * Usage: runMain graft.tools.ForestSoak <dir> [allMode]
  *   allMode=skip  — time only the forest walk (when the all-mode side
  *   is already on record, e.g. SOAK_r15_sf1.txt's q25 within-run wall).
  */
object ForestSoak {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ForestSoak <dir> [skip]")
    val dir = args.head
    val skipAll = args.length > 1 && args(1) == "skip"
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)

    def walk(mode: String) = graft.operators.Dedup.minhashLshDistinct(
      docs, shingleSize = 1, numHashes = 32, bands = 8, threshold = 0.8,
      minBandCollisions = 2, pairsMode = mode)
    def labelsOf(edges: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.contractedComponents(
        edges.select("doc_id_a", "doc_id_b"), stitch = "star")
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[forest-soak] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // forest: edge count + carried pair count + CC labels, one pass each
    val forest = walk("forest")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (fEdges, fPairs) = timed("forest walk (edges + n_pairs sum)") {
      val r = forest.agg(count(lit(1)), coalesce(sum("n_pairs"), lit(0L)))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    println(s"[forest-soak] forest edges=$fEdges carried_pairs=$fPairs")
    val fLab = timed("forest CC resolve") {
      labelsOf(forest).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val fComponents = fLab.select("component").distinct().count()
    println(s"[forest-soak] forest labeled_docs=${fLab.count()} " +
      s"components=$fComponents")

    if (!skipAll) {
      val all = walk("all")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val aPairs = timed("all walk (pair count)") { all.count() }
      println(s"[forest-soak] all pairs=$aPairs " +
        s"(forest carried_pairs ${if (aPairs == fPairs) "==" else "!="} it)")
      val aLab = timed("all CC resolve") {
        labelsOf(all).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      val mismatches = fLab.as("f")
        .join(aLab.as("a"), col("f.doc_id") === col("a.doc_id"), "full_outer")
        .filter(col("f.component").isNull || col("a.component").isNull ||
          col("f.component") =!= col("a.component"))
        .count()
      println(s"[forest-soak] label mismatches=$mismatches " +
        s"(all labeled_docs=${aLab.count()})")
      require(mismatches == 0, "forest CC labels diverged from the full walk")
      require(aPairs == fPairs, "carried pair count diverged")
    }
    spark.stop()
  }
}
