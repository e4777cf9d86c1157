package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (BASELINE.json north star). Two paths:
  *
  *  - `bruteForceTopK`: exact cosine top-k. The (small) query set is
  *    broadcast against the corpus — one scan, no corpus shuffle; the
  *    per-query top-k runs through a window over qid (k rows per query
  *    survive the rank filter). This is the correctness baseline and also
  *    the right plan at scale when |queries| is small.
  *  - `ivfTopK`: the scale path — a coarse quantizer (nList centroid
  *    vectors) assigns every corpus vector to its nearest cell (map-only);
  *    queries probe only their nProbe closest cells, so the candidate join
  *    is keyed on cell id and touches ~nProbe/nList of the corpus.
  */
object Similarity {

  /** Exact cosine top-k for queries selected by `queryPred`. Deterministic:
    * ties break on vec_id.
    */
  def bruteForceTopK(emb: DataFrame, k: Int, maxQueryId: Long): DataFrame = {
    val v = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
    val q = v.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", cosine(col("qe"), col("e")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
              round(col("cos"), 6).as("cos_sim"))
  }

  /** IVF-style ANN: centroids = the first nList corpus vectors (a
    * deterministic stand-in for k-means at fixture scale; the operator shape
    * — assign, probe, candidate-join on cell id — is the 100 TB design).
    */
  def ivfTopK(emb: DataFrame, k: Int, maxQueryId: Long,
              nList: Int = 16, nProbe: Int = 4): DataFrame = {
    val v = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
    val centroids = v.filter(col("vec_id") < nList)
      .select(col("vec_id").as("cid"), col("e").as("ce"))

    // Assign each corpus vector to its single nearest centroid (map-only
    // after the centroid broadcast).
    val wAssign = Window.partitionBy("vec_id").orderBy(col("cdist").desc, col("cid"))
    val assigned = v.crossJoin(broadcast(centroids))
      .withColumn("cdist", cosine(col("e"), col("ce")))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") === 1)
      .select(col("cid"), col("vec_id"), col("e"))

    // Each query probes its nProbe closest cells.
    val q = v.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val wProbe = Window.partitionBy("qid").orderBy(col("qdist").desc, col("cid"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("qdist", cosine(col("qe"), col("ce")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nProbe)
      .select(col("qid"), col("qe"), col("cid"))

    // Candidate join keyed on cell id, then per-query top-k.
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    probes.join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosine(col("qe"), col("e")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
              round(col("cos"), 6).as("cos_sim"))
  }
}
