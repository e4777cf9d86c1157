package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (BASELINE.json north star; cf. the distributed top-k literature in
  * /root/repo/PAPERS.md — REPOSE ICDE'21 partitions by locality-sensitive
  * reference points exactly like the bucket/cell keys here, and the EDBT'20
  * incremental top-k work motivates keeping the per-query state small
  * enough to re-rank instead of re-scan). Paths:
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
  *
  * Norms are computed ONCE per vector before pairing (cosine = dot /
  * (norm_a * norm_b)); the dot kernel is the codegen'd DotProduct
  * expression. Both preserve the exact float semantics of
  * dot/(sqrt(dot_aa)*sqrt(dot_bb)).
  */
object Similarity {

  /** Exact cosine top-k for queries vec_id < maxQueryId. Deterministic:
    * ties break on vec_id.
    */
  def bruteForceTopK(emb: DataFrame, k: Int, maxQueryId: Long): DataFrame = {
    val v = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
    val q = v.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qnrm"))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qe"), col("e")) / (col("qnrm") * col("nrm")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
              round(col("cos"), 6).as("cos_sim"))
  }

  /** Hyperplane-LSH bucketed ANN: vectors sharing the sign signature of
    * nBits pseudo-random hyperplanes land in one bucket; queries search only
    * their own bucket. The cheapest scale path when recall can be traded
    * hardest (bucket count 2^nBits); exposed mainly as the third point on
    * the exact -> IVF -> LSH cost/recall spectrum.
    */
  def lshTopK(emb: DataFrame, k: Int, maxQueryId: Long, nBits: Int = 4): DataFrame = {
    val v = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
      .withColumn("bucket", graft.functions.VectorFunctions.hyperplaneSignature(col("e"), nBits))
    val q = v.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
              col("nrm").as("qnrm"), col("bucket"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    v.join(q, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qe"), col("e")) / (col("qnrm") * col("nrm")))
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
      .withColumn("nrm", norm(col("e")))
    val centroids = v.filter(col("vec_id") < nList)
      .select(col("vec_id").as("cid"), col("e").as("ce"), col("nrm").as("cnrm"))

    // Assign each corpus vector to its single nearest centroid: map-only
    // after the centroid broadcast — the argmax is a greatest() fold over
    // nList (cid, sim) structs, no shuffle and no window.
    val simToCentroid = (cid: org.apache.spark.sql.Column, ce: org.apache.spark.sql.Column,
                         cnrm: org.apache.spark.sql.Column) =>
      dot(col("e"), ce) / (col("nrm") * cnrm)
    val assigned = v.crossJoin(broadcast(centroids))
      .withColumn("cdist", simToCentroid(col("cid"), col("ce"), col("cnrm")))
      .groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("cdist"), -col("cid"))).as("cid"),
           first(col("e")).as("e"), first(col("nrm")).as("nrm"))

    // Each query probes its nProbe closest cells.
    val q = v.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qnrm"))
    val wProbe = Window.partitionBy("qid").orderBy(col("qdist").desc, col("cid"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("qdist", dot(col("qe"), col("ce")) / (col("qnrm") * col("cnrm")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nProbe)
      .select(col("qid"), col("qe"), col("qnrm"), col("cid"))

    // Candidate join keyed on cell id, then per-query top-k.
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    probes.join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qe"), col("e")) / (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
              round(col("cos"), 6).as("cos_sim"))
  }
}
