package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Behavioral specs for the Scaled banded-gate family's round-6 additions;
  * their oracle rows are the primary gate, these pin the spec-level
  * invariants the oracle can't see.
  */
class ScaledQueriesSpec extends SparkSpecBase {

  test("q105: LSH recall gate passes and exact-pair count is the en block count") {
    val out = Scaled.q105LshRecallBanded(spark, Sf0001).collect()
    assert(out.length == 1)
    val row = out.head
    assert(row.getAs[Boolean]("recall_ok"),
      s"recall gate failed at sf0.001: $row")
    // the exact side must agree with q24's en-restricted pair count
    val en = graft.Tables.documents(spark, Sf0001).filter(col("lang") === "en")
    val expected = graft.operators.Dedup
      .jaccardPairs(graft.Tables.documents(spark, Sf0001), threshold = 0.8)
      .join(en.select(col("doc_id").as("doc_id_a")), Seq("doc_id_a"), "left_semi")
      .count()
    assert(row.getAs[Long]("n_exact_pairs") == expected)
  }

  test("q106: source overlap is ordered, positive, and satisfies the C(k,2) identity") {
    val out = Scaled.q106SourceOverlap(spark, Sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[String]("source_a") < r.getAs[String]("source_b")))
    assert(rows.forall(_.getAs[Long]("n_shared_fps") > 0L))
    // independent identity: total shared-fp pair mass = sum over fps of
    // C(k, 2) where k = #distinct sources carrying that fingerprint
    val totalPairs = rows.map(_.getAs[Long]("n_shared_fps")).sum
    val byFp = graft.Tables.documents(spark, Sf0001)
      .select(col("source"),
        explode(graft.functions.WinnowFingerprint.winnow(col("text"))).as("fp"))
      .groupBy("fp").agg(count_distinct(col("source")).as("k"))
      .agg(sum(expr("k * (k - 1) DIV 2")).as("pairs"))
      .head().getLong(0)
    assert(totalPairs == byFp, s"pair mass $totalPairs != C(k,2) sum $byFp")
  }
}
