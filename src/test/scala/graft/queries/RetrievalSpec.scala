package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Retrieval-chain queries (q158-q161): structural properties the DuckDB
  * oracle cannot express — rank integrity across the two stages, budget
  * monotonicity, rule consistency, weight normalization, and the
  * shuffle-free plan contract for the scan-only rule filter.
  */
class RetrievalSpec extends SparkSpecBase with AdaptiveSparkPlanHelper {

  private val sf = "/root/testdata/sf0.001"

  test("q158: ranks are dense from 1, rerank order follows cos_prf desc") {
    val rows = Retrieval.q158HybridRetrieval(spark, sf)
      .orderBy("rrank").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getAs[Int]("rrank")).toSeq == (1 to rows.length))
    // brank values come from the candidate stage: all within the top-20
    assert(rows.forall(r => r.getAs[Int]("brank") >= 1 && r.getAs[Int]("brank") <= 20))
    val cos = rows.map(_.getAs[Double]("cos_prf")).toSeq
    assert(cos == cos.sorted.reverse, "rerank must be cosine-descending")
  }

  test("q159: packing admits exactly the budget-prefix of q158's ranking") {
    val packed = Retrieval.q159ContextPack(spark, sf).orderBy("rrank").collect()
    assert(packed.nonEmpty)
    // cum_before is the running sum of the PREVIOUS rows' n_tokens and
    // every admitted row starts under the 200-token budget
    var cum = 0L
    packed.foreach { r =>
      assert(r.getAs[Long]("cum_before") == cum)
      assert(cum < 200L)
      cum += r.getAs[Long]("n_tokens")
    }
    // the packed set is a PREFIX of the rerank order (no rank skipped)
    val ranks = packed.map(_.getAs[Int]("rrank")).toSeq
    assert(ranks == (1 to ranks.length))
  }

  test("q160: keep is exactly the conjunction of its reported rule columns") {
    val rows = Retrieval.q160GopherRules(spark, sf).collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      val expect = r.getAs[Int]("n_words") >= 25 && r.getAs[Int]("n_words") <= 80 &&
        r.getAs[Double]("mean_wlen") >= 4.0 && r.getAs[Double]("mean_wlen") <= 5.0 &&
        r.getAs[Double]("distinct_ratio") >= 0.45 && r.getAs[Boolean]("has_stop")
      assert(r.getAs[Boolean]("keep") == expect, s"rule mismatch for $r")
    }
    // the rule set must discriminate: both outcomes occur on the fixture
    assert(rows.exists(_.getAs[Boolean]("keep")) && rows.exists(!_.getAs[Boolean]("keep")))
  }

  test("q160 plan is scan-only: no shuffle exchange anywhere") {
    val plan = Retrieval.q160GopherRules(spark, sf)
      .queryExecution.executedPlan
    assert(collectWithSubqueries(plan) { case e: ShuffleExchangeExec => e }.isEmpty,
      "rule filter must be a pure projection over the scan")
  }

  test("q161: temperature weights normalize and compress the distribution") {
    val rows = Retrieval.q161TemperatureMix(spark, sf).collect()
    assert(rows.length > 1)
    val w = rows.map(_.getAs[Double]("temp_weight"))
    assert(math.abs(w.sum - 1.0) < 1e-4, s"weights sum to ${w.sum}")
    // alpha=0.5 compresses the distribution: weight order still follows
    // token order, but the upsample multiplier is non-increasing in source
    // size — smaller sources are boosted relative to larger ones
    val bySize = rows.sortBy(_.getAs[Long]("n_tokens"))
    val ws = bySize.map(_.getAs[Double]("temp_weight"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a <= b + 1e-9 },
      "temp_weight must be non-decreasing in n_tokens")
    val ux = bySize.map(_.getAs[Double]("upsample_x"))
    assert(ux.zip(ux.tail).forall { case (a, b) => a >= b - 1e-9 },
      "upsample_x must be non-increasing in n_tokens")
    assert(ux.head > ux.last, "the boost must actually discriminate by size")
  }

  test("retrievalProbeStream: streamed probes are batch-equal to q164") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
      rows.map(r => Seq(r.getAs[Long]("doc_id"), r.getAs[Int]("brank"),
        r.getAs[Int]("rrank"), r.getAs[Double]("bm25"),
        r.getAs[Double]("cos_prf")).mkString("|")).toSeq.sorted

    val batch164 = canon(Retrieval.q164RetrievalIndexed(spark, sf).collect())
    val altTerms = Seq("hash", "join", "scan")
    val batchAlt = canon(Retrieval.hybridIndexed(spark, sf, altTerms).collect())

    val results = scala.collection.mutable.Map.empty[Long, Seq[String]]
    val input = MemoryStream[(Long, Seq[String])]
    val q = Retrieval.retrievalProbeStream(spark, sf,
      input.toDF().toDF("query_id", "terms"),
      (df, _) => df.collect().groupBy(_.getAs[Long]("query_id")).foreach {
        case (qid, rows) => results.synchronized { results(qid) = canon(rows) }
      })
    try {
      // two micro-batches: the serving loop answers each request from the
      // SAME persisted index the batch path probes
      input.addData((1L, Retrieval.QueryTerms)); q.processAllAvailable()
      input.addData((2L, altTerms)); q.processAllAvailable()
      assert(results.keySet == Set(1L, 2L))
      assert(results(1L) == batch164,
        "streamed q164-terms probe must equal the batch q164 result exactly")
      assert(results(2L) == batchAlt,
        "streamed alt-terms probe must equal its batch chain exactly")
      assert(results(1L) != results(2L),
        "the two probes must actually retrieve different result sets")
    } finally q.stop()
  }
}
