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

  test("q131 constructs as ONE lazy plan — zero construction-time jobs") {
    // the round-8 contention lesson: q131's cost must not be spread over
    // multiple driver actions whose cache residency a loaded host can
    // break. The histogram-median formulation runs no boundary sketches:
    // building the query fires NO Spark job (the single job belongs to
    // the caller's terminal action).
    // spark.read.parquet fires a schema-inference job per call (stage
    // "parquet at Tables.scala") — inherent to any schemaless table read,
    // not query work. The assertion: construction runs NOTHING else.
    val work = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          jobStart: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val stages = jobStart.stageInfos.map(_.name).mkString(" / ")
        if (!stages.contains("parquet at Tables.scala")) work.add(stages)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Scaled.q131MadOutliers(spark, Sf0001)
      Thread.sleep(1500) // async listener bus drain
      assert(work.isEmpty,
        s"q131 construction fired query-work job(s): ${work.toArray.mkString("; ")}")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      // the abandoned construction's persist was never consumed; drop it
      spark.catalog.clearCache()
    }
  }

  test("q131 MAD agrees with driver-side medians and ignores a planted mega-doc") {
    import org.apache.spark.sql.functions._
    val out = Scaled.q131MadOutliers(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    // driver recompute for one source
    val xs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .filter(col("text").isNotNull && col("source") === "src0")
      .select(size(split(col("text"), " ")).cast("long"))
      .collect().map(_.getLong(0)).sorted
    def med(v: Seq[Double]): Double = {
      val s = v.sorted; val n = s.length
      (s((n - 1) / 2) + s(n / 2)) / 2.0
    }
    val m = med(xs.map(_.toDouble))
    val madV = med(xs.map(x => math.abs(x - m)))
    val (gm, gmad, gout) = out("src0")
    assert(gm == m && gmad == madV, s"got ($gm, $gmad) want ($m, $madV)")
    assert(gout == xs.count(x => math.abs(x - m) > 3.0 * madV))
    // robustness (the reason MAD earns its pass): on the pooled corpus
    // (src0 alone is ~5 docs at sf0.001 — any order statistic moves
    // there), one 100k-token mega-doc barely moves the median/MAD fence
    // while it drags the mean by hundreds of tokens
    val all = spark.read.parquet(s"$Sf0001/documents.parquet")
      .filter(col("text").isNotNull)
      .select(size(split(col("text"), " ")).cast("long"))
      .collect().map(_.getLong(0).toDouble).toSeq
    val (mAll, spiked) = (med(all), all :+ 100000.0)
    val m2 = med(spiked)
    val madAll = med(all.map(x => math.abs(x - mAll)))
    val mad2 = med(spiked.map(x => math.abs(x - m2)))
    assert(math.abs(m2 - mAll) <= 2.0 && math.abs(mad2 - madAll) <= 2.0,
      s"median/MAD moved: ($mAll, $madAll) -> ($m2, $mad2)")
    val meanShift = spiked.sum / spiked.length - all.sum / all.length
    assert(meanShift > 100.0, s"mean should have been dragged, shift $meanShift")
  }
}
