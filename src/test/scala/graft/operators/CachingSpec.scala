package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the scoped-release contract: every declared query that persists an
  * intermediate leaves `sharedState.cacheManager` EMPTY once its terminal
  * action completes — repeated invocation in a long-lived session must not
  * accumulate cache entries (the round-8 "already cached" leak).
  * Listener delivery is async, so emptiness is awaited, not asserted
  * immediately.
  */
class CachingSpec extends SparkSpecBase {

  private def awaitCacheEmpty(clue: String): Unit = {
    val deadline = System.currentTimeMillis() + 30000
    while (!spark.sharedState.cacheManager.isEmpty &&
           System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(spark.sharedState.cacheManager.isEmpty,
      s"$clue: cache entries still registered after the terminal action")
  }

  test("releaseAfterConsumed frees the cache after the consuming action") {
    spark.catalog.clearCache()
    val cached = spark.range(1000).toDF("id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val res = Caching.releaseAfterConsumed(
      cached.agg(sum("id").as("s")), cached)
    assert(!spark.sharedState.cacheManager.isEmpty, "persist must register")
    assert(res.head().getLong(0) === 499500L)
    awaitCacheEmpty("direct helper use")
  }

  test("an unrelated action does not release the cache early") {
    spark.catalog.clearCache()
    val cached = spark.range(100).toDF("id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val res = Caching.releaseAfterConsumed(
      cached.agg(count(lit(1)).as("n")), cached)
    // unrelated actions before the consuming one — the listener must not
    // match them (subtree sameResult gate)
    spark.range(10).count()
    spark.range(20).toDF("id").agg(sum("id")).collect()
    Thread.sleep(1000) // let any (wrong) async release land
    assert(!spark.sharedState.cacheManager.isEmpty,
      "unrelated action must not release the cache")
    assert(res.head().getLong(0) === 100L)
    awaitCacheEmpty("after the real consumer")
  }

  test("repeated q131 invocations leave no cache entries behind") {
    spark.catalog.clearCache()
    (1 to 3).foreach { _ =>
      val out = graft.queries.Scaled.q131MadOutliers(spark, Sf0001)
      assert(out.count() > 0)
    }
    awaitCacheEmpty("q131 × 3")
  }

  test("q102 and mutualTop1 release their persists after the action") {
    spark.catalog.clearCache()
    assert(graft.queries.Scaled.q102ProfileBanded(spark, Sf0001).count() === 4L)
    awaitCacheEmpty("q102")
    val emb = graft.Tables.embeddings(spark, Sf0001)
    val pairs = Similarity.mutualTop1(
      emb.filter(col("label") === 0), emb.filter(col("label") === 1))
    assert(pairs.count() > 0)
    awaitCacheEmpty("mutualTop1")
  }
}
