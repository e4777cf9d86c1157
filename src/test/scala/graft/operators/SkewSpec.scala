package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  // 90% of rows share one hot key — the shape that melts a naive groupBy
  // reducer at scale.
  lazy val skewed = (1 to 10000).map { i =>
    val key = if (i % 10 != 0) "hot" else s"cold_${i % 7}"
    (i.toLong, key, i * 0.01)
  }.toDF("id", "k", "v")

  test("saltedSumCount equals direct aggregation exactly") {
    val direct = skewed.groupBy("k")
      .agg(sum($"v".cast("decimal(18,6)")).cast("double").as("sum_v"),
           count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(skewed, Seq("k"), "v", $"id", 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("saltedJoin equals direct join") {
    val dim = Seq(("hot", "H"), ("cold_1", "C1"), ("cold_2", "C2")).toDF("k", "label")
    val direct = skewed.join(dim, Seq("k")).select("id", "label")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", $"id", 8).select("id", "label")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == direct)
    assert(direct.nonEmpty)
  }

  test("salt actually spreads the hot key") {
    val spread = skewed.filter($"k" === "hot")
      .withColumn("s", Skew.saltFor($"id", 16))
      .groupBy("s").count().collect().map(_.getLong(1))
    assert(spread.length == 16)          // all buckets hit
    assert(spread.max < 9000 * 0.2)      // no bucket holds the whole key
  }
}
