package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class SortedIntersectCountSpec extends SparkSpecBase {
  import spark.implicits._

  test("matches size(array_intersect) on random sorted distinct long arrays") {
    val g = for {
      a <- Gen.listOf(Gen.choose(-50L, 50L))
      b <- Gen.listOf(Gen.choose(-50L, 50L))
    } yield (a.distinct.sorted, b.distinct.sorted)
    val samples = (0 until 30).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))
    val df = samples.toDF("a", "b")
      .withColumn("ic", SortedIntersectCount.sortedIntersectCount(col("a"), col("b")))
      .withColumn("expected", size(array_intersect(col("a"), col("b"))))
    val bad = df.filter(col("ic") =!= col("expected")).count()
    assert(bad == 0)
  }

  test("empty and disjoint arrays") {
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L), Seq.empty[Long]),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))).toDF("a", "b")
      .select(SortedIntersectCount.sortedIntersectCount(col("a"), col("b")).as("ic"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 0, 0, 3))
  }
}

class MinHashSigSpec extends graft.SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("kernel signature is bit-identical to the HOF formulation") {
    val docs = Seq(
      (1L, Seq(11L, 22L, 33L, 44L)),
      (2L, Seq(99L)),
      (3L, (1L to 200L).toSeq)).toDF("id", "xh")
    val both = docs
      .withColumn("kernel", MinHashSig.minhashSig(col("xh"), 32))
      .withColumn("hof", graft.operators.Dedup.minhashSignatureFromHashes(col("xh"), 32))
    val bad = both.filter(col("kernel") =!= col("hof")).count()
    assert(bad == 0)
  }

  test("empty shingle set yields a NULL signature, never a colliding sentinel") {
    val docs = Seq((1L, Seq.empty[Long]), (2L, Seq.empty[Long]), (3L, Seq(7L)))
      .toDF("id", "xh")
      .withColumn("sig", MinHashSig.minhashSig(col("xh"), 8))
    val rows = docs.orderBy("id").collect()
    assert(rows(0).isNullAt(2) && rows(1).isNullAt(2))
    assert(!rows(2).isNullAt(2))
  }
}
