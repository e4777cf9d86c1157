package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val frame = Seq[(java.lang.Double, java.lang.Double)](
    (1.0, 10.0), (2.0, 10.0), (2.0, null), (null, 30.0), (3.0, null)
  ).toDF("a", "b")

  test("numericProfile: nulls, distincts, min/max per column from one row each") {
    val got = Profile.numericProfile(frame, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got("a") == ((4L, 1L, 3L, 1.0, 3.0)))
    assert(got("b") == ((3L, 2L, 2L, 10.0, 30.0)))
  }

  test("stringProfile: nulls, distincts, lengths and lexicographic extremes") {
    val df = Seq[(String, String)](
      ("apple", "x"), ("bee", null), ("apple", "yy"), (null, "x")
    ).toDF("s", "t")
    val got = Profile.stringProfile(df, Seq("s", "t"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getString(6), r.getString(7)))).toMap
    assert(got("s") == ((3L, 1L, 2L, 3L, 5L, "apple", "bee")))
    assert(got("t") == ((3L, 1L, 2L, 1L, 2L, "x", "yy")))
  }

  test("dateProfile: day-granular counts and ISO min/max, null lens") {
    val df = Seq[(String, String)](
      ("2024-01-02 10:00:00", "a"), ("2024-01-02 23:59:59", "b"),
      ("2024-03-15 00:00:00", "c"), (null, "d")
    ).toDF("ts", "x").withColumn("ts", col("ts").cast("timestamp"))
    val r = Profile.dateProfile(df, Seq("ts")).collect()(0)
    assert(r.getString(0) == "ts")
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 1L, 2L)))
    assert(r.isNullAt(4) && r.isNullAt(5))
    assert((r.getString(6), r.getString(7)) == (("2024-01-02", "2024-03-15")))
  }

  test("histogram: exact edges, clamped tails, nulls excluded") {
    val vals = Seq[java.lang.Double](-5.0, 0.0, 9.99, 10.0, 15.0, 25.0, 99.0, null)
      .toDF("v")
    // lo=0, width=10, 3 buckets: [-inf..10) -> 0 (clamped), [10,20) -> 1, rest -> 2
    val got = Profile.histogram(vals, "v", lo = 0.0, width = 10.0, nBuckets = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(0L) == ((3L, -5.0, 9.99, 0.0)))  // -5 clamped in; 10.0 NOT here
    assert(got(1L) == ((2L, 10.0, 15.0, 10.0))) // exact lower edge inclusive
    assert(got(2L) == ((2L, 25.0, 99.0, 20.0))) // 99 clamped into last bucket
    assert(got.values.map(_._1).sum == 7L)      // null row excluded
  }

  test("profile totals agree with direct aggregation on the fixture") {
    val li = graft.Tables.lineitem(spark, Sf0001)
    val prof = Profile.numericProfile(li, Seq("l_quantity")).head()
    val direct = li.agg(count(col("l_quantity")),
      countDistinct(col("l_quantity")), min("l_quantity"), max("l_quantity")).head()
    assert(prof.getLong(1) == direct.getLong(0))
    assert(prof.getLong(3) == direct.getLong(1))
    assert(prof.getDouble(4) == direct.getDouble(2))
    assert(prof.getDouble(5) == direct.getDouble(3))
  }
}
