package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CleaningSpec extends SparkSpecBase {
  import spark.implicits._

  test("coerceDouble matches pandas to_numeric(errors='coerce')") {
    val df = Seq("  42.5 ", "abc", "", "1e3", "∞").toDF("s")
      .select(Cleaning.coerceDouble($"s").as("v"))
    val vals = df.collect().map(r => Option(r.get(0)))
    assert(vals(0).contains(42.5))
    assert(vals(1).isEmpty)
    assert(vals(2).isEmpty)
    assert(vals(3).contains(1000.0))
    assert(vals(4).isEmpty)
  }

  test("scrubDoubles zeroes NaN, ±inf and NULL") {
    val df = Seq(
      (Double.NaN, 1.0), (Double.PositiveInfinity, 2.0),
      (Double.NegativeInfinity, 3.0), (4.0, 4.0))
      .toDF("a", "b")
    val scrubbed = Cleaning.scrubDoubles(df).collect().map(_.getDouble(0))
    assert(scrubbed.sorted.toSeq == Seq(0.0, 0.0, 0.0, 4.0))
  }

  test("safeRatio guards divisor precondition and clamps huge values") {
    val df = Seq((10.0, 2.0), (10.0, 0.0), (1.0, 1e-20)).toDF("n", "d")
      .select(Cleaning.safeRatio($"n", $"d", $"d" > 0).as("r"))
    val vals = df.collect().map(_.getDouble(0))
    assert(vals(0) == 5.0)
    assert(vals(1) == 0.0) // precondition fails
    assert(vals(2) == 0.0) // > 1e15 clamp
  }

  test("minMaxNorm constant column falls back to 50") {
    val df = Seq(1.0, 1.0, 1.0).toDF("x")
      .withColumn("mn", lit(1.0)).withColumn("mx", lit(1.0))
      .select(Cleaning.minMaxNorm(col("x"), col("mn"), col("mx")).as("norm"))
    assert(df.collect().forall(_.getDouble(0) == 50.0))
  }

  test("minMaxNorm inverts lower-is-better") {
    val df = Seq(0.0, 10.0).toDF("x")
      .withColumn("mn", lit(0.0)).withColumn("mx", lit(10.0))
    val normal = df.select(Cleaning.minMaxNorm(col("x"), col("mn"), col("mx")).as("n"))
      .collect().map(_.getDouble(0))
    val inv = df.select(Cleaning.minMaxNorm(col("x"), col("mn"), col("mx"), invert = true).as("n"))
      .collect().map(_.getDouble(0))
    assert(normal.toSeq == Seq(0.0, 100.0))
    assert(inv.toSeq == Seq(100.0, 0.0))
  }
}
