package graft

import org.apache.spark.sql.functions._

/** Pins Tables.normalizeTs's contract over every `ts` encoding the driver's
  * fixtures have actually shipped (they changed twice already), plus the
  * schema-drift canary: a FOURTH encoding must fail loudly, not flow
  * through un-normalized.
  */
class TablesSpec extends SparkSpecBase {
  import spark.implicits._

  // 2021-06-01 12:34:56.789012 UTC, in µs
  private val micros = 1622550896789012L

  test("normalizeTs: BIGINT nanos (nanosAsLong) floor-divides to µs") {
    val df = Seq((1L, micros * 1000L + 999L)).toDF("event_id", "ts")
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    // the +999 sub-µs tail truncates — DuckDB's ns→µs narrowing semantics
    assert(out.select(unix_micros($"ts")).head().getLong(0) === micros)
  }

  test("normalizeTs: TIMESTAMP_NTZ casts to TIMESTAMP with micros unchanged") {
    val df = Seq((1L, micros)).toDF("event_id", "us")
      .select($"event_id",
        to_timestamp_ntz(timestamp_micros($"us").cast("string")).as("ts"))
    assert(df.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    // session is pinned UTC (GraftSession), so the wall-clock reinterpret
    // preserves the stored micros exactly
    assert(out.select(unix_micros($"ts")).head().getLong(0) === micros)
  }

  test("normalizeTs: plain TIMESTAMP passes through untouched") {
    val df = Seq((1L, micros)).toDF("event_id", "us")
      .select($"event_id", timestamp_micros($"us").as("ts"))
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(out.select(unix_micros($"ts")).head().getLong(0) === micros)
  }

  test("normalizeTs canary: an unhandled fourth encoding fails loudly") {
    val asString = Seq((1L, "2021-06-01 12:34:56")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](Tables.normalizeTs(asString))
    assert(e.getMessage.contains("unhandled type"))
    assert(e.getMessage.contains("normalizeTs"))
    val asDate = Seq((1L, java.sql.Date.valueOf("2021-06-01"))).toDF("event_id", "ts")
    intercept[IllegalStateException](Tables.normalizeTs(asDate))
  }

  test("the shipped events fixture normalizes to TIMESTAMP at both sfs") {
    Seq(Sf0001, Sf001).foreach { dir =>
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType)
      assert(ev.limit(1).count() === 1L)
    }
  }
}
