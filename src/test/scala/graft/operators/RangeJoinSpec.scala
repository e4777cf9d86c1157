package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val W = 600L * 1000000 // 10 minutes in micros

  // probe points and build points on a micro-timeline; user 1 exercises
  // the boundaries, user 2 the cross-bin path, user 3 has no matches
  private lazy val probe = Seq(
    (101L, 1L, 10000L * 1000000), // user 1 probe at t=10000s
    (102L, 2L, 1205L * 1000000),  // user 2 probe near a bin edge
    (103L, 3L, 5000L * 1000000)
  ).toDF("event_id", "user_id", "ep")
    .select($"event_id", $"user_id", timestamp_micros($"ep").as("ts"))

  private lazy val build = Seq(
    (201L, 1L, 10000L * 1000000 - W),      // exactly ts - W -> INCLUDED
    (202L, 1L, 10000L * 1000000),          // exactly ts     -> EXCLUDED
    (203L, 1L, 10000L * 1000000 - 1),      // 1us before     -> included
    (204L, 1L, 10000L * 1000000 - W - 1),  // 1us too old    -> excluded
    (205L, 2L, 1199L * 1000000),           // previous bin (bin 1 vs probe bin 2)
    (206L, 9L, 1199L * 1000000)            // wrong user
  ).toDF("p_event_id", "user_id", "ep")
    .select($"p_event_id", $"user_id", timestamp_micros($"ep").as("p_ts"))

  test("trailing window [t-W, t) with exact boundaries, keyed per user") {
    val got = RangeJoin.trailingWindowJoin(probe, build,
        "user_id", "ts", "p_ts", W)
      .select("event_id", "p_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((101L, 201L), (101L, 203L), (102L, 205L)))
  }

  test("matches the brute-force inequality join on random data") {
    val rnd = new scala.util.Random(7)
    val p = (1 to 300).map(i => (i.toLong, (rnd.nextInt(5) + 1).toLong,
      rnd.nextLong(100000L * 1000000)))
      .toDF("event_id", "user_id", "ep")
      .select($"event_id", $"user_id", timestamp_micros($"ep").as("ts"))
    val b = (1 to 300).map(i => (1000L + i, (rnd.nextInt(5) + 1).toLong,
      rnd.nextLong(100000L * 1000000)))
      .toDF("p_event_id", "user_id", "ep")
      .select($"p_event_id", $"user_id", timestamp_micros($"ep").as("p_ts"))
    val got = RangeJoin.trailingWindowJoin(p, b, "user_id", "ts", "p_ts", W)
      .select("event_id", "p_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = p.as("p").join(b.as("b"), $"p.user_id" === $"b.user_id" &&
        unix_micros($"b.p_ts") >= unix_micros($"p.ts") - W &&
        unix_micros($"b.p_ts") < unix_micros($"p.ts"))
      .select("event_id", "p_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
    assert(got.nonEmpty) // the comparison must not pass vacuously
  }

  test("no duplicate pairs from the two-bin explode") {
    val pairs = RangeJoin.trailingWindowJoin(probe, build,
        "user_id", "ts", "p_ts", W)
      .select("event_id", "p_event_id").collect()
    assert(pairs.length == pairs.distinct.length)
  }

  test("TIMESTAMP_NTZ ts columns are widened; other types still fail loudly") {
    // NTZ inputs (the naive-µs fixture encoding) must produce the same
    // pairs as the TIMESTAMP formulation — the UTC session makes the
    // cast value-preserving
    val pNtz = probe.withColumn("ts", $"ts".cast("timestamp_ntz"))
    val bNtz = build.withColumn("p_ts", $"p_ts".cast("timestamp_ntz"))
    val got = RangeJoin.trailingWindowJoin(pNtz, bNtz, "user_id", "ts", "p_ts", W)
      .select("event_id", "p_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((101L, 201L), (101L, 203L), (102L, 205L)))
    // a raw Long ts (e.g. nanosAsLong leaking past Tables.normalizeTs)
    // must NOT be silently reinterpreted as epoch seconds
    val pLong = probe.withColumn("ts", unix_micros($"ts"))
    intercept[org.apache.spark.sql.AnalysisException] {
      RangeJoin.trailingWindowJoin(pLong, build, "user_id", "ts", "p_ts", W)
        .collect()
    }
  }

  test("rejects shadowed column names and non-positive windows") {
    intercept[IllegalArgumentException] {
      RangeJoin.trailingWindowJoin(probe, probe, "user_id", "ts", "ts", W)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.trailingWindowJoin(probe, build, "user_id", "ts", "p_ts", 0L)
    }
  }
}
