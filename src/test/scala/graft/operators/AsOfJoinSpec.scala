package graft.operators

import graft.SparkSpecBase
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks latest right row at-or-before, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 10L, ts("2024-01-01 09:00:00")), // before any right row
      (4L, 20L, ts("2024-01-01 12:00:00"))) // key with no right rows
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00"), 5.0),
      (101L, 10L, ts("2024-01-01 11:00:00"), 7.0),
      (102L, 10L, ts("2024-01-01 13:00:00"), 9.0)) // after everything
      .toDF("rid", "user_id", "ts", "v")

    val out = AsOfJoin(left, right, "user_id", "ts", "ts", Seq("rid", "v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out(1L).contains(100L))
    assert(out(2L).contains(101L))
    assert(out(3L).isEmpty)
    assert(out(4L).isEmpty)
  }

  test("matched right row with NULL payload does not resurrect stale columns") {
    val left = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00"), Some(5.0)),
      (101L, 10L, ts("2024-01-01 11:00:00"), None)) // latest row, NULL value
      .toDF("rid", "user_id", "ts", "v")
    val out = AsOfJoin(left, right, "user_id", "ts", "ts", Seq("rid", "v")).collect()(0)
    assert(out.getLong(3) == 101L)          // latest right row wins...
    assert(out.isNullAt(4), s"payload must be the matched row's NULL, got ${out.get(4)}")
  }

  test("simultaneous right row is visible (<= semantics)") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, 10L, ts("2024-01-01 10:00:00"), 1.0)).toDF("rid", "user_id", "ts", "v")
    val out = AsOfJoin(left, right, "user_id", "ts", "ts", Seq("rid"))
      .collect()
    assert(out(0).getLong(3) == 100L)
  }
}
