package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Top-level so MemoryStream gets a stable product encoder. */
case class UpsertChange(id: Long, source: String, text: String,
                        seq: Long, op: String)

class UpsertSpec extends SparkSpecBase {
  import spark.implicits._

  test("applyChanges: update keeps NULL-change columns, delete drops, insert and upsert land") {
    val snap = Seq(
      (1L, "a", "t1"),
      (2L, "b", "t2"),
      (3L, "c", "t3")
    ).toDF("doc_id", "source", "text")
    val changes = Seq(
      (2L, null.asInstanceOf[String], "t2x", "U"), // partial update: source kept
      (3L, null.asInstanceOf[String], null.asInstanceOf[String], "D"),
      (9L, "z", "t9", "I"),
      (5L, "y", "t5", "U")                         // U on absent key = upsert insert
    ).toDF("doc_id", "source", "text", "op")
    val got = Upsert.applyChanges(snap, changes, "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, "a", "t1"),
      (2L, "b", "t2x"),
      (9L, "z", "t9"),
      (5L, "y", "t5")))
  }

  test("q121 plan: one key join, no window, no cartesian") {
    val df = graft.queries.Ops.q121MergeUpsert(spark, Sf0001)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"merge must not window:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"merge must not cartesian:\n$plan")
  }

  /** The compaction contract, stated as the equivalence that defines it:
    * applying the single compacted row per key must land the same
    * snapshot as replaying the log one seq-batch at a time. The fixture
    * hits every op interplay: U-then-D (death), D-then-I (rebirth,
    * replace semantics), I-then-U (overlay on the reborn row), U+U
    * (column-wise fold), D-then-U without I (upsert onto a deleted row —
    * old columns must NOT bleed), I with a NULL column (real NULL, not
    * keep-old), U on an absent key (insert), D on an absent key (no-op).
    */
  test("compactChanges then applyChanges ≡ sequential one-batch-at-a-time replay") {
    val n = null.asInstanceOf[String]
    val snap = Seq(
      (1L, "s1", "t1"), (2L, "s2", "t2"), (3L, "s3", "t3"),
      (4L, "s4", "t4"), (5L, "s5", "t5"), (6L, "s6", "t6")
    ).toDF("id", "source", "text")
    val log = Seq(
      (1L, n, "a1", 1L, "U"), (1L, n, n, 2L, "D"),
      (2L, n, n, 1L, "D"), (2L, "sys", "re", 2L, "I"), (2L, n, "re2", 3L, "U"),
      (3L, n, "t1x", 1L, "U"), (3L, "s2b", n, 2L, "U"),
      (4L, n, n, 1L, "D"), (4L, n, "u4", 2L, "U"),
      (5L, "x", n, 1L, "I"),
      (9L, n, "t9", 1L, "U"),
      (10L, n, n, 1L, "D")
    ).toDF("id", "source", "text", "seq", "op")
    val compacted = Upsert
      .applyChanges(snap, Upsert.compactChanges(log, "id", "seq"), "id")
    val sequential = (1L to 3L).foldLeft(snap) { (acc, s) =>
      Upsert.applyChanges(acc, log.filter(col("seq") === s).drop("seq"), "id")
    }
    val got = compacted.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = sequential.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == want, s"compacted $got\nsequential $want")
    // the defining cases, pinned explicitly
    assert(!got.exists(_._1 == 1L), "U-then-D key must be gone")
    assert(got.contains((2L, "sys", "re2")), "D-then-I-then-U rebirth+overlay")
    assert(got.contains((3L, "s2b", "t1x")), "U+U column-wise fold")
    assert(got.contains((4L, null, "u4")), "D-then-U must not bleed old source")
    assert(got.contains((5L, "x", null)), "I's NULL column is a real NULL")
    assert(got.contains((9L, null, "t9")), "U on absent key inserts")
    assert(!got.exists(_._1 == 10L), "D on absent key is a no-op")
  }

  test("compactChanges ≡ sequential replay on random logs") {
    // seeded-random companion to the hand-crafted interplay cases: any
    // U/I/D ladder over any snapshot must compact to the same final
    // state the one-batch-per-seq replay reaches
    val rnd = new scala.util.Random(99173L)
    val ops = Array("U", "I", "D")
    val snap = (0 until 25).filter(_ => rnd.nextBoolean())
      .map(k => (k.toLong, s"s$k", s"t$k")).toDF("id", "source", "text")
    val maxSeq = 5L
    val log = (0 until 25).flatMap { k =>
      (1L to maxSeq).flatMap { s =>
        if (rnd.nextInt(3) == 0) None
        else {
          def v(p: String) = if (rnd.nextBoolean()) null else s"${p}_${k}_$s"
          Some((k.toLong, v("s"), v("t"), s, ops(rnd.nextInt(3))))
        }
      }
    }.toDF("id", "source", "text", "seq", "op")
    val compacted = Upsert
      .applyChanges(snap, Upsert.compactChanges(log, "id", "seq"), "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val sequential = (1L to maxSeq).foldLeft(snap) { (acc, s) =>
      Upsert.applyChanges(acc, log.filter(col("seq") === s).drop("seq"), "id")
    }.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(compacted == sequential,
      s"missing=${sequential -- compacted}\nextra=${compacted -- sequential}")
  }

  test("compactChanges plan: one hash aggregation, no window, no join") {
    val n = null.asInstanceOf[String]
    val log = Seq((1L, "a", "t", 1L, "U"), (1L, n, n, 2L, "D"))
      .toDF("id", "source", "text", "seq", "op")
    val plan = Upsert.compactChanges(log, "id", "seq")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"compaction must not window:\n$plan")
    assert(!plan.contains("Join"), s"compaction must not join:\n$plan")
  }

  test("pointInTime equals a brute-force interval join, including deleted gaps") {
    val n = null.asInstanceOf[String]
    val log = Seq(
      (2L, n, n, 1L, "D"), (2L, "sys", "re", 2L, "I"), (2L, n, "re2", 3L, "U"),
      (4L, "olds", "oldt", 1L, "U"), (4L, n, n, 2L, "D"), (4L, n, "u4", 3L, "U"),
      (3L, n, "t1x", 1L, "U"), (3L, "s2b", n, 2L, "U")
    ).toDF("id", "source", "text", "seq", "op")
    val hist = Upsert.scd2History(log, "id", "seq")
      .select("id", "valid_from", "valid_to", "source", "text")
    val probe = (1L to 5L).flatMap(k => (0L to 4L).map(t => (k, t)))
      .toDF("id", "ts")
    val got = Upsert.pointInTime(probe, hist, "id", "ts")
      .select(col("id"), col("ts"), col("asof_source"), col("asof_text"),
        col("asof_valid_from"))
      .collect().map(_.toSeq).toSet
    val want = probe.alias("p")
      .join(hist.alias("h"),
        col("p.id") === col("h.id") && col("h.valid_from") <= col("p.ts") &&
          (col("h.valid_to").isNull || col("p.ts") < col("h.valid_to")),
        "left")
      .select(col("p.id"), col("p.ts"), col("h.source"), col("h.text"),
        col("h.valid_from"))
      .collect().map(_.toSeq).toSet
    assert(got == want, s"missed=${want -- got} extra=${got -- want}")
    // the gap a plain as-of join would bridge: key 4 deleted over [2,3)
    assert(got.contains(Seq(4L, 2L, null, null, null)))
    // and alive again after the post-delete upsert
    assert(got.contains(Seq(4L, 3L, null, "u4", 3L)))
  }

  test("applyChangesStream: streamed microbatches land the same snapshot as one batch apply") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val n = null.asInstanceOf[String]
    val snap = Seq((1L, "s1", "t1"), (2L, "s2", "t2"), (3L, "s3", "t3"))
      .toDF("id", "source", "text")
    // batch 1 then batch 2 — the cross-batch interplay (D in b1, U in b2)
    // must behave like one log replay
    val b1 = Seq(
      UpsertChange(1L, n, "t1x", 1L, "U"),
      UpsertChange(2L, n, n, 2L, "D"),
      UpsertChange(4L, "x", "t4", 3L, "I"))
    val b2 = Seq(
      UpsertChange(2L, n, "re2", 4L, "U"),  // upsert onto the deleted key
      UpsertChange(1L, "s1b", n, 5L, "U"),
      UpsertChange(4L, n, n, 6L, "D"))
    val dir = java.nio.file.Files.createTempDirectory("upsert_stream").toString
    snap.write.parquet(s"$dir/v0")
    val input = MemoryStream[UpsertChange]
    val q = Upsert.applyChangesStream(input.toDF(), "id", "seq",
      dir, s"$dir/_chk")
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = Upsert.latestSnapshot(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val oneShot = Upsert.applyChanges(snap,
        Upsert.compactChanges((b1 ++ b2).toDF(), "id", "seq"), "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(streamed == oneShot, s"streamed $streamed vs batch $oneShot")
    assert(streamed == Set(
      (1L, "s1b", "t1x"),   // folded across batches
      (2L, null, "re2"),    // deleted in b1, upserted in b2 — no s2 bleed
      (3L, "s3", "t3")))    // untouched; 4 inserted then deleted
  }

  test("pointInTimeStream over a probe stream equals the batch pointInTime") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val n = null.asInstanceOf[String]
    val log = Seq(
      (2L, n, n, 1L, "D"), (2L, "sys", "re", 2L, "I"), (2L, n, "re2", 3L, "U"),
      (4L, "olds", "oldt", 1L, "U"), (4L, n, n, 2L, "D"), (4L, n, "u4", 3L, "U")
    ).toDF("id", "source", "text", "seq", "op")
    val hist = Upsert.scd2History(log, "id", "seq")
      .select("id", "valid_from", "valid_to", "source", "text")
    // static history: materialize once (stream-static joins need a
    // deterministic static side, and re-planning the window chain per
    // microbatch would recompute it anyway)
    val histDir =
      java.nio.file.Files.createTempDirectory("pit_hist").toString + "/h"
    hist.write.parquet(histDir)
    val histStatic = spark.read.parquet(histDir)
    val probes = for (k <- 1L to 5L; t <- 0L to 4L) yield (k, t)
    val input = MemoryStream[(Long, Long)]
    val out = Upsert.pointInTimeStream(
      input.toDF().toDF("id", "ts"), histStatic, "id", "ts")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("pit_out").start()
    try {
      input.addData(probes: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("pit_out").collect().map(_.toSeq).toSet
    val batch = Upsert.pointInTime(
        probes.toDF("id", "ts"), histStatic, "id", "ts")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, s"missed=${batch -- streamed} extra=${streamed -- batch}")
    assert(streamed.nonEmpty)
  }

  test("q130 time-travel diff: statuses partition the log's key universe") {
    val out = graft.queries.Ops.q130TimeTravelDiff(spark, Sf0001)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val byStatus = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // every fixture key exists at ts=1 (all ladders start with U@1 or
    // D@2-on-U@1), so nothing can read as 'added'
    assert(!byStatus.contains("added"), s"got $byStatus")
    // the U-then-D keys (%8==5 without rebirth) must read as removed
    assert(byStatus.getOrElse("removed", 0L) > 0, s"got $byStatus")
    // rebirths flip the text hash -> changed
    assert(byStatus.getOrElse("changed", 0L) > 0, s"got $byStatus")
    // source-only updates keep the text hash -> unchanged
    assert(byStatus.getOrElse("unchanged", 0L) > 0, s"got $byStatus")
  }

  test("scd2History equals a driver-side reference fold on random op logs") {
    // adversarial randomized check of the epoch/carry-forward algebra:
    // random U/I/D ladders per key, payload columns independently null,
    // D rows deliberately carrying (void) payloads
    val rnd = new scala.util.Random(8138L)
    val ops = Array("U", "I", "D")
    val log: Seq[UpsertChange] = (0 until 40).flatMap { k =>
      (1 to rnd.nextInt(9)).map { s =>
        def v(p: String) = if (rnd.nextBoolean()) null else s"${p}_${k}_$s"
        UpsertChange(k.toLong, v("s"), v("t"), s.toLong, ops(rnd.nextInt(3)))
      }
    }
    // reference: per key in seq order — epoch bumps on D/I (the op row
    // belongs to the epoch it bumps into), D contributes no payload,
    // carry = last non-null per column within the epoch
    val expected = log.groupBy(_.id).flatMap { case (k, rows) =>
      val sorted = rows.sortBy(_.seq)
      var src: String = null; var txt: String = null
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Option[Long], String, String, Boolean)]
      sorted.zipWithIndex.foreach { case (r, i) =>
        if (r.op == "D" || r.op == "I") { src = null; txt = null } // epoch reset
        if (r.op != "D") {
          if (r.source != null) src = r.source
          if (r.text != null) txt = r.text
          val validTo = sorted.lift(i + 1).map(_.seq)
          out += ((k, r.seq, validTo, src, txt, validTo.isEmpty))
        }
      }
      out
    }.toSet
    val got = Upsert.scd2History(log.toDF(), "id", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getString(3), r.getString(4), r.getBoolean(5))).toSet
    assert(got == expected,
      s"missing=${expected -- got}\nextra=${got -- expected}")
  }

  test("scd2History: bounds, epoch-reset carry-forward, is_current") {
    val n = null.asInstanceOf[String]
    val log = Seq(
      // k2: D@1, I@2 (sys/re), U@3 (text re2) — I starts a new epoch
      (2L, n, n, 1L, "D"), (2L, "sys", "re", 2L, "I"), (2L, n, "re2", 3L, "U"),
      // k4: D@1 then U@2 — carry-forward must NOT cross the D
      (4L, "olds", "oldt", 1L, "U"), (4L, n, n, 2L, "D"), (4L, n, "u4", 3L, "U"),
      // k3: U@1 then U@2 — plain fold within one epoch
      (3L, n, "t1x", 1L, "U"), (3L, "s2b", n, 2L, "U"),
      // k5: the D row itself carries a (void) payload — it must be nulled
      // before carry-forward, not bleed into the post-D version
      (5L, "s5", "t5", 1L, "U"), (5L, "ghost", "ghostt", 2L, "D"),
      (5L, n, "u5", 3L, "U")
    ).toDF("id", "source", "text", "seq", "op")
    val h = Upsert.scd2History(log, "id", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getString(3), r.getString(4), r.getBoolean(5)))
      .toSet
    assert(h == Set(
      (2L, 2L, 3L, "sys", "re", false),
      (2L, 3L, -1L, "sys", "re2", true),
      (4L, 1L, 2L, "olds", "oldt", false), // closed by the D, no successor
      (4L, 3L, -1L, null, "u4", true),     // post-D version: no olds bleed
      (3L, 1L, 2L, null, "t1x", false),
      (3L, 2L, -1L, "s2b", "t1x", true),
      (5L, 1L, 2L, "s5", "t5", false),
      (5L, 3L, -1L, null, "u5", true)), s"got $h") // no ghost/ghostt bleed
  }
}
