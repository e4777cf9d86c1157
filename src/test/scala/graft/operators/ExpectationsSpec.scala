package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Gates Expectations (q218's operator): single-scan conditional-aggregate
  * audits with three-valued-logic violations, anti-join RI orphan counts,
  * and the edge cases the round-11 advice named (empty input → 0, not
  * NULL; rule names with quotes/backslashes must not break the unpivot).
  */
class ExpectationsSpec extends SparkSpecBase {
  import Expectations._

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "hello world", Option("en")),
      (2L, "short", Option("de")),
      (3L, null.asInstanceOf[String], Option("fr")),
      (4L, "x", None: Option[String])
    ).toDF("id", "text", "lang")
  }

  test("audit counts violations per rule in one scan, NULL predicate = violation") {
    val out = audit(docs, Seq(
      Expect("id_positive", col("id") > 0L),
      // length(NULL) is NULL -> unknown -> violation (row 3)
      Expect("text_min_len_6", length(col("text")) >= 6),
      Expect("lang_nonnull", col("lang").isNotNull)
    )).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("id_positive") == (4L, 0L))
    // rows 2 ("short"), 4 ("x") too short; row 3 NULL text -> violation
    assert(out("text_min_len_6") == (4L, 3L))
    assert(out("lang_nonnull") == (4L, 1L))
  }

  test("audit over an empty frame reports 0 violations, not NULL") {
    val out = audit(docs.filter(lit(false)),
      Seq(Expect("anything", col("id") > 0L))).collect()
    assert(out.length == 1)
    assert(!out(0).isNullAt(2) && out(0).getLong(1) == 0L && out(0).getLong(2) == 0L)
  }

  test("rule names with quotes and trailing backslashes survive") {
    val out = audit(docs, Seq(
      Expect("""it's a 'rule' with \ and trailing \""", col("id") > 0L),
      Expect("plain", col("id") > 2L)
    )).collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(out("""it's a 'rule' with \ and trailing \""") == 0L)
    assert(out("plain") == 2L)
  }

  test("duplicate rule names are rejected") {
    val e = intercept[IllegalArgumentException] {
      audit(docs, Seq(Expect("r", lit(true)), Expect("r", lit(false))))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("fkOrphans: unmatched and NULL child keys count as orphans") {
    import spark.implicits._
    val child = Seq(Option(1L), Option(2L), Option(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = fkOrphans("child_fk_parent", child, "fk", parent, "pk")
      .collect()(0)
    assert(r.getString(0) == "child_fk_parent")
    assert(r.getLong(1) == 4L) // n_checked
    assert(r.getLong(2) == 2L) // 9L unmatched + NULL
  }

  test("gateRows annotates per-row violations with the admitStream convention") {
    val out = gateRows(docs, Seq(
      Expect("text_min_len_6", length(col("text")) >= 6),
      Expect("lang_nonnull", col("lang").isNotNull)
    )).collect().map(r => r.getAs[Long]("id") ->
      ((r.getSeq[String](r.fieldIndex("violations")).toList,
        r.getAs[Boolean]("admitted")))).toMap
    assert(out(1L) == (Nil, true))
    assert(out(2L) == (List("text_min_len_6"), false))
    assert(out(3L) == (List("text_min_len_6"), false)) // NULL text = violation
    assert(out(4L) == (List("text_min_len_6", "lang_nonnull"), false))
  }

  test("gateBatch quarantine: a planted violation never reaches the snapshot") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val snap = "exp_gate_snapshot"
    val quar = "exp_gate_quarantine"
    def drop(): Unit = Seq(snap, quar).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    drop()
    try {
      val rules = Seq(
        Expect("id_positive", col("id") > 0L),
        Expect("text_nonnull", col("text").isNotNull))
      // the streaming twin: every micro-batch runs the SAME batch gate
      val input = MemoryStream[(Long, String)]
      val q = input.toDF().toDF("id", "text")
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!b.isEmpty) {
            Expectations.gateBatch(b, rules, snap, quar); ()
          }
        }.start()
      try {
        input.addData(Seq((1L, "clean one"), (2L, "clean two")))
        q.processAllAvailable()
        // planted violation: NULL text fails text_nonnull -> whole batch
        // quarantined, including its clean sibling row
        input.addData(Seq((3L, null.asInstanceOf[String]), (4L, "rides along")))
        q.processAllAvailable()
        input.addData(Seq((5L, "clean three")))
        q.processAllAvailable()
      } finally q.stop()
      val snapped = spark.table(snap).collect().map(_.getLong(0)).toSet
      assert(snapped == Set(1L, 2L, 5L),
        s"violating batch leaked into the snapshot: $snapped")
      val quarantined = spark.table(quar)
        .collect().map(r => r.getLong(0) ->
          r.getSeq[String](r.fieldIndex("violations")).toList).toMap
      assert(quarantined == Map(3L -> List("text_nonnull"), 4L -> Nil))
    } finally drop()
  }

  test("q218 shape on the sf0.001 fixture: 8 rules, known violation rows") {
    val rows = graft.queries.Quality.q218Expectations(spark, Sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == 8)
    assert(rows("orders_pk_nonnull")._2 == 0L)
    assert(rows("orders_fk_customer")._2 == 0L)
    // negative balances exist in the fixture; en docs fail the latin2 rule
    assert(rows("customer_acctbal_nonneg")._2 > 0L)
    assert(rows("doc_lang_latin2")._2 > 0L)
    assert(rows("doc_lang_latin2")._1 == rows("doc_text_min_len")._1)
  }
}
