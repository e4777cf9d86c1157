package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("requireKeyDomain passes the fixture corpus and rejects ids at the offset") {
    // fixture ids are far below the synthetic offset — guard is a no-op
    val docs = graft.Tables.documents(spark, Sf0001)
    assert(Ops.requireKeyDomain(docs) eq docs)

    // a corpus whose ids reach the offset would alias synthetic rows onto
    // real ones — the guard must fail loudly, not corrupt the diff
    val bad = Seq((Ops.SyntheticIdOffset + 5L, "s", "t"))
      .toDF("doc_id", "source", "text")
    val e = intercept[IllegalArgumentException](Ops.requireKeyDomain(bad))
    assert(e.getMessage.contains("SyntheticIdOffset")
      || e.getMessage.contains("offset"), e.getMessage)

    // empty corpus: nothing to collide with
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    assert(Ops.requireKeyDomain(empty) eq empty)
  }

  test("q133 chains admit→apply→scd2→PIT consistently on the fixture") {
    val sf = Sf0001
    val out = Ops.q133CdcChain(spark, sf).collect()
    assert(out.nonEmpty)

    // stage-2 wiring: restricted to non-offset keys the chain's merged
    // snapshot must equal q122's (the seq-6 inserts only add offset keys)
    val nonOffset = out.filter(_.getLong(0) < Ops.SyntheticIdOffset)
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val q122 = Ops.q122CdcCompact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(nonOffset == q122,
      s"missed=${(q122 -- nonOffset).take(3)} extra=${(nonOffset -- q122).take(3)}")

    // stage-1 wiring: the offset keys are EXACTLY the admitted new-batch
    // docs — a doc rejected by the expectations gate (round 14: length
    // bounds + min token count on the ARRIVING batch only) or by the
    // near-dup screen must not insert
    val isNewCol = col("source").isin(Curation.NewBatchSources: _*)
    val gatedDocs = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .filter(!isNewCol || (length(col("text")) >= 20 &&
        length(col("text")) <= 520 &&
        size(split(col("text"), " ")) >= 3))
    val admitted = graft.operators.Dedup.admitIncremental(
        gatedDocs, isNew = isNewCol, maxHamming = 3)
      .filter(col("admitted")).collect().map(_.getLong(0)).toSet
    val offsetKeys = out.filter(_.getLong(0) >= Ops.SyntheticIdOffset)
      .map(_.getLong(0) - Ops.SyntheticIdOffset).toSet
    assert(offsetKeys == admitted)
    assert(offsetKeys.nonEmpty)

    // stage-3/4 wiring: inserts carry their seq as version_from; keys the
    // log deleted last are gone; untouched keys read NULL version_from
    val byId = out.map(r => r.getLong(0) -> r).toMap
    offsetKeys.foreach { k =>
      assert(byId(k + Ops.SyntheticIdOffset).getLong(3) === 6L)
    }
    // the log only covers docs WITH text (changeLog's null contract), so
    // the delete assertion must exclude null-text keys — those never
    // receive the D op and rightly survive untouched
    val withText = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!out.exists(r =>
        r.getLong(0) % 8 == 5 && r.getLong(0) % 16 != 13 &&
        withText(r.getLong(0))),
      "U-then-D keys must not survive the merge")
    val reborn = out.filter(r =>
      r.getLong(0) % 32 == 29 && r.getLong(0) < Ops.SyntheticIdOffset &&
      withText(r.getLong(0)))
    assert(reborn.nonEmpty &&
      reborn.forall(r => r.getLong(3) == 4L && r.getString(1) == "sys"),
      "I-then-U keys carry the overlay version and the reborn source")
    val untouched = out.filter(r => r.getLong(0) < Ops.SyntheticIdOffset &&
      r.getLong(0) % 4 != 1 && r.getLong(0) % 8 != 5 && r.getLong(0) % 16 != 13)
    assert(untouched.nonEmpty && untouched.forall(_.isNullAt(3)),
      "keys the log never touched must read NULL version_from")
  }
}
