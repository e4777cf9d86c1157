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
}
