package graft.sources

import graft.SparkSpecBase

/** The epoch ledger's own contracts — the invariants every lifecycle's
  * crash consistency (IndexCrashSpec) reduces to.
  */
class IndexCommitsSpec extends SparkSpecBase {

  test("begin is strictly monotonic across commits, crashes, AND resets") {
    val base = s"graft_commits_spec_${System.identityHashCode(this)}"
    // fresh ledger
    val dir = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"${base}_commits")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)

    val e0 = IndexCommits.begin(spark, base)
    IndexCommits.commit(spark, base, e0)
    val e1 = IndexCommits.begin(spark, base) // "crashes": never committed
    val e2 = IndexCommits.begin(spark, base)
    assert(e0 < e1 && e1 < e2, s"epochs must be strictly increasing: $e0 $e1 $e2")
    assert(IndexCommits.committed(spark, base) == Seq(e0),
      "only the committed epoch resolves")
    // reset DECOMMITS but keeps the high-water mark: the next epoch is
    // above EVERYTHING that ever existed — a dead lifecycle's number can
    // never be reissued (the round-16 crashed-rebuild hazard)
    IndexCommits.reset(spark, base)
    assert(IndexCommits.committed(spark, base).isEmpty,
      "reset must decommit every epoch")
    val e3 = IndexCommits.begin(spark, base)
    assert(e3 > e2, s"post-reset epoch $e3 must exceed pre-reset max $e2")
    fs.delete(dir, true)
  }

  test("committedFilter of an empty/uncommitted ledger admits nothing") {
    val base = s"graft_commits_spec2_${System.identityHashCode(this)}"
    val dir = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"${base}_commits")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    import spark.implicits._
    val rows = Seq((1L, 0L), (2L, 1L)).toDF("doc_id", "epoch")
    // no ledger at all
    assert(rows.filter(IndexCommits.committedFilter(spark, base)).count() == 0)
    // allocated but never committed
    IndexCommits.begin(spark, base)
    assert(rows.filter(IndexCommits.committedFilter(spark, base)).count() == 0)
    fs.delete(dir, true)
  }
}
