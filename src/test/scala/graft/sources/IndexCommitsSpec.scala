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
    IndexCommits.invalidate(spark, base)
  }

  test("a 1,000-admission ledger folds to O(1) markers; allocation stays monotonic") {
    val base = s"graft_commits_fold_${System.identityHashCode(this)}"
    val dir = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"${base}_commits")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    IndexCommits.invalidate(spark, base)

    val eps = (1 to 1000).map { _ =>
      val e = IndexCommits.begin(spark, base)
      IndexCommits.commit(spark, base, e)
      e
    }
    assert(IndexCommits.committed(spark, base).size == 1000)
    // fold everything but the newest two admissions
    val lowWater = eps(997)
    val target = IndexCommits.foldCommitted(spark, base, lowWater)((f, t) => {
      assert(f == eps.take(998) && t == eps.head,
        "fold plan must name exactly the committed epochs at/below the mark")
    })
    assert(target.contains(eps.head))
    // O(1) markers: the target plus the two above the mark
    assert(fs.listStatus(dir).map(_.getPath.getName).count(_.matches("v\\d+")) == 3,
      "folded markers must be gone from the listing")
    assert(IndexCommits.committed(spark, base) ==
      Seq(eps.head, eps(998), eps(999)))
    // allocation survives the marker deletion: the next epoch is above
    // every epoch that EVER existed, not just the surviving markers
    val next = IndexCommits.begin(spark, base)
    assert(next > eps.last, s"epoch $next reuses a folded allocation (max was ${eps.last})")
    // idempotence: nothing left to fold below the mark (one committed
    // epoch remains there — the target itself)
    assert(IndexCommits.foldCommitted(spark, base, lowWater)((_, _) =>
      fail("no-op fold must not invoke the rewrite")).isEmpty)
    fs.delete(dir, true)
    IndexCommits.invalidate(spark, base)
  }

  test("fold compact-then-probe equality on a bucketed epoch table; epoch filter pushes down") {
    import spark.implicits._
    val base = s"graft_commits_fold2_${System.identityHashCode(this)}"
    val table = s"${base}_rows"
    val dir = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"${base}_commits")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    IndexCommits.invalidate(spark, base)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Sinks.reclaimOrphanTableLocation(spark, table)

    // build epoch 0, admit epochs 1..4, crash epoch 5 (never committed)
    val e0 = IndexCommits.begin(spark, base)
    Sinks.parquetBucketed(
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "v").withColumn("epoch",
        org.apache.spark.sql.functions.lit(e0)), table, "doc_id", 4)
    IndexCommits.commit(spark, base, e0)
    val admitted = (1 to 4).map { i =>
      val e = IndexCommits.begin(spark, base)
      Seq((10L * i, s"v$i")).toDF("doc_id", "v")
        .withColumn("epoch", org.apache.spark.sql.functions.lit(e))
        .write.mode(org.apache.spark.sql.SaveMode.Append).format("parquet")
        .bucketBy(4, "doc_id").sortBy("doc_id").saveAsTable(table)
      IndexCommits.commit(spark, base, e)
      e
    }
    val crashed = IndexCommits.begin(spark, base)
    Seq((666L, "orphan")).toDF("doc_id", "v")
      .withColumn("epoch", org.apache.spark.sql.functions.lit(crashed))
      .write.mode(org.apache.spark.sql.SaveMode.Append).format("parquet")
      .bucketBy(4, "doc_id").sortBy("doc_id").saveAsTable(table)

    def probe() = spark.table(table)
      .filter(IndexCommits.committedFilter(spark, base))
      .select("doc_id", "v").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet
    val before = probe()
    assert(!before.exists(_._1 == 666L), "orphan rows must be invisible")

    // fold epochs <= admitted(2) into e0, rewriting the one table
    val tgt = IndexCommits.foldCommitted(spark, base, admitted(2)) { (f, t) =>
      Sinks.compactBucketedTableFolding(spark, table, base, f, t)
    }
    assert(tgt.contains(e0))
    assert(probe() == before, "fold must not change the visible row set")
    // the orphan row was GC'd by the committed-only rewrite
    assert(spark.table(table).filter($"doc_id" === 666L).count() == 0)
    // ledger now: e0 (the fold target) + the one admission above the mark
    assert(IndexCommits.committed(spark, base) == Seq(e0, admitted(3)))

    // the probe predicate must reach the parquet scan as a pushed filter —
    // the scan prunes row groups by epoch instead of filtering post-read
    val planStr = spark.table(table)
      .filter(IndexCommits.committedFilter(spark, base))
      .queryExecution.executedPlan.toString
    assert(planStr.contains("PushedFilters: [In(epoch"),
      s"epoch In-filter not pushed to the scan:\n$planStr")

    spark.sql(s"DROP TABLE IF EXISTS $table")
    fs.delete(dir, true)
    IndexCommits.invalidate(spark, base)
  }
}
