package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BucketedSinksSpec extends SparkSpecBase {

  test("partitioned write prunes directories on partition-key filters") {
    val docs = graft.Tables.documents(spark, Sf0001)
    val path = "/tmp/graft_docs_partitioned"
    Sinks.parquetPartitioned(docs, path, "lang")
    val pruned = spark.read.parquet(path).filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), s"no pruning:\n$plan")
    assert(pruned.count() == docs.filter(col("lang") === "en").count())
    // only the en directory's files are read
    val scanned = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scanned.contains("lang=de"))
  }

  test("co-bucketed tables join without a shuffle exchange") {
    val li = graft.Tables.lineitem(spark, Sf0001).select("l_orderkey", "l_quantity")
    val o = graft.Tables.orders(spark, Sf0001).select("o_orderkey", "o_totalprice")
    Sinks.parquetBucketed(li, "li_bucketed", "l_orderkey", 8)
    Sinks.parquetBucketed(o, "o_bucketed", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
  test("bucketed write reclaims an orphan warehouse directory from a dead JVM") {
    import spark.implicits._
    val name = "graft_orphan_reclaim_test"
    // simulate a killed JVM: warehouse dir exists, catalog entry does not
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
    val loc = new java.io.File(
      spark.sessionState.catalog.defaultTablePath(ident))
    loc.mkdirs()
    new java.io.FileOutputStream(new java.io.File(loc, "stale.parquet")).close()
    try {
      Sinks.parquetBucketed(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), name, "k", 4)
      assert(spark.table(name).count() == 2)
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("compactBucketedTable folds append files to one per bucket and keeps co-location") {
    import spark.implicits._
    val name = "graft_compact_bkt_test"
    val other = "graft_compact_bkt_other"
    Seq(name, other).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    def dataFiles(t: String): Int = {
      val loc = new java.io.File(java.net.URI.create(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(t)).location.toString))
      loc.listFiles().count(_.getName.endsWith(".parquet"))
    }
    try {
      val mk = (lo: Long, hi: Long) => (lo to hi).map(i => (i, s"v$i")).toDF("k", "v")
      Sinks.parquetBucketed(mk(1L, 100L), name, "k", 4)
      // two admissions, the appendIvfIndexSaved write shape
      Seq(mk(101L, 150L), mk(151L, 200L)).foreach(_.write
        .mode(org.apache.spark.sql.SaveMode.Append).format("parquet")
        .bucketBy(4, "k").sortBy("k").saveAsTable(name))
      assert(dataFiles(name) > 4, "appends should accumulate extra bucket files")
      val before = spark.table(name).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      Sinks.compactBucketedTable(spark, name)
      assert(dataFiles(name) == 4, s"expected one file per bucket, got ${dataFiles(name)}")
      val after = spark.table(name).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(after == before, "compaction must not change content")
      // co-location survives: joining two 4-bucketed tables stays shuffle-free
      Sinks.parquetBucketed(mk(1L, 200L).withColumnRenamed("v", "w"), other, "k", 4)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = spark.table(name).join(spark.table(other), "k")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"compacted bucketed join must not shuffle:\n$plan")
        assert(joined.count() == 200)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally Seq(name, other).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("compacted write coalesces a many-partition frame into few files") {
    val li = graft.Tables.lineitem(spark, Sf0001).repartition(32)
    val naive = "/tmp/graft_li_naive"
    val compact = "/tmp/graft_li_compacted"
    Sinks.parquet(li, naive)
    Sinks.parquetCompacted(li, compact)
    def dataFiles(p: String): Int =
      new java.io.File(p).listFiles().count(f => f.getName.endsWith(".parquet"))
    val (nNaive, nCompact) = (dataFiles(naive), dataFiles(compact))
    assert(nNaive == 32, s"expected the naive write to keep 32 files, got $nNaive")
    assert(nCompact <= 4, s"rebalance should coalesce tiny partitions, got $nCompact files")
    // physical layout only: identical content
    assert(spark.read.parquet(compact).count() == spark.read.parquet(naive).count())
    assert(spark.read.parquet(compact).agg(org.apache.spark.sql.functions.sum("l_quantity")).head ==
           spark.read.parquet(naive).agg(org.apache.spark.sql.functions.sum("l_quantity")).head)
  }

  test("sorted write yields non-overlapping, totally ordered file ranges") {
    import spark.implicits._
    val path = "/tmp/graft_orders_sorted"
    Sinks.parquetSorted(graft.Tables.orders(spark, Sf0001), path, "o_totalprice", 8)
    // per-file min/max from the data itself (mirrors the parquet footer
    // stats a range scan would prune on)
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"),
           count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._2)
    assert(perFile.length > 1, "range partitioning must produce multiple files")
    perFile.sliding(2).foreach {
      case Array((_, _, hi1, _), (_, lo2, _, _)) =>
        assert(hi1 <= lo2, "file key ranges must not overlap")
      case _ => ()
    }
    // within-file order + global row preservation
    val total = perFile.map(_._4).sum
    assert(total == graft.Tables.orders(spark, Sf0001).count())
    val unsorted = spark.read.parquet(path)
      .withColumn("f", input_file_name())
      .withColumn("prev", lag("o_totalprice", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f")
          .orderBy(monotonically_increasing_id())))
      .filter(col("prev") > col("o_totalprice")).count()
    assert(unsorted == 0, "rows inside every file must be in key order")
  }

  test("z-ordered write degrades to a plain write on empty and all-null input") {
    import spark.implicits._
    val path = "/tmp/graft_zorder_degenerate"
    // empty frame: percentile_approx returns a null array -> constant cell
    Sinks.parquetZOrdered(
      Seq.empty[(Long, Double)].toDF("a", "b"), path, "a", "b", parts = 4)
    assert(spark.read.parquet(path).count() == 0)
    // all-null quantile column: same degradation, rows preserved
    val nulls = Seq[(java.lang.Long, java.lang.Double)](
      (1L, null), (2L, null)).toDF("a", "b")
    Sinks.parquetZOrdered(nulls, path, "a", "b", parts = 4)
    assert(spark.read.parquet(path).count() == 2)
  }

  test("z-ordered layout skips more files than a single-column sort for 2-D boxes") {
    import spark.implicits._
    val orders = graft.Tables.orders(spark, Sf001) // 15k rows
    val zPath = "/tmp/graft_orders_zorder"
    val sPath = "/tmp/graft_orders_pricesorted"
    Sinks.parquetZOrdered(orders, zPath, "o_custkey", "o_totalprice", parts = 32)
    Sinks.parquetSorted(orders, sPath, "o_totalprice", parts = 32)

    // per-file (min, max) of the SECONDARY column — the footer stats a
    // custkey-selective scan would prune on
    def filesTouched(path: String, lo: Long, hi: Long): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("o_custkey").as("lo"), max("o_custkey").as("hi"))
        .filter(col("hi") >= lo && col("lo") <= hi)
        .count()
    def totalFiles(path: String): Long =
      spark.read.parquet(path).select(input_file_name()).distinct().count()

    // a box over the full price range but a narrow custkey band: the
    // price-sorted layout spreads every custkey across every file (no
    // pruning); z-order confines the band to a subset of files
    val allCust = orders.agg(max("o_custkey")).head().getLong(0)
    val (lo, hi) = (allCust / 2, allCust / 2 + allCust / 32)
    val zTouched = filesTouched(zPath, lo, hi)
    val sTouched = filesTouched(sPath, lo, hi)
    assert(totalFiles(zPath) >= 8, "need enough files for pruning to mean anything")
    assert(sTouched >= totalFiles(sPath) - 1,
      "price-sorted layout should be unprunable on custkey (control)")
    assert(zTouched * 2 <= sTouched,
      s"z-order should touch at most half the files: $zTouched vs $sTouched")
    // layout only: identical content
    assert(spark.read.parquet(zPath).count() == orders.count())
    // decimal-cast sums: IEEE double order differs by layout (by design)
    def checksum(path: String) = spark.read.parquet(path)
      .agg(sum(col("o_totalprice").cast("decimal(28,2)"))).head().getDecimal(0)
    assert(checksum(zPath) == checksum(sPath))
  }

  test("recoverTableSwap completes an interrupted drop-rename; rewrites self-heal") {
    import spark.implicits._
    val t = s"graft_swap_spec_${System.identityHashCode(this)}"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"DROP TABLE IF EXISTS ${t}_compact_staging")
    Seq(s"$t", s"${t}_compact_staging").foreach(
      Sinks.reclaimOrphanTableLocation(spark, _))
    // the crash state: replacement fully staged, main table dropped
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("parquet").saveAsTable(s"${t}_compact_staging")
    assert(!spark.catalog.tableExists(t))
    Sinks.recoverTableSwap(spark, t)
    assert(spark.catalog.tableExists(t) &&
      !spark.catalog.tableExists(s"${t}_compact_staging"))
    assert(spark.table(t).count() == 2)
    // a rewrite issued against the crash state also self-heals first
    Seq((3L, "c")).toDF("id", "v")
      .write.format("parquet").saveAsTable(s"${t}_compact_staging")
    spark.sql(s"DROP TABLE $t")
    Sinks.rewritePlainTable(spark, t, df => df.filter(col("id") =!= 3L))
    assert(spark.table(t).collect().map(_.getLong(0)).toSet == Set.empty[Long],
      "rewrite must operate on the RECOVERED table's rows")
    // no-op when the main table exists
    Sinks.recoverTableSwap(spark, t)
    assert(spark.catalog.tableExists(t))
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

}
