package graft.operators

import graft.SparkSpecBase
import graft.queries.Signals
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index (q162's engine): the probe must be
  * bit-identical to the direct corpus pass, and the index must actually
  * serve the query from term-pruned posting buckets.
  */
class TextIndexSpec extends SparkSpecBase {

  private val base = "graft_bm25idx_spec"
  private def drop(): Unit =
    Seq("_post", "_dl", "_stats").foreach(sfx =>
      spark.sql(s"DROP TABLE IF EXISTS $base$sfx"))

  test("indexed BM25 equals the direct corpus pass bit-for-bit") {
    drop()
    try {
      val docs = graft.Tables.documents(spark, Sf0001)
        .filter(col("text").isNotNull)
      val idx = TextIndex.saveBm25Index(docs, base, numBuckets = 8)
      val direct = Signals.bm25(docs, Signals.Bm25QueryTerms)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val probed = TextIndex.bm25Indexed(idx, Signals.Bm25QueryTerms)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(probed == direct, "probe must match the direct pass exactly")
      assert(direct.nonEmpty)
    } finally drop()
  }

  test("admitted index equals the full build: split-build, append, probe") {
    drop()
    val full = base + "_fullref"
    def dropFull(): Unit =
      Seq("_post", "_dl", "_stats").foreach(sfx =>
        spark.sql(s"DROP TABLE IF EXISTS $full$sfx"))
    dropFull()
    try {
      val docs = graft.Tables.documents(spark, Sf0001)
        .filter(col("text").isNotNull)
      val isBase = pmod(col("doc_id"), lit(2L)) === 0
      TextIndex.saveBm25Index(docs.filter(isBase), base, numBuckets = 8)
      val grown = TextIndex.appendBm25Index(docs.filter(!isBase), base,
        numBuckets = 8)
      val ref = TextIndex.saveBm25Index(docs, full, numBuckets = 8)
      def probe(i: TextIndex.Bm25Index) =
        TextIndex.bm25Indexed(i, Signals.Bm25QueryTerms)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(probe(grown) == probe(ref),
        "grown index must probe bit-identical to a full rebuild")
      // stats updated additively, no corpus rescan: totals must agree
      assert(grown.stats.collect()(0) == ref.stats.collect()(0))
      // compaction is physical layout only
      graft.sources.Sinks.compactBucketedTable(spark, s"${base}_post")
      graft.sources.Sinks.compactBucketedTable(spark, s"${base}_dl")
      val compacted = TextIndex.loadBm25Index(spark, base)
      assert(probe(compacted) == probe(ref))
    } finally { drop(); dropFull() }
  }

  test("streamed admission: per-micro-batch appends probe equal to the full build") {
    drop()
    val full = base + "_fullref2"
    def dropFull(): Unit =
      Seq("_post", "_dl", "_stats").foreach(sfx =>
        spark.sql(s"DROP TABLE IF EXISTS $full$sfx"))
    dropFull()
    try {
      val docs = graft.Tables.documents(spark, Sf0001)
        .filter(col("text").isNotNull)
      val isBase = pmod(col("doc_id"), lit(2L)) === 0
      TextIndex.saveBm25Index(docs.filter(isBase), base, numBuckets = 8)
      // the new documents arrive as a STREAM; each micro-batch admits
      // through the same appendBm25Index the batch path uses
      val arriving = docs.filter(!isBase).select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q = input.toDF().toDF("doc_id", "text")
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!b.isEmpty) { TextIndex.appendBm25Index(b, base, numBuckets = 8); () }
        }.start()
      try {
        val (a, b) = arriving.splitAt(arriving.length / 2)
        input.addData(a.toSeq); q.processAllAvailable()
        input.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      // appends ran in the micro-batch's cloned session — refresh ours
      Seq("_post", "_dl", "_stats").foreach(sfx =>
        spark.catalog.refreshTable(s"$base$sfx"))
      val grown = TextIndex.loadBm25Index(spark, base)
      val ref = TextIndex.saveBm25Index(docs, full, numBuckets = 8)
      def probe(i: TextIndex.Bm25Index) =
        TextIndex.bm25Indexed(i, Signals.Bm25QueryTerms)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(probe(grown) == probe(ref),
        "streamed admission diverged from full build")
    } finally { drop(); dropFull() }
  }

  test("df aggregation on the posting table plans without a shuffle") {
    drop()
    try {
      val docs = graft.Tables.documents(spark, Sf0001)
        .filter(col("text").isNotNull)
      val idx = TextIndex.saveBm25Index(docs, base, numBuckets = 8)
      // the per-term df agg groups on the bucket key of the pruned read:
      // partial+final collapse onto the bucketed scan, no exchange
      val dfAgg = idx.postings
        .filter(col("term").isin(Signals.Bm25QueryTerms: _*))
        .groupBy("term").agg(count(lit(1)).as("df"))
      val plan = dfAgg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(term"),
        s"df agg must ride the term bucketing:\n$plan")
      // bucket pruning: the IN-filter selects at most |terms| buckets
      assert(plan.contains("SelectedBucketsCount"),
        s"posting read must be bucket-pruned:\n$plan")
    } finally drop()
  }

  private val bgTable = "graft_bigram_spec"
  private def dropBg(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $bgTable")
    spark.sql(s"DROP TABLE IF EXISTS ${bgTable}_fullref")
    spark.sql(s"DROP TABLE IF EXISTS ${bgTable}_compact_staging")
  }

  test("bigram stats: build+admit+compact probes equal to the full build AND the direct pass") {
    dropBg()
    try {
      val docs = graft.Tables.documents(spark, Sf0001)
        .filter(col("text").isNotNull)
      def key(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getInt(1)) ->
          ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      val direct = key(TextIndex.bigramTopK(
        TextIndex.bigramPairs(docs).groupBy("tok", "nxt")
          .agg(count(lit(1)).as("cnt"))))
      assert(direct.nonEmpty)
      // full build in one shot
      TextIndex.saveBigramStats(docs, s"${bgTable}_fullref", numBuckets = 8)
      assert(key(TextIndex.bigramTopKIndexed(
        spark.table(s"${bgTable}_fullref"))) == direct)
      // grown lifecycle: thirds admitted in sequence, NO disjointness care
      val batchOf = pmod(xxhash64(col("doc_id")), lit(3L))
      TextIndex.saveBigramStats(docs.filter(batchOf === 0), bgTable, 8)
      TextIndex.appendBigramStats(docs.filter(batchOf === 1), bgTable, 8)
      TextIndex.appendBigramStats(docs.filter(batchOf === 2), bgTable, 8)
      assert(key(TextIndex.bigramTopKIndexed(spark.table(bgTable))) == direct)
      // semantic compaction: ≤ one file per bucket, same probe, partials folded
      TextIndex.compactBigramStats(bgTable, 8)
      val loc = new org.apache.hadoop.fs.Path(java.net.URI.create(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(bgTable))
          .location.toString))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.listStatus(loc).count(_.getPath.getName.endsWith(".parquet")) <= 8)
      assert(key(TextIndex.bigramTopKIndexed(spark.table(bgTable))) == direct)
      val rows = spark.table(bgTable)
      assert(rows.groupBy("tok", "nxt").count().filter(col("count") > 1).isEmpty,
        "compaction must fold to one row per pair")
      // the probe's fold rides the tok bucketing: no exchange below the agg
      val plan = spark.table(bgTable).groupBy("tok", "nxt")
        .agg(sum("cnt").as("cnt")).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(tok"),
        s"partial-count fold must ride the bucketing:\n$plan")
    } finally dropBg()
  }

  test("streamed bigram admission: per-micro-batch appends probe equal to the direct pass") {
    dropBg()
    try {
      val docs = graft.Tables.documents(spark, Sf0001)
        .filter(col("text").isNotNull)
      val isBase = pmod(col("doc_id"), lit(2L)) === 0
      TextIndex.saveBigramStats(docs.filter(isBase), bgTable, numBuckets = 8)
      val arriving = docs.filter(!isBase).select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q = input.toDF().toDF("doc_id", "text")
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!b.isEmpty) { TextIndex.appendBigramStats(b, bgTable, 8); () }
        }.start()
      try {
        val (a, b) = arriving.splitAt(arriving.length / 2)
        input.addData(a.toSeq); q.processAllAvailable()
        input.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      spark.catalog.refreshTable(bgTable)
      val direct = TextIndex.bigramTopK(
        TextIndex.bigramPairs(docs).groupBy("tok", "nxt")
          .agg(count(lit(1)).as("cnt")))
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap
      val probed = TextIndex.bigramTopKIndexed(spark.table(bgTable))
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap
      assert(probed == direct, "streamed admission diverged from direct pass")
      assert(direct.nonEmpty)
    } finally dropBg()
  }

  test("docNllFromStats: hand-computed micro-nat NLL, backoff, UnkNllMicro pin") {
    import spark.implicits._
    // the hardcoded backoff constant IS floor(-ln(1e-6)*1e6) — pinned so a
    // libm change can never silently shift it out from under the oracles
    assert(TextIndex.UnkNllMicro ==
      math.floor(-math.log(1e-6) * 1e6).toLong)
    // planted stats: (a,b)x3, (b,a)x1, (b,c)x1 → tot a=3, b=2
    // p_ppm(a,b) = 1e6 → nll 0; p_ppm(b,·) = 500000 → floor(-ln(.5)*1e6)
    val stats = Seq(("a", "b", 3L), ("b", "a", 1L), ("b", "c", 1L))
      .toDF("tok", "nxt", "cnt")
    val halfNll = math.floor(-math.log(0.5) * 1e6).toLong // 693147
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextIndex.docNllFromStats(docs, stats)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // d1: pairs (a,b)(b,a)(a,b) → 0 + 693147 + 0
    assert(got(1L) == ((3L, halfNll, halfNll / 3)))
    // d2: pairs (a,b)(b,c) → 0 + 693147
    assert(got(2L) == ((2L, halfNll, halfNll / 2)))
    // scoring NEW text against the frozen stats: unseen bigram backs off
    val unk = TextIndex.docNllFromStats(
      Seq((9L, "x y")).toDF("doc_id", "text"), stats)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(unk(9L) == TextIndex.UnkNllMicro)
    // sub-2-token docs have no bigram and are dropped, not zero-scored
    assert(TextIndex.docNllFromStats(
      Seq((8L, "solo")).toDF("doc_id", "text"), stats).isEmpty)
  }

  test("bpeMergeRounds reproduces a known merge sequence on a planted corpus") {
    import spark.implicits._
    // pair counts: (a,b)=3, (b,c)=2, (b,a)=1, (c,c)=1
    // round 0 merges (a,b)->ab: "ab ab c" / "ab c c"
    // round 1 pairs: (ab,ab)=1, (ab,c)=2, (c,c)=1 -> merges (ab,c)->abc:
    //   "ab abc" / "abc c"
    // round 2 pairs: (ab,abc)=1, (abc,c)=1 -> tie, lexicographic tok
    //   picks (ab,abc)->ababc
    val docs = Seq((1L, "a b a b c"), (2L, "a b c c")).toDF("doc_id", "text")
    val got = TextIndex.bpeMergeRounds(docs, rounds = 3)
      .orderBy("merge_round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0, "a", "b", "ab", 3L),
      (1, "ab", "c", "abc", 2L),
      (2, "ab", "abc", "ababc", 1L)))
  }

  test("bpeMergeRounds run-merge is greedy left-to-right (the published semantics)") {
    import spark.implicits._
    // "a a a a a": (a,a) counts 4 (overlaps count); the greedy rewrite
    // merges non-overlapping leftmost-first -> "aa aa a"
    // round 1: (aa,aa)=1, (aa,a)=1 -> tie on cnt, tok equal, nxt "a"<"aa"
    //   picks (aa,a) -> "aa aaa" (the SECOND aa is the one followed by a)
    // round 2: (aa,aaa)=1
    val docs = Seq((1L, "a a a a a")).toDF("doc_id", "text")
    val got = TextIndex.bpeMergeRounds(docs, rounds = 3)
      .orderBy("merge_round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0, "a", "a", "aa", 4L),
      (1, "aa", "a", "aaa", 1L),
      (2, "aa", "aaa", "aaaaa", 1L)))
  }

  test("bpeMergeRounds at 16 rounds: ckpt cadences equal the lazy plan and a driver-side reference") {
    import spark.implicits._
    // a corpus rich enough that 16 merge rounds never exhaust the pair
    // stream; deterministic token soup over an 11-token vocabulary
    val corpus = (1 to 8).map(i => (i.toLong,
      (0 until 24).map(j => "t" + ((i * 7 + j * j) % 11)).mkString(" ")))
    // driver-side reference: count adjacent pairs (overlaps count), pick
    // (cnt DESC, tok ASC, nxt ASC), merge greedy left-to-right
    // non-overlapping — the published semantics the operator encodes
    var docs0: Seq[Array[String]] = corpus.map(_._2.split(" ").toArray)
    val expected = (0 until 16).flatMap { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      docs0.foreach(ts => ts.zip(ts.tail).foreach(p =>
        counts(p) = counts.getOrElse(p, 0L) + 1))
      if (counts.isEmpty) Nil
      else {
        val ((tok, nxt), cnt) =
          counts.toSeq.minBy { case ((t, n), c) => (-c, t, n) }
        docs0 = docs0.map { ts =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < ts.length) {
            if (i + 1 < ts.length && ts(i) == tok && ts(i + 1) == nxt) {
              out += tok + nxt; i += 2
            } else { out += ts(i); i += 1 }
          }
          out.toArray
        }
        Seq((r, tok, nxt, tok + nxt, cnt))
      }
    }
    assert(expected.size == 16,
      s"planted corpus exhausted early: ${expected.size} rounds")
    val df = corpus.toDF("doc_id", "text")
    def run(rounds: Int, ckptEvery: Int, dir: Option[String]) =
      TextIndex.bpeMergeRounds(df, rounds = rounds, ckptEvery = ckptEvery,
          checkpointDir = dir)
        .orderBy("merge_round").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
    // lazy unrolled plan only to its fence: the plan tree is EXPONENTIAL
    // in rounds (round r references round r-1 twice), so lazy-16 is
    // minutes of pure Catalyst analysis — the exact failure mode the
    // ckptEvery cadence exists for, fenced loudly in the operator
    assert(run(6, 0, None) == expected.take(6))
    assert(intercept[IllegalArgumentException] {
      TextIndex.bpeMergeRounds(df, rounds = 16)
    }.getMessage.contains("EXPONENTIAL"))
    assert(run(16, 4, None) == expected) // local-checkpoint cadence
    val tmp = java.nio.file.Files.createTempDirectory("bpeckpt").toString
    assert(run(16, 3, Some(tmp)) == expected) // reliable-checkpoint cadence
  }

  test("bpeEncode applies the merge table in training order") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c"), (2L, "a b c c")).toDF("doc_id", "text")
    val merges = TextIndex.bpeMergeRounds(docs, rounds = 2)
    val out = TextIndex.bpeEncode(docs, merges).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[String](3).toList))).toMap
    // round 0 merges (a,b)->ab, round 1 (ab,c)->abc; encode must replay
    // that exact order ("abc" only exists because "ab" merged first)
    assert(out(1L) == (5L, 2L, List("ab", "abc")))
    assert(out(2L) == (4L, 2L, List("abc", "c")))
  }
}
