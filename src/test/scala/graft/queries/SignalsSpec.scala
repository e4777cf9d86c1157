package graft.queries

import graft.SparkSpecBase
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Round-5 signal/analytics queries: planted-answer unit tests plus the
  * physical contracts (partition pruning, quantized-centroid exactness,
  * argmax-not-window selection).
  */
class SignalsSpec extends SparkSpecBase {
  import spark.implicits._

  test("keepBest keeps the highest-scored doc per cluster, min id on ties") {
    // clusters {1,2,3} and {10,11}; 20 unclustered
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("doc_id_a", "doc_id_b")
    val scored = Seq(
      1L -> 0.5, 2L -> 0.9, 3L -> 0.9, // 2 and 3 tie on score -> 2 wins
      10L -> 0.4, 11L -> 0.8,          // 11 wins outright
      20L -> 0.1                       // singleton survives
    ).toDF("doc_id", "quality")
    val out = Dedup.keepBest(scored, pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((2L, 0.9, 3L)),
      10L -> ((11L, 0.8, 2L)),
      20L -> ((20L, 0.1, 1L))))
  }

  test("labelCentroids is the exact quantized mean, invariant to partitioning") {
    // components chosen so the float mean is NOT exactly representable
    // (1/3-style) — the quantized contract still gives one exact answer
    val vecs = Seq(
      (0, Array(0.25f, 1.0f)), (0, Array(0.5f, 2.0f)), (0, Array(0.5f, -1.0f)),
      (1, Array(-0.125f, 0.0f))
    ).toDF("label", "embedding")
    def cents(df: org.apache.spark.sql.DataFrame) =
      Similarity.labelCentroids(df).collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toList).toMap
    // hand-compute on the quantized grid: all inputs are exact dyadics
    // here, so floor() does not truncate and the mean is sum/n/2^20
    val l0 = List(
      (math.floor(0.25 * 1048576) + math.floor(0.5 * 1048576) * 2) / 3 / 1048576.0,
      (math.floor(1.0 * 1048576) + math.floor(2.0 * 1048576) + math.floor(-1.0 * 1048576)) / 3 / 1048576.0)
    val got1 = cents(vecs.repartition(1))
    val got8 = cents(vecs.repartition(8))
    assert(got1 == got8)
    assert(got1(0) == l0)
    assert(got1(1) == List(-0.125, 0.0))
  }

  test("funnel stages classify planted users 0..4") {
    def ev(u: Long, t: String, sec: Int) =
      (u, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d"), t)
    val events = Seq(
      ev(1, "error", 1),                                    // no signup -> 0
      ev(2, "signup", 1),                                   // signup only -> 1
      ev(3, "view", 1), ev(3, "signup", 2),                 // view BEFORE signup -> 1
      ev(4, "signup", 1), ev(4, "view", 2),                 // -> 2
      ev(5, "signup", 1), ev(5, "view", 2), ev(5, "click", 3), // -> 3
      ev(6, "signup", 1), ev(6, "view", 2), ev(6, "click", 3), ev(6, "purchase", 4), // -> 4
      ev(7, "signup", 2), ev(7, "purchase", 1)              // purchase before chain -> 1
    ).toDF("user_id", "ts", "event_type")
    def firstTs(t: String) = min(when(col("event_type") === t, col("ts")))
    val out = events.groupBy("user_id")
      .agg(firstTs("signup").as("t_signup"), firstTs("view").as("t_view"),
           firstTs("click").as("t_click"), firstTs("purchase").as("t_purchase"))
      .select(col("user_id"),
        when(col("t_signup").isNull, 0)
          .when(col("t_view").isNull || col("t_view") <= col("t_signup"), 1)
          .when(col("t_click").isNull || col("t_click") <= col("t_view"), 2)
          .when(col("t_purchase").isNull || col("t_purchase") <= col("t_click"), 3)
          .otherwise(4).cast("int").as("funnel_stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3, 6L -> 4, 7L -> 1))
    // user 7: purchase exists but precedes the chain — the strict ordering
    // contract (not mere presence) is what the planted case pins
  }

  test("q84 scan prunes to exactly one date partition and matches the raw filter") {
    val pruned = Signals.q84PartitionPruned(spark, Sf0001)
    pruned.collect() // materialize AQE stages before walking the plan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children.flatMap(allNodes) ++ (p match {
        case q: QueryStageExec => allNodes(q.plan)
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case _ => Seq.empty
      }))
    val scan = allNodes(pruned.queryExecution.executedPlan).collectFirst {
      case f: FileSourceScanExec if f.partitionFilters.nonEmpty => f
    }
    assert(scan.isDefined, "expected a scan with PartitionFilters")
    assert(scan.get.selectedPartitions.partitionCount == 1,
      s"expected 1 selected partition, got ${scan.get.selectedPartitions.partitionCount}")
    // physical layout only: same result as filtering the unpartitioned table
    val raw = graft.Tables.events(spark, Sf0001)
      .filter(to_date(col("ts")) === to_date(lit("2024-01-15")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("total_value"))
    assert(pruned.collect().map(_.toSeq).toSet == raw.collect().map(_.toSeq).toSet)
  }

  test("q97 z-order read: band predicate reaches the scan and skips files") {
    // build the layout via the query's own memoizer, then measure the
    // footer-stats skipping for q97's exact band (the per-file min/max a
    // parquet reader prunes row groups on)
    val out = Signals.q97ZOrderRead(spark, Sf001)
    val path = ZOrderedOrders.ensure(spark, Sf001)
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_custkey").as("clo"), max("o_custkey").as("chi"),
           min("o_totalprice").as("plo"), max("o_totalprice").as("phi"))
    val total = perFile.count()
    val touched = perFile
      .filter(col("chi") >= 40L && col("clo") <= 120L &&
              col("phi") >= 50000.0 && col("plo") <= 200000.0)
      .count()
    // parts=8, but repartitionByRange's sampled boundaries may merge
    // neighbouring dyadic squares into one file
    assert(total >= 4, s"need enough files for skipping to mean anything: $total")
    assert(touched < total,
      s"q97's band must skip at least one file: $touched of $total touched")
    // the band predicate is pushed to the parquet scan (row-group pruning)
    val scanStr = out.queryExecution.executedPlan.toString
    assert(scanStr.contains("PushedFilters") &&
           scanStr.contains("GreaterThanOrEqual(o_custkey,40)"),
      s"band filter not pushed:\n$scanStr")
    // physical layout only: same result as the plain table
    val raw = graft.Tables.orders(spark, Sf001)
      .filter(col("o_custkey").between(40L, 120L) &&
              col("o_totalprice").between(50000.0, 200000.0))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("total_price"))
    assert(out.collect().map(_.toSeq).toSet == raw.collect().map(_.toSeq).toSet)
  }

  test("q81 keep-best output is one row per cluster and covers all non-dup docs") {
    val out = Signals.q81DedupKeepBest(spark, Sf0001)
    val clusters = out.select("cluster").collect().map(_.getLong(0))
    assert(clusters.length == clusters.distinct.length)
    // every kept doc_id belongs to its own cluster's member set: kept == its
    // cluster id for singletons
    val singles = out.filter(col("n_docs") === 1)
    assert(singles.filter(col("cluster") =!= col("doc_id")).count() == 0)
  }

  test("q80 rarity: planted corpus frequencies") {
    val docs = Seq(
      (1L, "aa bb"),   // aa appears 3x in corpus, bb 2x -> mean 2.5, min 2
      (2L, "aa aa cc"),
      (3L, "bb")
    ).toDF("doc_id", "text")
    val tf = docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy("term").agg(sum("tf").as("cf"))
    val out = tf.join(cf, "term").groupBy("doc_id")
      .agg((sum(col("tf") * col("cf")).cast("double") / sum("tf")).as("mean_cf"),
           min("cf").as("min_cf"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(out == Map(
      1L -> ((2.5, 2L)),       // (3 + 2) / 2
      2L -> (((3 * 2 + 1).toDouble / 3, 1L)), // aa tf=2 cf=3, cc tf=1 cf=1
      3L -> ((2.0, 2L))))
  }

  test("q80 salted join: Zipf head spreads over >= k salt buckets, output unchanged") {
    val k = 4
    // planted Zipf head: 'the' appears in all 64 docs (the hot join key);
    // each doc also carries a unique rare term
    val docs = (0L until 64L).map(i => (i, s"the the rare_$i")).toDF("doc_id", "text")
    val plain = Signals.tokenRarity(docs, saltBuckets = 0)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val salted = Signals.tokenRarity(docs, saltBuckets = k)
    val got = salted.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got == plain, "salting must not change the result")
    // the hot term's postings really land on >= k distinct (term, salt)
    // reducer keys: doc_id-derived salt over the 64 hot-term postings
    val spread = docs.select(
        graft.operators.Skew.saltFor(col("doc_id"), k).as("salt"))
      .distinct().count()
    assert(spread == k.toLong, s"expected the hot key on $k buckets, got $spread")
    // and the plan is a real salted join, not a re-aggregation detour
    assert(salted.queryExecution.optimizedPlan.toString.contains("__salt"))
  }
  test("q89 islands: runs split exactly at type changes, in time order") {
    import java.sql.Timestamp
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val ev = Seq(
      (1L, ts(0), 7L, "view"), (2L, ts(1), 7L, "view"), (3L, ts(2), 7L, "click"),
      (4L, ts(3), 7L, "view"), (5L, ts(0), 8L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    ev.write.mode("overwrite").parquet("/tmp/graft_islands_fixture/events.parquet")
    val out = Signals.q89TypeIslands(spark, "/tmp/graft_islands_fixture")
      .orderBy("user_id", "island").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (7L, 1L, "view", 2L), (7L, 2L, "click", 1L), (7L, 3L, "view", 1L),
      (8L, 1L, "click", 1L)))
  }

  test("q90 gap fill: spine densifies missing days and LOCF carries values") {
    val out = Signals.q90GapFill(spark, Sf0001)
    // spine completeness: per user, rows == span days, no duplicate days
    val spans = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"), countDistinct("d").as("nd"),
        (datediff(max("d"), min("d")) + 1).as("span"))
      .collect()
    assert(spans.nonEmpty)
    spans.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), "duplicate spine days")
      assert(r.getLong(1) == r.getInt(3).toLong, s"spine not dense: $r")
    }
    // LOCF: filled is never null, equals day_value on non-gap days
    assert(out.filter(col("filled").isNull).count() == 0)
    assert(out.filter(!col("is_gap") && col("filled") =!= col("day_value")).count() == 0)
    // every gap day's filled value equals the most recent earlier real day
    val gaps = out.filter(col("is_gap")).limit(5).collect()
    gaps.foreach { g =>
      // timestamp_ntz rows surface as LocalDateTime
      val d = g.getAs[java.time.LocalDateTime]("d")
      val prev = out.filter(col("user_id") === g.getLong(0) && !col("is_gap") &&
          col("d") < lit(d))
        .orderBy(col("d").desc).limit(1).collect()(0).getDouble(2)
      assert(g.getDouble(3) == prev, s"LOCF mismatch for $g")
    }
  }

  test("q111 OOV rate: planted top-20 vocabulary, rare terms flagged, vocab broadcast") {
    // 20 common terms with cf >= 2 fill the top-20 cutoff exactly; two
    // cf=1 rare terms fall outside it and must count as OOV.
    val commons = (1 to 20).map(i => f"c$i%02d")
    val docs = Seq(
      (1L, commons.mkString(" ")),
      (2L, commons.mkString(" ")),
      (3L, s"${commons.head} rare1 rare2")
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet("/tmp/graft_oov_fixture/documents.parquet")
    val out = Signals.q111OovRate(spark, "/tmp/graft_oov_fixture")
    val got = out.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      1L -> ((20L, 0L, 0.0)),
      2L -> ((20L, 0L, 0.0)),
      3L -> ((3L, 2L, 2.0 / 3))))
    // the membership test must be a broadcast join of the bounded vocab,
    // never a shuffle of the corpus-side token explode
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"vocab join not broadcast:\n$plan")
  }

  test("bm25: planted ranking — more hits beats fewer at equal length, shorter doc beats longer at equal tf") {
    // 4-token docs: d1 has 2 hits of 'q', d2 has 1; d3 repeats d2's tf at
    // double length. 'z'-only d4 must not appear (no query term).
    val docs = Seq(
      (1L, "q q z z"),
      (2L, "q z z z"),
      (3L, "q z z z z z z z"),
      (4L, "z z z z")
    ).toDF("doc_id", "text")
    val got = Signals.bm25(docs, Seq("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) > got(2L), s"tf should raise the score: $got")
    assert(got(2L) > got(3L), s"length should damp the score: $got")
    // corpus stats and df frames ride broadcasts; the postings explode
    // itself must never be broadcast
    val plan = Signals.q118Bm25(spark, Sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"df join not broadcast:\n$plan")
  }

  test("q127 trend matches a driver-side least-squares fit exactly") {
    val out = Signals.q127SourceTrend(spark, Sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    // recompute one source's fit from raw rows on the driver
    val rows = spark.read.parquet(s"$Sf0001/documents.parquet")
      .filter(col("text").isNotNull && col("source") === "src0")
      .select(length(col("text")).cast("long"),
        size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = rows.length.toLong
    val (sx, sy) = (rows.map(_._1).sum, rows.map(_._2).sum)
    val sxy = rows.map(p => p._1 * p._2).sum
    val (sxx, syy) = (rows.map(p => p._1 * p._1).sum, rows.map(p => p._2 * p._2).sum)
    val num = n * sxy - sx * sy
    val (dx, dy) = (n * sxx - sx * sx, n * syy - sy * sy)
    val (slope, r) = (num.toDouble / dx.toDouble,
      num.toDouble / (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble)))
    val (gs, gi, gr) = out("src0")
    assert(gs == slope && gr == r, s"got ($gs, $gr) want ($slope, $r)")
    assert(gi == (sy.toDouble - slope * sx.toDouble) / n.toDouble)
    // token-per-char trends must correlate strongly on whitespace text
    assert(gr > 0.9, s"tokens~chars correlation should be strong, got $gr")
  }

  test("q154 incremental heavy hitters equals q116 under any chunking") {
    val exact = Signals.q116HeavyTokens(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(exact.nonEmpty, "fixture should carry at least one heavy token")
    val inc = Signals.q154HeavyIncremental(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(inc == exact, "4-batch replay diverged from the exact answer")
    // chunking invariance: a different batch count must not change the
    // certified recount (the MG state may differ; the answer may not)
    val docs = graft.Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull)
    val other = Signals.heavyTokensIncremental(docs, 8192, 2000L, numBatches = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(other == exact, "7-batch replay diverged from the exact answer")
  }

  test("q128 finds exactly the docs containing every query term") {
    val got = Signals.q128ContainsAll(spark, Sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = spark.read.parquet(s"$Sf0001/documents.parquet")
      .filter(col("text").isNotNull)
      .filter(array_contains(split(col("text"), " "), "hash") &&
        array_contains(split(col("text"), " "), "join") &&
        array_contains(split(col("text"), " "), "scan"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("q166 bigram LM: hand-computed successors on a planted corpus") {
    import spark.implicits._
    // "a b a b a c" -> a:{b:2,c:1}, b:{a:2}; "b a" -> b:{a:1}
    Seq((1L, "a b a b a c"), (2L, "b a"), (3L, "x"), (4L, null: String))
      .toDF("doc_id", "text")
      .createOrReplaceTempView("bigram_fixture")
    val docs = spark.table("bigram_fixture")
    // same pair/window algebra as q166, applied to the fixture frame
    val ts = split(col("text"), " ")
    val pairs = docs.filter(col("text").isNotNull && size(ts) >= 2)
      .select(explode(zip_with(
        slice(ts, lit(1), size(ts) - 1),
        slice(ts, lit(2), size(ts) - 1),
        (a, b) => struct(a.as("tok"), b.as("nxt")))).as("p"))
      .select(col("p.tok"), col("p.nxt"))
    val counts = pairs.groupBy("tok", "nxt").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts == Map(
      ("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "a") -> 3L))
    // whole-query invariants on the real fixture: rk dense 1..<=3 per tok,
    // p_ppm = cnt*1e6 DIV tot, cnt non-increasing in rk (ties by nxt asc)
    val rows = Signals.q166BigramLm(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (tok, rs) =>
      val byRk = rs.sortBy(_.getInt(1))
      assert(byRk.map(_.getInt(1)).toSeq == (1 to byRk.length), tok)
      byRk.sliding(2).foreach {
        case Array(x, y) =>
          val (cx, cy) = (x.getLong(3), y.getLong(3))
          assert(cx > cy ||
            (cx == cy && x.getString(2) < y.getString(2)), tok)
        case _ =>
      }
      byRk.foreach { r =>
        assert(r.getLong(5) == r.getLong(3) * 1000000L / r.getLong(4))
      }
    }
    // the windows must run AFTER pair aggregation (vocab^2-bounded input),
    // never over raw postings: exactly one HashAggregate pair below Window
    val plan = Signals.q166BigramLm(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.indexOf("Window") < plan.indexOf("HashAggregate"),
      s"window must consume the aggregated pair table:\n$plan")
  }

}
