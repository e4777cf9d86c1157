package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpecBase {

  private lazy val docs =
    graft.Tables.documents(spark, Sf001).select("doc_id", "lang", "source")

  test("hash sampling is deterministic, and 0/100 are exact bounds") {
    val s1 = Sampling.hashSample(docs, "doc_id", 30).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(docs, "doc_id", 30).collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    assert(Sampling.hashSample(docs, "doc_id", 100).count() == docs.count())
    assert(Sampling.hashSample(docs, "doc_id", 0).count() == 0L)
  }

  test("NULL ids get a defined bucket: pct=100 really keeps every row") {
    import spark.implicits._
    val df = Seq(Some(1L), Some(2L), None).toDF("doc_id")
    assert(Sampling.hashSample(df, "doc_id", 100).count() == 3L)
    // and the NULL row's fate is deterministic at any rate
    val k30a = Sampling.hashSample(df, "doc_id", 30).collect().length
    val k30b = Sampling.hashSample(df, "doc_id", 30).collect().length
    assert(k30a == k30b)
  }

  test("upsampleToMixture: integer epochs exact, fractional epoch ~ rate, downweight degenerates") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "src")
    // a: 2.5 epochs -> every doc 2 or 3 copies; b: 0.4 -> resample rule
    val weights = Seq(("a", 2500000L), ("b", 400000L)).toDF("src", "weight_ppm")
    val out = Sampling.upsampleToMixture(df, "doc_id", "src", weights)
    val perDoc = out.filter(col("src") === "a").groupBy("doc_id").count()
      .collect().map(_.getLong(1))
    assert(perDoc.forall(n => n == 2L || n == 3L))
    val aCopies = perDoc.sum.toDouble / perDoc.length
    assert(aCopies > 2.4 && aCopies < 2.6, s"mean a-copies $aCopies")
    // epochs are a dense 0..n-1 index per doc
    val maxEpoch = out.filter(col("src") === "a").groupBy("doc_id")
      .agg(max("epoch").as("m"), count(lit(1)).as("n"))
      .filter(col("m") =!= col("n") - 1).count()
    assert(maxEpoch == 0L)
    // weight <= 1e6: identical doc set to resampleToMixture, all epoch 0
    val up = out.filter(col("src") === "b")
    val down = Sampling.resampleToMixture(df.filter(col("src") === "b"),
      "doc_id", "src", weights)
    assert(up.filter(col("epoch") =!= 0L).count() == 0L)
    assert(up.select("doc_id").collect().map(_.getLong(0)).toSet ==
      down.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("ppsSystematic: exactly k hits per stratum, window-equivalent, partition-invariant") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
          .as("w"))
    val k = 7
    val out = Sampling.ppsSystematic(docs, "source", "doc_id", col("w"), k)
    // Σ n_hits == k for every stratum — the operator's defining identity
    val sums = out.groupBy("source").agg(sum("n_hits").as("s"))
      .filter(col("s") =!= k).count()
    assert(sums == 0L, "every stratum must get exactly k hits")
    // equal to the naive per-stratum window cumsum formulation
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs
      .withColumn("cb", coalesce(sum("w").over(win), lit(0L)))
      .withColumn("t", sum("w").over(Window.partitionBy("source")))
      .withColumn("n_hits",
        expr(s"((cb + w) * $k) DIV t - (cb * $k) DIV t"))
      .filter(col("n_hits") >= 1)
      .select("source", "doc_id", "n_hits")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = out.select("source", "doc_id", "n_hits")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive, s"missed=${naive -- got} extra=${got -- naive}")
    // reproducible at a different parallelism
    val got2 = Sampling.ppsSystematic(docs.repartition(13), "source",
        "doc_id", col("w"), k)
      .select("source", "doc_id", "n_hits")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got2 == got)
  }

  test("splitAssign: cluster-keyed, leak-free, covers ~90/5/5") {
    val d = graft.Tables.documents(spark, Sf001)
      .filter(col("text").isNotNull)
      .withColumn("fp", md5(col("text")))
      .withColumn("split", Sampling.splitAssign(col("fp")))
    // the no-leakage invariant: a cluster fingerprint maps to ONE split
    val leaked = d.groupBy("fp")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1).count()
    assert(leaked == 0L, "a duplicate cluster must never straddle splits")
    // split masses are ballpark-right at the cluster level
    val bySplit = d.select("fp", "split").distinct()
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = bySplit.values.sum.toDouble
    assert(bySplit("train") / total > 0.8, s"train share: $bySplit")
    assert(bySplit.getOrElse("val", 0L) > 0 && bySplit.getOrElse("test", 0L) > 0,
      s"val/test must be populated: $bySplit")
    // determinism across partitioning
    val a = d.select("fp", "split").distinct().collect().map(_.toSeq).toSet
    val b = graft.Tables.documents(spark, Sf001).repartition(13)
      .filter(col("text").isNotNull)
      .withColumn("fp", md5(col("text")))
      .withColumn("split", Sampling.splitAssign(col("fp")))
      .select("fp", "split").distinct().collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("stratified rates hold per stratum on the fixture") {
    val sample = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 100, "de" -> 50), defaultPct = 25)
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = sample.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("en") == total("en")) // rate 100 keeps everything, exactly
    val deRatio = kept("de").toDouble / total("de")
    assert(deRatio > 0.3 && deRatio < 0.7, s"de keep ratio $deRatio")
    val restTotal = total.filterNot(k => Set("en", "de")(k._1)).values.sum
    val restKept = kept.filterNot(k => Set("en", "de")(k._1)).values.sum
    val restRatio = restKept.toDouble / restTotal
    assert(restRatio > 0.12 && restRatio < 0.38, s"default keep ratio $restRatio")
  }

  test("weightedKPerStratum: deterministic, exactly min(k,n), no repeats, zero/null weights excluded") {
    import spark.implicits._
    val df = ((1 to 40).map(i => (i.toLong, "a", (i % 7 + 1).toDouble)) ++
      (41 to 44).map(i => (i.toLong, "b", 1.0)) ++
      Seq((45L, "b", 0.0), (46L, "b", 2.0)))
      .toDF("id", "s", "w")
      .withColumn("w", when(col("id") === 46L, lit(null)).otherwise(col("w")))
    def run() = Sampling.weightedKPerStratum(df, "id", "s", col("w"), 10, "t1")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val got = run()
    assert(got == run(), "selection must be rerun-deterministic")
    val byS = got.groupBy(_._1)
    assert(byS("a").size == 10)
    // stratum b has 6 rows but two are undrawable (w=0, w=null)
    assert(byS("b").size == 4 && !byS("b").exists(t => t._3 == 45L || t._3 == 46L))
    // without replacement: ids unique per stratum, ranks dense 1..k
    assert(byS("a").map(_._3).size == 10)
    assert(byS("a").map(_._2) == (1 to 10).toSet)
  }

  test("weightedKPerStratum favors heavy rows (weight monotone in expectation)") {
    import spark.implicits._
    // 500 light rows (w=1) vs 500 heavy rows (w=20): heavy should take
    // the overwhelming share of 100 draws. Exact per-seed determinism is
    // the contract, so one seed suffices; P(heavy row drawn before any
    // given light row) = 20/21.
    val df = (1 to 1000).map(i =>
      (i.toLong, "g", if (i <= 500) 1.0 else 20.0)).toDF("id", "s", "w")
    val picked = Sampling.weightedKPerStratum(df, "id", "s", col("w"), 100, "mono")
      .collect().map(_.getLong(2))
    val heavy = picked.count(_ > 500)
    assert(heavy > 80, s"expected heavy-weight dominance, got $heavy/100 heavy")
    // and the same draw equals the window formulation (the A-ES rank
    // definition itself) computed in-Spark
    val m = conv(substring(md5(concat(lit("mono:"), col("id").cast("string"))), 1, 13), 16, 10).cast("long")
    val pri = -log((m + lit(1L)).cast("double") / lit(4503599627370496.0)) / col("w")
    val expect = df.withColumn("pri", pri)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("s").orderBy(col("pri"), col("id"))))
      .filter(col("rk") <= 100).collect().map(_.getLong(0)).toSet
    assert(picked.toSet == expect)
  }

  test("near-dup-safe split: no jaccard pair ever straddles train/val/test") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull)
    val pairs = Dedup.jaccardPairs(docs, threshold = 0.8)
      .select("doc_id_a", "doc_id_b")
    val labels = Dedup.contractedComponents(pairs, stitch = "star")
    val splits = docs.select("doc_id")
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .withColumn("split", Sampling.splitAssign(col("cluster")))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val pr = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pr.nonEmpty)
    pr.foreach { case (a, b) =>
      assert(splits(a) == splits(b),
        s"near-dup pair ($a, $b) straddles ${splits(a)}/${splits(b)}")
    }
  }
}
