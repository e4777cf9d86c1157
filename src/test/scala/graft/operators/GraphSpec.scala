package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  /** Independent reference: the integer recurrence computed with plain
    * Scala maps — no Spark, no SQL. */
  private def referencePr(edges: Seq[(String, String)], iterations: Int,
                          scale: Long = Graph.DefaultScale): Map[String, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = out.size.toLong
    var pr = out.keys.map(_ -> scale / n).toMap
    for (_ <- 1 to iterations) {
      val ins = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      out.foreach { case (u, vs) =>
        val c = pr(u) / vs.size
        vs.foreach(v => ins(v) += c)
      }
      pr = out.keys.map(v => v -> ((3 * scale) / (20 * n) + 17 * ins(v) / 20)).toMap
    }
    pr
  }

  test("fixedPointPageRank matches the plain-Scala recurrence on a planted graph") {
    // a triangle plus a pendant pair: asymmetric degrees, full coverage
    val planted = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c",
      "c" -> "d", "d" -> "c")
    val got = Graph.fixedPointPageRank(
        planted.toDF("src", "dst"), iterations = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == referencePr(planted, 4))
    // more-linked-to c must outrank the pendant d
    assert(got("c") > got("d"))
  }

  test("q167's trade graph reproduces the reference trajectory at sf0.001") {
    val sc = graft.Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.Tables.orders(spark, Sf0001)
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("S"), col("l_suppkey")).as("s"),
        concat(lit("C"), col("o_custkey")).as("c"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val sym = sc.toSeq ++ sc.map { case (s, c) => (c, s) }
    val want = referencePr(sym, 3)
    val got = Graph.fixedPointPageRank(
        sym.toDF("src", "dst"), iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    // every node ranked exactly once; probability mass stays bounded by
    // SCALE (teleport truncation only ever loses mass, never creates it)
    assert(got.keySet == sym.map(_._1).toSet)
    assert(got.values.sum <= Graph.DefaultScale)
  }

  /** Personalized variant of [[referencePr]]: teleport only on seeds. */
  private def referencePpr(edges: Seq[(String, String)], seeds: Set[String],
                           iterations: Int,
                           scale: Long = Graph.DefaultScale): Map[String, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val s = seeds.intersect(out.keySet)
    val k = s.size.toLong
    var pr = out.keys.map(v => v -> (if (s(v)) scale / k else 0L)).toMap
    for (_ <- 1 to iterations) {
      val ins = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      out.foreach { case (u, vs) =>
        val c = pr(u) / vs.size
        vs.foreach(v => ins(v) += c)
      }
      pr = out.keys.map(v => v ->
        ((if (s(v)) (3 * scale) / (20 * k) else 0L) + 17 * ins(v) / 20)).toMap
    }
    pr
  }

  test("personalizedPageRank matches the reference; authority stays near seeds") {
    val planted = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c",
      "c" -> "d", "d" -> "c")
    val seeds = Seq("a").toDF("id")
    val got = Graph.personalizedPageRank(planted.toDF("src", "dst"), seeds, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == referencePpr(planted, Set("a"), 4))
    // the thrice-linked hub c (fed directly by the seed) dominates the
    // non-seed field; the seed itself keeps its teleport mass
    assert(got("c") > got("b") && got("c") > got("d") && got("a") > 0L)
    // seeds outside the node set are ignored, not mass sinks
    val got2 = Graph.personalizedPageRank(planted.toDF("src", "dst"),
        Seq("a", "zz").toDF("id"), 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2 == referencePpr(planted, Set("a"), 2))
  }

  test("q170's seeded trade graph reproduces the reference trajectory at sf0.001") {
    val sc = graft.Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.Tables.orders(spark, Sf0001)
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("S"), col("l_suppkey")).as("s"),
        concat(lit("C"), col("o_custkey")).as("c"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val sym = sc.toSeq ++ sc.map { case (s, c) => (c, s) }
    val seedSet = graft.Tables.supplier(spark, Sf0001)
      .filter(col("s_nationkey") < 5)
      .select(concat(lit("S"), col("s_suppkey")))
      .collect().map(_.getString(0)).toSet
    val want = referencePpr(sym, seedSet, 3)
    val got = Graph.personalizedPageRank(sym.toDF("src", "dst"),
        seedSet.toSeq.toDF("id"), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  /** Plain-Scala HITS with the max-quantized normalization. */
  private def referenceHits(edges: Seq[(String, String)], iterations: Int,
                            scale: Long = Graph.DefaultScale)
      : (Map[String, Long], Map[String, Long]) = {
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val in = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var hub = out.keys.map(_ -> scale).toMap
    var auth = Map.empty[String, Long]
    for (_ <- 1 to iterations) {
      val araw = in.view.mapValues(_.map(hub).sum).toMap
      val ga = math.max(1L, araw.values.max / scale)
      auth = araw.view.mapValues(_ / ga).toMap
      val hraw = out.view.mapValues(_.map(auth).sum).toMap
      val gh = math.max(1L, hraw.values.max / scale)
      hub = hraw.view.mapValues(_ / gh).toMap
    }
    (hub, auth)
  }

  test("hits matches the reference on planted and fixture graphs; roles are disjoint") {
    // two hubs, three authorities; x reaches everything (best hub),
    // m is reached by both hubs (best authority)
    val planted = Seq("x" -> "m", "x" -> "n", "x" -> "o", "y" -> "m")
    val got = Graph.hits(planted.toDF("src", "dst"), iterations = 2)
    val gh = got.hubs.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ga = got.authorities.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (wh, wa) = referenceHits(planted, 2)
    assert(gh == wh && ga == wa)
    assert(gh("x") > gh("y") && ga("m") > ga("n"))
    // fixture graph (directed, no symmetrization)
    val sc = graft.Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.Tables.orders(spark, Sf0001)
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("S"), col("l_suppkey")).as("s"),
        concat(lit("C"), col("o_custkey")).as("c"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val fx = Graph.hits(sc.toDF("src", "dst"), iterations = 2)
    val (fwh, fwa) = referenceHits(sc, 2)
    assert(fx.hubs.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == fwh)
    assert(fx.authorities.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == fwa)
    // bipartite roles never mix
    assert(fwh.keySet.forall(_.startsWith("S")) &&
      fwa.keySet.forall(_.startsWith("C")))
  }

  test("pageRank releases its intra-operator caches after consumption") {
    val planted = Seq("a" -> "b", "b" -> "a").toDF("src", "dst")
    val pr = Graph.fixedPointPageRank(planted, iterations = 1)
    assert(pr.count() == 2)
    // Caching listener fires async on the listener bus — poll
    eventuallyEmptyCache()
  }

  private def eventuallyEmptyCache(): Unit = {
    val deadline = System.nanoTime() + 10_000_000_000L
    while (!spark.sharedState.cacheManager.isEmpty &&
      System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.sharedState.cacheManager.isEmpty,
      "persisted edge frame must be released after the consuming action")
  }
}
