package graft

import org.apache.spark.sql.functions._

/** Cross-module integration checks over the fixtures: the SQL registry,
  * salted left joins, and the fixture catalog itself.
  */
class IntegrationSpec extends SparkSpecBase {

  test("registerAll exposes every fixture table to spark.sql") {
    Tables.registerAll(spark, Sf0001)
    val n = spark.sql(
      """SELECT COUNT(*) FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin)
      .collect()(0).getLong(0)
    assert(n == Tables.lineitem(spark, Sf0001).count()) // every row survives the FK chain
    // extension tables are registered too
    assert(spark.sql("SELECT COUNT(*) FROM documents").collect()(0).getLong(0) == 500)
    assert(spark.sql("SELECT COUNT(*) FROM events WHERE ts IS NOT NULL")
      .collect()(0).getLong(0) == 1000)
  }

  test("saltedJoin left join keeps unmatched big-side rows exactly once") {
    import spark.implicits._
    val big = Seq((1L, "hot"), (2L, "hot"), (3L, "nokey")).toDF("id", "k")
    val dim = Seq(("hot", "H")).toDF("k", "label")
    val out = graft.operators.Skew.saltedJoin(big, dim, "k", $"id", 4, "left")
      .collect().map(r => (r.getLong(1), Option(r.getString(2)))).toSet
    assert(out == Set((1L, Some("H")), (2L, Some("H")), (3L, None)))
  }

  test("saltedJoin rejects semantics-breaking join types") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "k")
    intercept[IllegalArgumentException] {
      graft.operators.Skew.saltedJoin(df, df, "k", $"id", 4, "full_outer")
    }
  }

  test("percentile_approx sketch tracks q48's exact median per group") {
    val exact = graft.queries.Relational3.q48Median(spark, Sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = Tables.orders(spark, Sf001)
      .groupBy("o_orderpriority")
      .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, v) =>
      assert(math.abs(v - exact(k)) / exact(k) < 0.02,
        s"approx median for $k drifted: $v vs ${exact(k)}")
    }
  }

  test("q54 banded median gate holds off the driver's sf (sf0.001)") {
    val rows = graft.queries.Extensions.q54ApproxMedian(spark, Sf0001).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Boolean]("approx_ok")))
  }

  test("approx profile tracks q68's exact profile within 2% at sf0.1") {
    val sf01 = "/root/testdata/sf0.1"
    val exact = graft.queries.Curation.q68Profile(spark, sf01).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = graft.operators.Profile.numericProfileApprox(
        Tables.lineitem(spark, sf01),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (c, ar) =>
      val er = exact(c)
      // everything except the sketch is exact in both variants
      assert(ar.getLong(1) == er.getLong(1) && ar.getLong(2) == er.getLong(2),
        s"$c counts")
      assert(ar.getDouble(4) == er.getDouble(4) && ar.getDouble(5) == er.getDouble(5),
        s"$c min/max")
      val (ad, ed) = (ar.getLong(3).toDouble, er.getLong(3).toDouble)
      assert(math.abs(ad - ed) / ed <= 0.02, s"$c distinct drift: $ad vs $ed")
    }
  }

  test("q76 banded profile gate holds off the driver's sf (sf0.001)") {
    val rows = graft.queries.Scaled.q76ProfileApprox(spark, Sf0001).collect()
    assert(rows.length == 3 && rows.forall(_.getAs[Boolean]("nd_ok")))
  }

  test("entry smoke: flagship query returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet == Set("n_name", "revenue", "n_items"))
  }

  test("GraftExtensions exposes the codegen kernels to raw SQL") {
    val out = spark.sql(
      "SELECT simhash64('the quick brown fox') AS fp, " +
        "size(word_gram_hashes('a b c d', 2)) AS n, " +
        "dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp, " +
        "sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS ic").first()
    assert(out.getAs[Long]("fp") ==
      graft.functions.SimHash64.compute("the quick brown fox"))
    assert(out.getAs[Int]("n") == 3)
    assert(out.getAs[Double]("dp") == 11.0)
    assert(out.getAs[Int]("ic") == 2)
    // non-literal where a literal int is required fails analysis, like
    // built-ins treat round()'s scale argument
    val e = intercept[Exception] {
      spark.sql("SELECT word_gram_hashes('a b', CAST(id AS INT)) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
    // ...but any FOLDABLE int expression works, like round(col, 1 + 2)
    assert(spark.sql("SELECT size(word_gram_hashes('a b c d', 1 + 1)) AS n")
      .first().getAs[Int]("n") == 3)
    // wrong arity names the function and accepted arities, no MatchError
    val arity = intercept[Exception] {
      spark.sql("SELECT winnow_fp('a b c', 5)").collect()
    }
    assert(arity.getMessage.contains("winnow_fp expects 1 or 3 arguments"))
    // ExpressionInfo wiring: name and usage land in the right fields
    val desc = spark.sql("DESCRIBE FUNCTION simhash64").collect()
      .map(_.getString(0)).mkString("\n")
    assert(desc.contains("Function: simhash64"))
    assert(desc.contains("SimHash fingerprint"))
  }

  test("every declared query has matching columns with its oracle name set") {
    // guards the column-name contract: the driver sorts columns by name
    // before hashing, so any Spark/oracle alias drift breaks the gate
    val oracled = SparkEntry.oracleSql.keySet
    assert(oracled.subsetOf(SparkEntry.queries.keySet))
    // and every query at least builds a plan against the smallest fixture
    SparkEntry.queries.foreach { case (name, fn) =>
      val cols = fn(spark, Sf0001).columns
      assert(cols.nonEmpty, s"$name produced no columns")
      assert(cols.distinct.length == cols.length, s"$name has duplicate columns")
    }
  }
  test("end-to-end curation chain is bit-identical across partition counts") {
    // normalize -> quality/lang gate -> near-dup survivors -> mixture
    // resample -> sliding chunks: five operator families composed, run at
    // 2 and 17 input partitions — identical output row sets proves no
    // step leaks partitioning into results (RNG, IEEE sum order, window
    // ambiguity, hash instability would all surface here)
    import spark.implicits._
    import graft.functions.TextFunctions
    def chain(parts: Int): Set[(Long, Int, String)] = {
      val docs = graft.Tables.documents(spark, Sf0001).repartition(parts)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"), col("source"),
          TextFunctions.normalizeWs(col("text")).as("text"))
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
        .filter(col("lang").isin("en", "de") && col("quality") > 0.2)
      val survivors = graft.operators.Dedup.keepBest(
          docs.select("doc_id", "quality"),
          graft.operators.Dedup.jaccardPairs(docs, threshold = 0.8))
        .select("doc_id")
      val weights = Seq(("en", 800000L), ("de", 1000000L))
        .toDF("lang", "weight_ppm")
      val sampled = graft.operators.Sampling.resampleToMixture(
        docs.join(survivors, "doc_id").select("doc_id", "lang", "text"),
        "doc_id", "lang", weights)
      graft.operators.TextChunks.slidingChunks(sampled, 32, 24)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(4))).toSet
    }
    val a = chain(2)
    val b = chain(17)
    assert(a.nonEmpty && a == b)
  }

}
