package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  test("dupGramRatio: planted duplicates score, unique docs score zero") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),  // shares all grams with doc 2
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa"),       // fully unique
      (4L, "alpha beta gamma nu xi")           // shares exactly 1 gram with 1/2
    ).toDF("doc_id", "text")
    val got = Curation.dupGramRatio(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 5 tokens -> 3 distinct trigrams each
    assert(got(1L) == ((3L, 3L)))
    assert(got(2L) == ((3L, 3L)))
    assert(got(3L) == ((3L, 0L)))
    assert(got(4L) == ((3L, 1L))) // only "alpha beta gamma" is shared
  }

  test("q66 keeps exactly ceil(n/4) per language, best-quality first") {
    val out = Curation.q66QuantileFilter(spark, Sf001)
    val kept = out.groupBy("lang").agg(count(lit(1)).as("k"), max("rn").as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val totals = graft.Tables.documents(spark, Sf001)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == totals.keySet)
    kept.foreach { case (lang, (k, mx)) =>
      val expect = (totals(lang) + 3) / 4
      assert(k == expect, s"lang $lang kept $k, want ceil(n/4) = $expect")
      assert(mx.toLong == k, s"ranks must be the contiguous prefix 1..$k")
    }
  }

  test("q63 flags exactly the blocklisted hosts on the fixture") {
    val out = Curation.q63UrlBlocklist(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    // ids ending 0/3/6/9 with %3==0 inject sites; %3==1 injects blogs
    assert(out.nonEmpty)
    out.foreach { case (_, domain, blocked) =>
      assert(blocked == Curation.BlockedHosts.contains(domain))
    }
    assert(out.exists(_._3))   // some blocked
    assert(out.exists(!_._3))  // some clean
    // every domain matches one of the two synthetic host shapes
    out.foreach { case (_, d, _) =>
      assert(d.matches("www\\.site[0-9]\\.example\\.com|blog[0-9]\\.test\\.org"), d)
    }
  }

  test("q62 counts match the injection schedule on the fixture") {
    val out = Curation.q62PiiRedact(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4)))
    out.foreach { case (id, e, p, ip, red) =>
      assert(e == (if (id % 5 == 0) 1 else 0), s"doc $id emails")
      assert(p == (if (id % 7 == 0) 1 else 0), s"doc $id phones")
      assert(ip == (if (id % 11 == 0) 1 else 0), s"doc $id ips")
      assert(!red.contains("@example.com") && !red.contains(" 555-"))
    }
  }

  test("admitIncremental matches a driver-side brute force, incl. planted dups") {
    import graft.functions.SimHash64
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val corpusDocs = (0L until 40L).map(i => (i, doc(30), false))
    val newDocs = (100L until 120L).map(i => (i, doc(30), true)) ++ Seq(
      (200L, corpusDocs(3)._2, true),            // exact dup of corpus doc 3
      (201L, corpusDocs(5)._2 + " extra", true), // near-ish variant
      (202L, corpusDocs(7)._2.toUpperCase, true)) // case variant: NOT exact
    val all = (corpusDocs ++ newDocs).toDF("doc_id", "text", "is_new")
    val got = graft.operators.Dedup.admitIncremental(all, col("is_new"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2),
        r.getBoolean(3)))).toMap

    // driver-side brute force over the same fingerprints (exact screen is
    // case-EXACT, the exactByFingerprint contract)
    val fps = all.select($"doc_id", $"is_new", $"text".as("lt"),
        SimHash64.simhash64($"text").as("fp"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2), r.getLong(3)))
    val corpus = fps.filter(!_._2)
    val expect = fps.filter(_._2).map { case (id, _, lt, fp) =>
      val exact = corpus.exists(_._3 == lt)
      val near = corpus.count(c => java.lang.Long.bitCount(c._4 ^ fp) <= 3).toLong
      id -> ((exact, near, !exact && near == 0L))
    }.toMap
    assert(got == expect)
    assert(got(200L)._1 && !got(200L)._3)      // planted exact dup rejected
    assert(got(200L)._2 >= 1L)                 // ... and Hamming-0 counted
    assert(!got(202L)._1)                      // case variant is NOT exact
    assert(got.values.exists(_._3))            // and some docs are admitted
  }

  test("q71 packing agrees with a driver-side running sum at sf0.001") {
    val docs = graft.Tables.documents(spark, Sf0001)
      .filter($"text".isNotNull) // mirror the query's q59 null contract
      .select($"doc_id", $"lang", size(split($"text", " ")).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).map { case (id, _, n) =>
        val before = cum; cum += n
        id -> ((before, before / 2048))
      }
    }.toMap
    val got = Curation.q71SequencePack(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
    assert(got.values.map(_._2).max > 0) // fixture spans multiple sequences
  }

  test("q65 counts agree with a driver-side brute force at sf0.001") {
    val ev = graft.Tables.events(spark, Sf0001)
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"), $"event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val purchases = ev.filter(_._4 == "purchase")
    val expect = ev.filter(_._4 == "click").map { case (id, u, t, _) =>
      (id, purchases.count(p => p._2 == u && p._3 >= t - 7200000000L && p._3 < t).toLong)
    }.toMap
    val got = Curation.q65RangeJoin(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expect)
    assert(got.values.sum > 0)
  }
}
