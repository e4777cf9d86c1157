package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Cleaning
import graft.sources.{CsvSource, HeaderMode}

/** Property tests promised by SURVEY §5: reshape round-trips, scrub
  * idempotence, normalization bounds, header normalization idempotence,
  * hash determinism. Uses raw ScalaCheck generators with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline artifact cache).
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("pivot then unpivot returns the original (suburb, year, value) set") {
    val cellGen = Gen.listOfN(12, for {
      s <- Gen.oneOf("A", "B", "C", "D")
      y <- Gen.oneOf(2022, 2023)
      v <- Gen.choose(0.0, 10.0)
    } yield (s, y, math.rint(v * 100) / 100))
    for (rows <- samples(cellGen, 10) if rows.nonEmpty) {
      // mean-aggregate duplicates first so the round-trip is well-defined
      val base = rows.toDF("SUBURB", "YEAR", "V")
        .groupBy("SUBURB", "YEAR").agg(avg("V").as("V"))
      val pivoted = base.groupBy("SUBURB").pivot("YEAR", Seq(2022, 2023)).agg(first("V"))
      val back = pivoted
        .unpivot(Array(col("SUBURB")), Array(col("2022"), col("2023")), "YEAR", "V")
        .filter(col("V").isNotNull)
        .select(col("SUBURB"), col("YEAR").cast("int"), col("V"))
      val a = base.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
      val b = back.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
      assert(a == b, s"round-trip mismatch for $rows")
    }
  }

  test("scrubDoubles is idempotent and total") {
    val valGen = Gen.listOfN(8, Gen.oneOf(
      Gen.choose(-1e6, 1e6),
      Gen.const(Double.NaN),
      Gen.const(Double.PositiveInfinity),
      Gen.const(Double.NegativeInfinity)))
    for (xs <- samples(valGen, 10) if xs.nonEmpty) {
      val df = xs.toDF("x")
      val once = Cleaning.scrubDoubles(df).collect().map(_.getDouble(0)).toSeq
      val twice = Cleaning.scrubDoubles(Cleaning.scrubDoubles(df))
        .collect().map(_.getDouble(0)).toSeq
      assert(once == twice)
      assert(once.forall(v => !v.isNaN && !v.isInfinite))
    }
  }

  test("minMaxNorm lands in [0,100] and touches both bounds") {
    val valGen = Gen.listOfN(6, Gen.choose(-1e5, 1e5))
    for (xs <- samples(valGen, 10) if xs.toSet.size > 1) {
      val df = xs.toDF("x")
      val stats = df.agg(min("x").as("mn"), max("x").as("mx"))
      val out = df.crossJoin(stats)
        .select(Cleaning.minMaxNorm(col("x"), col("mn"), col("mx")).as("n"))
        .collect().map(_.getDouble(0))
      assert(out.forall(v => v >= 0.0 && v <= 100.0))
      assert(out.contains(0.0) && out.contains(100.0))
    }
  }

  test("header normalization is idempotent on arbitrary strings") {
    for (h <- samples(Gen.asciiPrintableStr, 200)) {
      val once = CsvSource.normalize(h, HeaderMode.SnakeUpper)
      val twice = CsvSource.normalize(once, HeaderMode.SnakeUpper)
      assert(once == twice, s"not idempotent for ${h.map(_.toInt)}")
    }
  }

  test("surrogate keys are dense 1..N for arbitrary suburb sets") {
    val namesGen = Gen.nonEmptyListOf(Gen.identifier.map(_.take(10))).map(_.distinct)
    for (names <- samples(namesGen, 5) if names.nonEmpty) {
      val df = names.toDF("SUBURB")
      val ids = graft.etl.StarSchema.suburbDim(df)
        .select("id_suburb").collect().map(_.getInt(0)).sorted
      assert(ids.toSeq == (1 to names.length))
    }
  }

  test("connectedComponents matches a driver-side union-find on random graphs") {
    val edgeGen = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct
    samples(edgeGen, 8).filter(_.nonEmpty).foreach { edges =>
      // driver-side union-find oracle
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // union-find roots are not necessarily the component MIN — normalize
      val byRoot = nodes.groupBy(find)
      val expected = byRoot.values.flatMap { ns =>
        val mn = ns.min; ns.map(_ -> mn)
      }.toMap
      val got = graft.operators.Dedup.connectedComponents(
          edges.toDF("doc_id_a", "doc_id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"edges=$edges")
    }
  }

  test("minhashLshDistinct equals the doc-level walk on random duplicated corpora") {
    // corpora drawn from a small vocab so that duplicates, near-dups, and
    // unrelated docs all occur; document MULTIPLICITY is the property
    // under test (the distinct walk collapses identical sets)
    val docGen = Gen.listOfN(24, for {
      base <- Gen.choose(0, 4)                 // 5 base templates
      words <- Gen.choose(6, 10)
      mut <- Gen.choose(0, 2)                  // 0 = exact copy of template
    } yield (0 until words).map(w =>
      if (w < mut) s"m${base}_$w" else s"t${base}_$w").mkString(" "))
    for ((texts, i) <- samples(docGen, 6).zipWithIndex if texts.nonEmpty) {
      val docs = texts.zipWithIndex
        .map { case (t, j) => (i * 1000L + j, t, "en", "s0") }
        .toDF("doc_id", "text", "lang", "source")
      def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      for (mbc <- Seq(1, 2)) {
        val doc = canon(graft.operators.Dedup.minhashLsh(docs, shingleSize = 2,
          numHashes = 16, bands = 4, threshold = 0.6, minBandCollisions = mbc))
        val dis = canon(graft.operators.Dedup.minhashLshDistinct(docs,
          shingleSize = 2, numHashes = 16, bands = 4, threshold = 0.6,
          minBandCollisions = mbc))
        assert(dis === doc, s"walks diverged on corpus $i (mbc=$mbc)")
        // forest mode: a true-pair subset spanning the same components,
        // carrying the full walk's pair count as its n_pairs aggregate
        val forest = graft.operators.Dedup.minhashLshDistinct(docs,
          shingleSize = 2, numHashes = 16, bands = 4, threshold = 0.6,
          minBandCollisions = mbc, pairsMode = "forest")
        assert(canon(forest.select("doc_id_a", "doc_id_b", "jaccard"))
          .subsetOf(doc), s"forest edge not a true pair (corpus $i, mbc=$mbc)")
        val sumPairs = forest.agg(org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.sum("n_pairs"),
            org.apache.spark.sql.functions.lit(0L)))
          .collect()(0).getLong(0)
        assert(sumPairs == doc.size.toLong,
          s"n_pairs sum $sumPairs != ${doc.size} (corpus $i, mbc=$mbc)")
        assert(componentsOf(forest) == componentsOf(
          doc.toSeq.map(p => (p._1, p._2)).toDF("doc_id_a", "doc_id_b")),
          s"forest components diverged (corpus $i, mbc=$mbc)")
      }
    }
  }

  test("jaccardPairsForest components equal the full walk on random null-bearing corpora") {
    // random corpora with occasional NULL lang/source and null/empty
    // texts — the round-16 review's bug class: the full walk's equi-join
    // never pairs NULL block keys, and neither may the forest's identity
    // grouping
    val docGen = Gen.listOfN(20, for {
      base <- Gen.choose(0, 3)
      words <- Gen.choose(4, 8)
      mut <- Gen.choose(0, 1)
      lang <- Gen.oneOf(Some("en"), Some("de"), None)
      src <- Gen.oneOf(Some("s0"), None)
      nullText <- Gen.frequency(9 -> false, 1 -> true)
    } yield (
      if (nullText) null
      else (0 until words).map(w =>
        if (w < mut) s"m${base}_$w" else s"t${base}_$w").mkString(" "),
      lang.orNull, src.orNull))
    for ((rows, i) <- samples(docGen, 6).zipWithIndex if rows.nonEmpty) {
      val docs = rows.zipWithIndex
        .map { case ((t, l, s), j) => (i * 1000L + j, t, l, s) }
        .toDF("doc_id", "text", "lang", "source")
      val all = graft.operators.Dedup.jaccardPairs(docs, 0.6)
      val forest = graft.operators.Dedup.jaccardPairsForest(docs, 0.6)
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select("doc_id_a", "doc_id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val allSet = canon(all)
      assert(canon(forest).subsetOf(allSet),
        s"forest edge not a true pair (corpus $i)")
      val sumPairs = forest.agg(org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.sum("n_pairs"),
          org.apache.spark.sql.functions.lit(0L)))
        .collect()(0).getLong(0)
      assert(sumPairs == allSet.size.toLong,
        s"n_pairs sum $sumPairs != ${allSet.size} (corpus $i)")
      assert(componentsOf(forest) == componentsOf(
        allSet.toSeq.map(p => (p._1, p._2)).toDF("doc_id_a", "doc_id_b")),
        s"forest components diverged (corpus $i)")
    }
  }

  /** Driver-side min-label components of an edge frame — the reference
    * the forest-mode properties compare against.
    */
  private def componentsOf(edges: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    val es = edges.select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.groupBy(find).values.flatMap { ns =>
      val mn = ns.min; ns.map(_ -> mn)
    }.toMap
  }

  test("capGroups drops exactly the oversized groups with exact metrics") {
    val gen = for {
      nGroups <- Gen.choose(1, 8)
      sizes <- Gen.listOfN(nGroups, Gen.choose(1, 12))
      cap <- Gen.choose(1, 12)
    } yield (sizes, cap)
    samples(gen, 8).foreach { case (sizes, cap) =>
      val rows = sizes.zipWithIndex.flatMap { case (sz, g) =>
        (0 until sz).map(i => (s"g$g", g.toLong * 100 + i))
      }
      val df = graft.operators.Dedup.capGroups(
        rows.toDF("k", "v"), Seq("k"), cap, "graft_prop_cap")
      val kept = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val expectedKept = rows.filter { case (k, _) =>
        sizes(k.drop(1).toInt) <= cap
      }.toSet
      assert(kept == expectedKept, s"sizes=$sizes cap=$cap")
      // AQE erases the observation when the output is empty (documented)
      if (kept.nonEmpty) {
        val m = df.queryExecution.observedMetrics("graft_prop_cap")
        val droppedGroups = sizes.count(_ > cap)
        assert(m.getAs[Long]("dropped_rows") == sizes.filter(_ > cap).map(_.toLong).sum)
        assert(m.getAs[Double]("dropped_groups") == droppedGroups.toDouble)
        assert(m.getAs[Long]("max_group_size") == sizes.max.toLong)
      }
    }
  }
  test("slidingChunks reconstructs every document from its stride prefixes") {
    val docGen = for {
      n <- Gen.choose(1, 90)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "dddd"))
    } yield toks.mkString(" ")
    val texts = samples(docGen, 20)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val chunks = graft.operators.TextChunks.slidingChunks(docs, chunkSize = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    val byDoc = chunks.groupBy(_._1)
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.split(" ")
      val cs = byDoc(i.toLong).sortBy(_._2)
      // contiguous starts, bounded sizes, correct content per chunk
      cs.foreach { case (_, idx, start, n, text) =>
        assert(start == idx * 24 + 1)
        assert(n <= 32 && n >= 1)
        assert(text == toks.slice(start - 1, start - 1 + 32).mkString(" "))
      }
      // stride prefixes (first 24 tokens of each chunk) + the final tail
      // reassemble the document exactly
      val rebuilt = cs.init.flatMap { case (_, _, start, _, text) =>
        text.split(" ").take(24)
      } ++ cs.last._5.split(" ")
      assert(rebuilt.sameElements(toks), s"doc $i not reconstructible")
    }
  }

  test("stripFrequentLines conserves lines and keeps only sub-threshold ones") {
    val linePool = Vector("nav", "footer", "l1", "l2", "l3", "l4", "l5", "l6")
    val docGen = for {
      n <- Gen.choose(1, 6)
      ls <- Gen.listOfN(n, Gen.oneOf(linePool))
    } yield ls.mkString("\n")
    val texts = samples(docGen, 16)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val maxDf = 4
    val df = texts.zipWithIndex
      .flatMap { case (t, i) => t.split("\n").distinct.map(_ -> i) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
    val out = graft.operators.TextChunks.stripFrequentLines(docs, maxDf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val lines = t.split("\n")
      val (kept, dropped) = lines.partition(l => df(l) < maxDf)
      val (gotKept, gotDropped, gotClean) = out(i.toLong)
      assert(gotKept == kept.length && gotDropped == dropped.length,
        s"doc $i line conservation")
      assert(gotClean == (if (kept.isEmpty) None else Some(kept.mkString("\n"))),
        s"doc $i cleaned-order mismatch")
    }
  }

  test("Mp4Meta.topLevelBoxes agrees with the JVM tiling rule on random buffers") {
    import graft.operators.Multimodal.MediaDecoder
    // random byte buffers biased toward box-like structure: a mix of valid
    // box sequences, corrupted sizes, and raw noise
    def be32(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val boxGen = for {
      tpe <- Gen.oneOf("ftyp", "moov", "mdat", "free", "uuid")
      n <- Gen.choose(0, 40)
      body <- Gen.listOfN(n, Gen.choose(0, 255).map(_.toByte))
    } yield be32(8 + n) ++ tpe.getBytes ++ body.toArray
    val bufGen: Gen[Array[Byte]] = Gen.frequency(
      5 -> Gen.listOfN(3, boxGen).map(_.flatten.toArray),           // clean tiling
      3 -> (for { bs <- Gen.listOfN(2, boxGen); junk <- Gen.choose(1, 9);
                  tail <- Gen.listOfN(junk, Gen.choose(0, 255).map(_.toByte)) }
            yield bs.flatten.toArray ++ tail.toArray),              // trailing junk
      2 -> Gen.listOfN(20, Gen.choose(0, 255).map(_.toByte)).map(_.toArray)) // noise
    val bufs = samples(bufGen, 120)
    // JVM-side reference walk (the decoder's rule, re-derived here so the
    // test fails if either side drifts): boxes must tile the buffer exactly
    def jvmWalk(b: Array[Byte]): (Seq[String], Boolean) = {
      var pos = 0L; val types = Seq.newBuilder[String]; var bad = false
      while (!bad && pos + 8 <= b.length) {
        val size = ((b(pos.toInt) & 0xffL) << 24) | ((b(pos.toInt + 1) & 0xffL) << 16) |
          ((b(pos.toInt + 2) & 0xffL) << 8) | (b(pos.toInt + 3) & 0xffL)
        if (size < 8 || pos + size > b.length) bad = true
        else {
          types += new String(b.slice(pos.toInt + 4, pos.toInt + 8), "ISO-8859-1")
          pos += size
        }
      }
      (types.result(), !bad && pos == b.length)
    }
    val rows = bufs.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "bin")
      .select($"id", graft.functions.Mp4Meta.topLevelBoxes($"bin", maxBoxes = 8).as("w"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    bufs.zipWithIndex.foreach { case (b, i) =>
      val (expTypes, expWf) = jvmWalk(b)
      val got = rows(i.toLong)
      // 4CC bytes here are always ASCII box names, so string compare is exact
      assert(got.getSeq[String](0) == expTypes.take(8), s"buffer $i box types")
      if (expTypes.length <= 8)
        assert(got.getBoolean(2) == expWf, s"buffer $i well_formed")
      // mp4Ok (sniffed containers only) must agree with the reference walk
      if (b.length >= 8 && new String(b.slice(4, 8), "ISO-8859-1") == "ftyp")
        assert(MediaDecoder.decode(b).ok == expWf, s"buffer $i decoder parity")
    }
  }

  test("triangleStats matches brute-force triple enumeration on random graphs") {
    val edgeGen = Gen.listOfN(20, for {
      a <- Gen.choose(1L, 12L); b <- Gen.choose(1L, 12L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    for (raw <- samples(edgeGen, 8); edges = raw.distinct if edges.nonEmpty) {
      val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val nodes = adj.keys.toSeq.sorted
      val tri = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for {
        u <- nodes; v <- nodes if u < v && adj(u)(v)
        w <- nodes if v < w && adj(u)(w) && adj(v)(w)
      } { tri(u) += 1; tri(v) += 1; tri(w) += 1 }
      val want = tri.toMap.map { case (n, t) => n -> (adj(n).size.toLong, t) }
      val got = graft.operators.Graph.triangleStats(edges.toDF("x", "y"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == want, s"graph $edges")
    }
  }

  test("bfsLevels matches a reference frontier walk on random digraphs") {
    val edgeGen = Gen.listOfN(24, for {
      a <- Gen.choose(1L, 10L); b <- Gen.choose(1L, 10L) if a != b
    } yield (a, b))
    for (raw <- samples(edgeGen, 8); edges = raw.distinct if edges.nonEmpty) {
      val seeds = Set(edges.head._1)
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lvl = seeds.map(_ -> 0).toMap
      var frontier = seeds
      for (k <- 1 to 3) {
        val next = frontier.flatMap(u => adj.getOrElse(u, Nil)).diff(lvl.keySet)
        lvl = lvl ++ next.map(_ -> k)
        frontier = next
      }
      val got = graft.operators.Graph.bfsLevels(edges.toDF("src", "dst"),
          seeds.toSeq.toDF("id"), maxLevel = 3)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == lvl, s"graph $edges seeds $seeds")
    }
  }

  test("ewmaFold is split-independent for any ts-respecting batch split") {
    import java.sql.Timestamp
    val evGen = Gen.listOfN(16, for {
      u <- Gen.choose(1L, 3L)
      t <- Gen.choose(1000L, 9999L)
      x <- Gen.choose(0L, 5000000L)
    } yield (u, t, x))
    for (raw <- samples(evGen, 8)) {
      // unique (ts) per row so every split point is ts-respecting
      val rows = raw.zipWithIndex.map { case ((u, t, x), i) =>
        (u, new Timestamp(t * 1000L + i), i.toLong, x)
      }
      def toDf(rs: Seq[(Long, Timestamp, Long, Long)]) =
        rs.map(r => (r._1, r._2, r._3, r._4))
          .toDF("user_id", "ts", "event_id", "xq")
          .select(col("user_id"),
            struct(col("ts"), col("event_id"), col("xq")).as("rec"))
      val empty = toDf(rows).limit(0)
        .select(col("user_id"), lit(0L).as("n_events"), lit(0L).as("ewma_q"))
      val sorted = rows.sortBy(r => (r._2.getTime, r._3))
      val oneShot = graft.queries.Series.ewmaFold(empty, toDf(sorted))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // split at every third boundary of the ts-sorted stream
      val batches = sorted.grouped(math.max(1, sorted.length / 3)).toSeq
      val folded = batches.foldLeft(empty)((st, b) =>
          graft.queries.Series.ewmaFold(st, toDf(b)))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(folded == oneShot, s"split diverged for $rows")
    }
  }

  test("stratumRanks equals a driver-side ranking on random null-bearing strata") {
    val gen = for {
      n <- Gen.choose(5, 120)
      rows <- Gen.listOfN(n, for {
        s <- Gen.option(Gen.oneOf("a", "b", "c"))
        v <- Gen.choose(0, 30)
      } yield (s, v.toDouble))
    } yield rows.zipWithIndex.map { case ((s, v), i) => (i.toLong, s, v) }
    samples(gen, 6).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("id", "s", "score")
      val targets: Long => Seq[Long] = n => Seq(1L, (n + 1) / 2, n)
      for (desc <- Seq(false, true)) {
        val got = graft.operators.StratifiedSelect
          .stratumRanks(df, "s", "score", desc,
            Seq(col("id")), targets, 8)
          .select("id", "rn", "n_stratum").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val expect = rows.groupBy(_._2).values.flatMap { g =>
          val sorted =
            if (desc) g.sortBy(t => (-t._3, t._1)) else g.sortBy(t => (t._3, t._1))
          val n = sorted.size.toLong
          targets(n).filter(r => r >= 1 && r <= n).distinct
            .map(r => (sorted((r - 1).toInt)._1, r, n))
        }.toSet
        assert(got == expect, s"desc=$desc rows=$rows")
      }
    }
  }

  test("substringSpans matches a brute-force positional reference on random corpora") {
    val k = 4
    val gen = for {
      nd <- Gen.choose(2, 6)
      docs <- Gen.listOfN(nd,
        Gen.choose(0, 30).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf("x", "y", "z", "w"))))
    } yield docs.zipWithIndex.map { case (toks, i) =>
      (i.toLong, toks.mkString(" "))
    }
    samples(gen, 8).foreach { docs =>
      // brute-force reference: positional gram strings, global occurrence
      // count, anchors cnt >= 2, islands with gap <= k
      val grams = docs.flatMap { case (id, text) =>
        val t = text.split(" ", -1)
        if (text.isEmpty || t.length < k) Seq.empty
        else (1 to t.length - k + 1).map(i =>
          (id, i.toLong, t.slice(i - 1, i - 1 + k).mkString(" ")))
      }
      val cnt = grams.groupBy(_._3).view.mapValues(_.size).toMap
      val expect = grams.filter(g => cnt(g._3) >= 2)
        .groupBy(_._1).flatMap { case (id, as) =>
          val ps = as.map(_._2).distinct.sorted
          val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          var start = -1L; var last = -1L; var cn = 0L
          ps.foreach { p =>
            if (start < 0) { start = p; last = p; cn = 1 }
            else if (p <= last + k) { last = p; cn += 1 }
            else { spans += ((start, last - start + k, cn)); start = p; last = p; cn = 1 }
          }
          if (start >= 0) spans += ((start, last - start + k, cn))
          spans.map { case (st, ln, c) => (id, st, ln, c) }
        }.toSet
      val got = graft.operators.Dedup.substringSpans(docs.toDF("doc_id", "text"), k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expect, s"docs=$docs")
    }
  }

}
