package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (BASELINE.json north star; cf. the distributed top-k literature in
  * /root/repo/PAPERS.md — REPOSE ICDE'21 partitions by locality-sensitive
  * reference points exactly like the bucket/cell keys here, and the EDBT'20
  * incremental top-k work motivates keeping the per-query state small
  * enough to re-rank instead of re-scan). Paths:
  *
  *  - `bruteForceTopK`: exact cosine top-k. The (small) query set is
  *    broadcast against the corpus — one scan, no corpus shuffle; the
  *    per-query top-k runs through a window over qid (k rows per query
  *    survive the rank filter). This is the correctness baseline and also
  *    the right plan at scale when |queries| is small.
  *  - `ivfTopK`: the scale path — a coarse quantizer (nList centroid
  *    vectors) assigns every corpus vector to its nearest cell (map-only);
  *    queries probe only their nProbe closest cells, so the candidate join
  *    is keyed on cell id and touches ~nProbe/nList of the corpus.
  *
  * Norms are computed ONCE per vector before pairing (cosine = dot /
  * (norm_a * norm_b)); the dot kernel is the codegen'd DotProduct
  * expression. Both preserve the exact float semantics of
  * dot/(sqrt(dot_aa)*sqrt(dot_bb)).
  */
object Similarity {

  /** Exact cosine top-k for queries vec_id < maxQueryId. Deterministic:
    * ties break on vec_id.
    */
  def bruteForceTopK(emb: DataFrame, k: Int, maxQueryId: Long): DataFrame = {
    val v = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
    val q = v.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qnrm"))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qe"), col("e")) / (col("qnrm") * col("nrm")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
              round(col("cos"), 6).as("cos_sim"))
  }

  /** bruteForceTopK's scale twin: identical scoring join, but the
    * per-query top-k runs through the bounded heap aggregate
    * (functions.BoundedTopK) instead of the qid window. The window shape
    * puts EVERY corpus row scored for a query on that query's one task —
    * with a billion-vector corpus each query group IS the corpus, so the
    * rank filter is a per-query single-task sort. The heap aggregate keeps
    * k rows per query per partition and combines map-side, so the shuffle
    * carries ≤ queries × partitions × k rows no matter the corpus size.
    * Same ordering contract (cos DESC, vec_id ASC), same output — q119
    * proves it under q27's oracle. The same combinator applies to the
    * lsh/ivf tails; brute force is where the group = corpus cliff bites
    * first.
    */
  def bruteForceTopKHeap(emb: DataFrame, k: Int, maxQueryId: Long): DataFrame = {
    val v = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
    val q = v.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qnrm"))
    v.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qe"), col("e")) / (col("qnrm") * col("nrm")))
      .groupBy("qid")
      .agg(graft.functions.BoundedTopK.topK(
        struct(col("cos"), col("vec_id")), k, desc = Seq(true, false)).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col.vec_id").as("neighbor_id"),
        round(col("col.cos"), 6).as("cos_sim"))
  }

  /** Deterministic sign random projection (Achlioptas 2003 / the
    * Johnson–Lindenstrauss sparse family with ±1 entries): project each
    * embedding onto `outDims` pseudo-random ±1 directions — the
    * dimensionality-reduction step a billion-vector ANN pipeline runs
    * BEFORE bucketing/LSH (JL: pairwise distances survive to within
    * 1±eps at outDims = O(log n / eps²)). No RNG: sign(j, i) is the
    * parity of the first md5 hex digit of "seed:j:i", materialized once
    * driver-side as a literal matrix AND independently re-derivable in
    * SQL (q223's oracle recomputes every sign from the same md5 formula
    * — the matrix is pinned cross-engine, not just reproducible).
    *
    * Float discipline: each signed product quantizes to a 1e-12
    * fixed-point LONG (floor(x·s·1e12) — floor of a double is
    * engine-exact, unlike the double→decimal cast whose 16th-decimal
    * rounding the two engines disagree on), and the per-dimension sum is
    * long addition: order-independent, hash-identical on any engine, and
    * ~50x cheaper per term than the BigDecimal fold this replaced
    * (measured 1.4 s → see BENCH for the committed figure at sf0.1).
    * Quantization error ≤ dims·1e-12 — four orders under the rounded
    * 1e-6 output grid. 64 terms × 1e12 tops out at 6.4e13, far inside a
    * long. Map-only: one HOF evaluation per row (outDims × dims
    * multiply-adds), nothing shuffles; the output explodes to
    * (vec_id, j, rp) only for the gate's sake.
    */
  def randomProjection(emb: DataFrame, outDims: Int = 16,
                       dims: Int = 64, seed: String = "rp"): DataFrame = {
    val signs: Seq[Int] = for (j <- 0 until outDims; i <- 0 until dims) yield {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$j:$i".getBytes("UTF-8"))
      // first hex digit = high nibble of byte 0; even -> +1, odd -> -1
      if ((((md(0) >> 4) & 0xf) & 1) == 0) 1 else -1
    }
    val sgn = typedLit(signs)
    val e = toDouble(col("embedding"))
    // __e and __sgn are multiply-referenced NON-CHEAP aliases (__e is
    // itself a transform() HOF): CollapseProject refuses to inline such
    // aliases into the consuming projection, so the ~outDims×dims
    // element_at references per row keep reading attributes instead of
    // re-evaluating the producer. That multi-reference-non-cheap rule is
    // the load-bearing guard here — if this is ever restructured so the
    // aliases become single-referenced or cheap, the HOFs would inline
    // and re-evaluate per element.
    val outs = transform(sequence(lit(0), lit(outDims - 1)), j =>
      aggregate(sequence(lit(0), lit(dims - 1)),
        lit(0L),
        (acc, i) => acc + floor((element_at(col("__e"), i + 1) *
          element_at(col("__sgn"), j * dims + i + 1)) * lit(1e12)),
        acc => round(acc.cast("double") / lit(1e12), 6)))
    emb.select(col("vec_id"), e.as("__e"), sgn.as("__sgn"))
      .select(col("vec_id"), posexplode(outs))
      .select(col("vec_id"), col("pos").cast("int").as("j"),
        col("col").as("rp"))
  }

  /** Hard-negative mining — the contrastive-training curation op: for
    * each query vector, the k most-similar corpus vectors with a
    * DIFFERENT label (the near-misses a contrastive loss learns most
    * from; random negatives are trivially separable). Identical float
    * contract to [[bruteForceTopK]] (cos = dot/(sqrt·sqrt), ties on
    * vec_id); the label-mismatch predicate rides the scoring join, so
    * same-label pairs never reach the heap.
    *
    * Scale shape = [[bruteForceTopKHeap]]: bounded query matrix
    * broadcasts, corpus scanned once and never shuffled pre-aggregation,
    * per-query top-k through the BoundedTopK heap (shuffle ≤ queries ×
    * partitions × k). The IVF-bucketed variant composes the same way as
    * q153 when the corpus outgrows the scan — mine within probed cells.
    */
  def hardNegatives(emb: DataFrame, k: Int, maxQueryId: Long,
                    labelCol: String = "label"): DataFrame = {
    val v = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"),
        col(labelCol).as("lbl"))
      .withColumn("nrm", norm(col("e")))
    val q = v.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("nrm").as("qnrm"), col("lbl").as("qlbl"))
    v.join(broadcast(q),
        col("vec_id") =!= col("qid") && col("lbl") =!= col("qlbl"))
      .withColumn("cos", dot(col("qe"), col("e")) / (col("qnrm") * col("nrm")))
      .groupBy("qid")
      .agg(graft.functions.BoundedTopK.topK(
        struct(col("cos"), col("vec_id"), col("lbl")), k,
        desc = Seq(true, false, false)).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col.vec_id").as("negative_id"),
        col("col.lbl").as("neg_label"),
        round(col("col.cos"), 6).as("cos_sim"))
  }

  /** kNN label classification — the evaluation harness every embedding
    * pipeline runs ("do these vectors encode the label structure?"), and
    * the simplest label-transfer mechanism (propagate curated labels to
    * uncurated points). Vectors below `maxQueryId` are the HELD-OUT
    * queries (their stored label is the ground truth); the rest are the
    * labeled corpus. Each query takes its k nearest corpus neighbors by
    * cosine (the q27 float contract: dot/(sqrt·sqrt), ties on vec_id) and
    * votes by majority, ties broken on the smaller label — fully
    * deterministic, fully oracle-replayable.
    *
    * Scale shape: the query matrix broadcasts (bounded by construction);
    * the corpus is scanned once, never shuffled pre-aggregation; per-query
    * top-k runs through the BoundedTopK heap aggregate (map-side combined,
    * shuffle carries ≤ queries × partitions × k rows — q119's device);
    * the vote window partitions by qid over ≤ k rows.
    *
    * Returns (qid, true_label, pred_label, n_votes) ordered by qid.
    */
  def knnClassify(emb: DataFrame, k: Int, maxQueryId: Long,
                  labelCol: String = "label"): DataFrame = {
    val v = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"),
        col(labelCol).as("lbl"))
      .withColumn("nrm", norm(col("e")))
    val q = v.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("nrm").as("qnrm"), col("lbl").as("true_label"))
    val corpus = v.filter(col("vec_id") >= maxQueryId)
    val votes = corpus.crossJoin(broadcast(q))
      .withColumn("cos", dot(col("qe"), col("e")) / (col("qnrm") * col("nrm")))
      .groupBy("qid", "true_label")
      .agg(graft.functions.BoundedTopK.topK(
        struct(col("cos"), col("vec_id"), col("lbl")), k,
        desc = Seq(true, false, false)).as("top"))
      .select(col("qid"), col("true_label"), explode(col("top")).as("nb"))
      .groupBy(col("qid"), col("true_label"), col("nb.lbl").as("pred_label"))
      .agg(count(lit(1)).as("n_votes"))
    val w = Window.partitionBy("qid")
      .orderBy(col("n_votes").desc, col("pred_label"))
    votes.withColumn("vr", row_number().over(w)).filter(col("vr") === 1)
      .select(col("qid"), col("true_label"), col("pred_label"), col("n_votes"))
      .orderBy("qid")
  }

  /** Hyperplane-LSH bucketed ANN: vectors sharing the sign signature of
    * nBits pseudo-random hyperplanes land in one bucket; queries search only
    * their own bucket. The cheapest scale path when recall can be traded
    * hardest (bucket count 2^nBits); exposed mainly as the third point on
    * the exact -> IVF -> LSH cost/recall spectrum.
    */
  def lshTopK(emb: DataFrame, k: Int, maxQueryId: Long, nBits: Int = 4): DataFrame = {
    val v = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
      .withColumn("bucket", graft.functions.VectorFunctions.hyperplaneSignature(col("e"), nBits))
    val q = v.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
              col("nrm").as("qnrm"), col("bucket"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    v.join(q, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qe"), col("e")) / (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
              round(col("cos"), 6).as("cos_sim"))
  }

  /** Mutual top-1 alignment between two embedding sets — the
    * parallel-corpus / cross-source document-matching op: emit (a, b)
    * exactly when b is a's cosine-nearest neighbor in B AND a is b's
    * nearest in A. Mutuality is the standard precision filter for
    * alignment mining (a one-directional argmax happily pairs every
    * outlier with SOMETHING; requiring agreement kills those).
    *
    * Shape: ONE scored pass (A stays partitioned, B broadcast), evaluated
    * ONCE — each scored row is exploded into both argmax directions
    * (side 0 = "best b for this a", side 1 = "best a for this b") and a
    * single bounded-heap groupBy on (side, id) computes both argmax
    * tables in one shuffle. Map-side k=1 heaps collapse the 2× exploded
    * rows to ≤ 2·(|A|+|B|) partials per partition before the shuffle,
    * and only the tiny (|A|+|B|)-row argmax frame is persisted for the
    * mutual self-join — never the A×B pair frame, which at scale dwarfs
    * both inputs. (The earlier two-groupBy formulation recomputed the
    * whole cross-join per direction — measured ~2× the total cost.)
    * Ties break on the lower partner id, deterministically.
    *
    * `strategy` picks the scoring join:
    *  - "broadcast" — the exact A×broadcast(B) pass above; right whenever
    *    B fits the broadcast budget.
    *  - "ivf" — B no longer broadcasts: both sides are assigned to
    *    coarse cells (first-nList-of-B centroids, ivfTopK's quantizer),
    *    each side probes its nProbe closest cells, and the scored pair
    *    set is the UNION of (A-probes ⋈ B-cells) and (A-cells ⋈
    *    B-probes) — keyed shuffle joins, never a broadcast, feeding the
    *    SAME mutual-heap algebra. With nProbe = nList the candidate set
    *    is provably all pairs (every cell probed) and the output is
    *    bit-identical to "broadcast" (SimilaritySpec pins it); with
    *    nProbe < nList it is the standard IVF recall trade.
    *  - "auto" — probe |B| with a LIMIT-bounded count (scans at most
    *    broadcastRowLimit+1 rows) and pick accordingly.
    *
    * Cache lifetime: the persisted argmax frame ((|A|+|B|) rows × 4
    * columns) releases itself after the caller's terminal action
    * (Caching.releaseAfterConsumed); if no action ever runs, the entry
    * stays registered exactly as an unmanaged persist would.
    */
  def mutualTop1(embA: DataFrame, embB: DataFrame,
                 strategy: String = "auto",
                 broadcastRowLimit: Long = 100000L,
                 nList: Int = 16, nProbe: Int = 4): DataFrame = {
    val a = embA.select(col("vec_id").as("aid"), toDouble(col("embedding")).as("ae"))
      .withColumn("anrm", norm(col("ae")))
    val b = embB.select(col("vec_id").as("bid"), toDouble(col("embedding")).as("be"))
      .withColumn("bnrm", norm(col("be")))
    val useBroadcast = strategy match {
      case "broadcast" => true
      case "ivf"       => false
      case "auto" =>
        val cap = math.min(broadcastRowLimit + 1L, Int.MaxValue.toLong).toInt
        embB.select(lit(1)).limit(cap).count() <= broadcastRowLimit
      case other => throw new IllegalArgumentException(
        s"strategy must be broadcast|ivf|auto, got '$other'")
    }
    val scored =
      if (useBroadcast)
        a.crossJoin(broadcast(b))
          .withColumn("cos", dot(col("ae"), col("be")) / (col("anrm") * col("bnrm")))
          .select("aid", "bid", "cos")
      else ivfScoredPairs(a, b, nList, nProbe)
    val best = scored.select(explode(array(
        struct(lit(0).as("side"), col("aid").as("id"), col("cos"),
          col("bid").as("partner")),
        struct(lit(1).as("side"), col("bid").as("id"), col("cos"),
          col("aid").as("partner")))).as("r"))
      .select(col("r.side").as("side"), col("r.id").as("id"),
        col("r.cos").as("cos"), col("r.partner").as("partner"))
      .groupBy("side", "id")
      .agg(graft.functions.BoundedTopK.topK(
        struct(col("cos"), col("partner")), 1, desc = Seq(true, false)).as("t"))
      .select(col("side"), col("id"),
        col("t")(0).getField("partner").as("partner"),
        col("t")(0).getField("cos").as("cos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val aBest = best.filter(col("side") === 0)
      .select(col("id").as("aid"), col("partner").as("bid"), col("cos"))
    val bBest = best.filter(col("side") === 1)
      .select(col("id").as("bid2"), col("partner").as("aid2"))
    val res = aBest.join(bBest, col("aid") === col("aid2") && col("bid") === col("bid2"))
      .select(col("aid"), col("bid"), round(col("cos"), 6).as("cos_sim"))
    Caching.releaseAfterConsumed(res, best)
  }

  /** mutualTop1's non-broadcast scoring join: IVF cell-keyed candidate
    * pairs with cos evaluated in-branch. Centroids are the nList
    * smallest-bid vectors of B (a TakeOrderedAndProject — bounded,
    * deterministic, never data-sized); cell assignment is the same
    * broadcast-centroid max_by fold ivfTopK uses, so the only
    * data-sized shuffles are the two cid-keyed candidate joins. The
    * union double-generates pairs whose members probe each other's
    * cells; cos is bit-identical in both branches (same expression over
    * the same doubles), so distinct() dedups exactly.
    */
  private def ivfScoredPairs(a: DataFrame, b: DataFrame,
                             nList: Int, nProbe: Int): DataFrame = {
    require(nList >= 1 && nProbe >= 1,
      s"need nList >= 1 and nProbe >= 1, got nList=$nList nProbe=$nProbe")
    val cents = b.orderBy("bid").limit(nList)
      .select(col("bid").as("cid"), col("be").as("ce"), col("bnrm").as("cnrm"))
    def assign(df: DataFrame, id: String, vec: String, nrm: String): DataFrame =
      df.crossJoin(broadcast(cents))
        .withColumn("csim", dot(col(vec), col("ce")) / (col(nrm) * col("cnrm")))
        .groupBy(id)
        .agg(max_by(col("cid"), struct(col("csim"), -col("cid"))).as("cid"),
             first(col(vec)).as(vec), first(col(nrm)).as(nrm))
    def probes(df: DataFrame, id: String, vec: String, nrm: String): DataFrame = {
      val w = Window.partitionBy(id).orderBy(col("csim").desc, col("cid"))
      df.crossJoin(broadcast(cents))
        .withColumn("csim", dot(col(vec), col("ce")) / (col(nrm) * col("cnrm")))
        .withColumn("prank", row_number().over(w))
        .filter(col("prank") <= nProbe)
        .select(col(id), col(vec), col(nrm), col("cid"))
    }
    val cos = dot(col("ae"), col("be")) / (col("anrm") * col("bnrm"))
    val aProbesB = probes(a, "aid", "ae", "anrm")
      .join(assign(b, "bid", "be", "bnrm"), Seq("cid"))
      .select(col("aid"), col("bid"), cos.as("cos"))
    val bProbesA = assign(a, "aid", "ae", "anrm")
      .join(probes(b, "bid", "be", "bnrm"), Seq("cid"))
      .select(col("aid"), col("bid"), cos.as("cos"))
    aProbesB.unionByName(bProbesA).distinct()
  }

  /** IVF-style ANN. Centroids default to the first nList corpus vectors (a
    * deterministic stand-in that keeps the declared query oracle-checkable);
    * `kmeansIters > 0` refines them with that many sampled Lloyd rounds
    * (see kmeansCentroids) — the production-quality quantizer, same
    * operator shape: assign, probe, candidate-join on cell id.
    */
  def ivfTopK(emb: DataFrame, k: Int, maxQueryId: Long,
              nList: Int = 16, nProbe: Int = 4,
              kmeansIters: Int = 0, kmeansSampleMod: Long = 1): DataFrame = {
    val v = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
    val firstN = v.filter(col("vec_id") < nList)
      .select(col("vec_id").as("cid"), col("e").as("ce"), col("nrm").as("cnrm"))
    val centroids =
      if (kmeansIters <= 0) firstN
      else {
        import emb.sparkSession.implicits._
        kmeansCentroids(v, nList, kmeansIters, kmeansSampleMod)
          .toSeq.toDF("cid", "ce")
          .withColumn("cnrm", norm(col("ce")))
      }

    // Assign each corpus vector to its single nearest centroid: map-only
    // after the centroid broadcast — the argmax is a greatest() fold over
    // nList (cid, sim) structs, no shuffle and no window.
    val simToCentroid = (cid: org.apache.spark.sql.Column, ce: org.apache.spark.sql.Column,
                         cnrm: org.apache.spark.sql.Column) =>
      dot(col("e"), ce) / (col("nrm") * cnrm)
    val assigned = v.crossJoin(broadcast(centroids))
      .withColumn("cdist", simToCentroid(col("cid"), col("ce"), col("cnrm")))
      .groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("cdist"), -col("cid"))).as("cid"),
           first(col("e")).as("e"), first(col("nrm")).as("nrm"))

    // Each query probes its nProbe closest cells.
    val q = v.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qnrm"))
    val wProbe = Window.partitionBy("qid").orderBy(col("qdist").desc, col("cid"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("qdist", dot(col("qe"), col("ce")) / (col("qnrm") * col("cnrm")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nProbe)
      .select(col("qid"), col("qe"), col("qnrm"), col("cid"))

    // Candidate join keyed on cell id, then per-query top-k.
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    probes.join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qe"), col("e")) / (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
              round(col("cos"), 6).as("cos_sim"))
  }

  /** A built IVF index: the coarse-quantizer centroid table (cid, ce,
    * cnrm — nList rows, broadcast-sized by construction) and the cell
    * assignment table (cid, vec_id, e, nrm — one row per corpus vector).
    * In-plan from [[ivfIndexFrames]], or persisted bucketed parquet from
    * [[saveIvfIndex]] — the build-once / probe-many production shape.
    */
  final case class IvfIndex(centroids: DataFrame, assigned: DataFrame)

  /** The IVF index as in-plan frames, with the same deterministic first-N
    * quantizer and the same smaller-cid tie-break as [[ivfTopK]]'s default
    * — so an index probe is hash-identical to the direct query.
    */
  def ivfIndexFrames(emb: DataFrame, nList: Int = 16): IvfIndex = {
    val v = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
    val cents = v.filter(col("vec_id") < nList)
      .select(col("vec_id").as("cid"), col("e").as("ce"), col("nrm").as("cnrm"))
    IvfIndex(cents, assignToCells(cents, emb))
  }

  /** Cell assignment of `emb` under a FIXED centroid table — one
    * broadcast pass over the vectors, same smaller-cid tie-break
    * everywhere. Shared by the full build and the incremental append, so
    * assignment can never diverge between them.
    */
  private def assignToCells(cents: DataFrame, emb: DataFrame): DataFrame = {
    val v = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
    v.crossJoin(broadcast(cents))
      .withColumn("cdist", dot(col("e"), col("ce")) / (col("nrm") * col("cnrm")))
      .groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("cdist"), -col("cid"))).as("cid"),
           first(col("e")).as("e"), first(col("nrm")).as("nrm"))
  }

  /** FLAT top-`topCells` cell ranking: one BoundedTopK hash aggregate
    * under the broadcast centroid table (no window, no per-vector sort).
    * `v` carries (vec_id, e, nrm); `cents` carries (cid, ce, cnrm).
    * Output: (vec_id, e, nrm, cells) with `cells` the ranked
    * array<struct<cdist, cid>> — best first, ties toward the smaller cid,
    * the tie-break every quantizer device in this file uses. Correct plan
    * while `cents` is broadcast-sized; above that, use
    * [[rankCellsTwoLevel]] (identical output contract).
    */
  private[graft] def rankCellsFlat(v: DataFrame, cents: DataFrame,
                                   topCells: Int): DataFrame =
    v.crossJoin(broadcast(cents))
      .withColumn("cdist", dot(col("e"), col("ce")) / (col("nrm") * col("cnrm")))
      .groupBy("vec_id")
      .agg(graft.functions.BoundedTopK.topK(
             struct(col("cdist"), col("cid")), topCells,
             desc = Seq(true, false)).as("cells"),
           first(col("e")).as("e"), first(col("nrm")).as("nrm"))
      .select(col("vec_id"), col("e"), col("nrm"), col("cells"))

  /** TWO-LEVEL (coarse → fine) top-`topCells` cell ranking — the
    * assignment device that survives nList >> broadcast (round-13
    * verdict's one remaining 100-TB assumption): [[rankCellsFlat]]'s
    * `crossJoin(broadcast(cents))` costs nList·dim per vector and needs
    * the WHOLE centroid table resident per task, which stops working once
    * nList tracks corpus/targetBlock (10⁶+ cells at 100 TB). Here only
    * the `nSuper` SUPER-centroids broadcast (size it ~√nList and both
    * levels stay ~√nList·dim per vector):
    *
    *  1. super-centroids = the centroids with cid < nSuper (the same
    *     deterministic first-N device as the quantizer itself — callers'
    *     centroid ids are dense from 0 by construction);
    *  2. every centroid assigns to its rank-1 super-cell (one broadcast
    *     pass over the nList-row centroid table — the only full-centroid
    *     scan, and it is per-CENTROID, not per-vector);
    *  3. every vector ranks its top-`cSuper` super-cells (BoundedTopK
    *     under the nSuper-row broadcast);
    *  4. the vector joins the MEMBER centroids of those super-cells on
    *     the super-cell id — an explicit shuffle_hash join, never a
    *     broadcast of the centroid table — and one more BoundedTopK
    *     ranks the final `topCells` cells among the candidates.
    *
    * Same output contract and tie-breaks as [[rankCellsFlat]], and
    * EQUAL OUTPUT when cSuper == nSuper (all super-cells probed ⇒ the
    * candidate set is the whole centroid table — SimilaritySpec pins
    * it); with cSuper < nSuper the ranking is approximate in the
    * standard IVF sense (a true top cell hiding in an unprobed
    * super-cell is missed), priced by the same recall gates that price
    * the flat quantizer's own nProbe trade (q234/q238).
    *
    * Scale note: the stage-4 shuffle keys on sid, so its parallelism is
    * bounded by nSuper — another reason nSuper ~ √nList (10³ partitions
    * at nList = 10⁶), not a constant.
    *
    * Shuffle-bytes note (round-14 verdict): the fine-ranking aggregation
    * carries ONLY (vec_id, cdist, cid) — e/nrm re-attach afterwards by a
    * vec_id join against `v`, which co-locates with the aggregation's own
    * hashPartitioning(vec_id) (no extra exchange on the ranked side), so
    * exactly ONE exchange in the whole plan bears each vector's embedding
    * more than once: the inherent sid-keyed candidate join, where e must
    * meet its cSuper super-cells' member centroids. The earlier shape
    * (first(e)/first(nrm) through the final agg) re-shipped e up to
    * cSuper more times per vector at fine-ranking time — at 10⁹ vectors
    * that roughly doubled the stage's shuffle bytes. The re-attach
    * re-scans v's source projection instead (map-only, columnar) — a
    * scan is the cheap side of that trade at every scale.
    */
  def rankCellsTwoLevel(v: DataFrame, cents: DataFrame, nSuper: Int,
                        cSuper: Int, topCells: Int): DataFrame = {
    require(nSuper >= 1, s"nSuper must be >= 1, got $nSuper")
    require(cSuper >= 1 && cSuper <= nSuper,
      s"cSuper must be in [1, nSuper=$nSuper], got $cSuper")
    require(topCells >= 1, s"topCells must be >= 1, got $topCells")
    val supers = cents.filter(col("cid") < nSuper)
      .select(col("cid").as("sid"), col("ce").as("se"), col("cnrm").as("senrm"))
    // centroid → rank-1 super-cell: the nList-row table never broadcasts;
    // it flows INTO a shuffle keyed on sid for the stage-4 join.
    val centAssign = cents.crossJoin(broadcast(supers))
      .withColumn("sdist", dot(col("ce"), col("se")) / (col("cnrm") * col("senrm")))
      .groupBy("cid")
      .agg(max_by(col("sid"), struct(col("sdist"), -col("sid"))).as("sid"),
           first(col("ce")).as("ce"), first(col("cnrm")).as("cnrm"))
    val vsup = v.crossJoin(broadcast(supers))
      .withColumn("sdist", dot(col("e"), col("se")) / (col("nrm") * col("senrm")))
      .groupBy("vec_id")
      .agg(graft.functions.BoundedTopK.topK(
             struct(col("sdist"), col("sid")), cSuper,
             desc = Seq(true, false)).as("sups"),
           first(col("e")).as("e"), first(col("nrm")).as("nrm"))
      .select(col("vec_id"), col("e"), col("nrm"),
        explode(col("sups.sid")).as("sid"))
    val fine = vsup.join(centAssign.hint("shuffle_hash"), Seq("sid"))
      .withColumn("cdist", dot(col("e"), col("ce")) / (col("nrm") * col("cnrm")))
      .groupBy("vec_id")
      .agg(graft.functions.BoundedTopK.topK(
             struct(col("cdist"), col("cid")), topCells,
             desc = Seq(true, false)).as("cells"))
    v.select(col("vec_id"), col("e"), col("nrm"))
      .join(fine, Seq("vec_id"))
      .select(col("vec_id"), col("e"), col("nrm"), col("cells"))
  }

  /** [[ivfIndexFrames]] with TWO-LEVEL corpus assignment
    * ([[rankCellsTwoLevel]] at topCells = 1): the index build for
    * nList >> broadcast. The centroid table itself is unchanged (first-N
    * device), so probes of either index are structurally identical; cell
    * CONTENTS differ from the flat build exactly where a vector's rank-1
    * centroid hides in an unprobed super-cell — the standard coarse-
    * quantizer trade, gated where it ships (q238's oracle replays the
    * composed assignment end to end).
    */
  def ivfIndexFramesTwoLevel(emb: DataFrame, nList: Int = 16,
                             nSuper: Int = 4, cSuper: Int = 2): IvfIndex = {
    val v = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
    val cents = v.filter(col("vec_id") < nList)
      .select(col("vec_id").as("cid"), col("e").as("ce"), col("nrm").as("cnrm"))
    val assigned = rankCellsTwoLevel(v, cents, nSuper, cSuper, topCells = 1)
      .select(col("vec_id"), col("e"), col("nrm"),
        explode(col("cells.cid")).as("cid"))
      .select(col("cid"), col("vec_id"), col("e"), col("nrm"))
    IvfIndex(cents, assigned)
  }

  /** Materialize the IVF index: the cell table as parquet BUCKETED on cid
    * (Sinks.parquetBucketed — the q103 admission-index device) and the
    * centroid table as a plain saved table. A corpus that outgrows
    * per-query assignment pays the one-time build scan here; every later
    * query batch probes the bucketed cells with zero corpus-side shuffle.
    * Doubles round-trip parquet bit-exact, so a probe of the SAVED index
    * stays hash-identical to the in-plan one.
    */
  def saveIvfIndex(emb: DataFrame, tableBase: String, nList: Int = 16,
                   numBuckets: Int = 32): IvfIndex = {
    val s = emb.sparkSession
    graft.sources.IndexCommits.reset(s, tableBase)
    val e = graft.sources.IndexCommits.begin(s, tableBase)
    val idx = ivfIndexFrames(emb, nList)
    graft.sources.Sinks.parquetBucketed(
      idx.assigned.withColumn("epoch", org.apache.spark.sql.functions.lit(e)),
      s"${tableBase}_cells", "cid", numBuckets)
    graft.sources.Sinks.reclaimOrphanTableLocation(s, s"${tableBase}_cents")
    idx.centroids.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(s"${tableBase}_cents")
    graft.sources.IndexCommits.commit(s, tableBase, e)
    loadIvfIndex(s, tableBase)
  }

  /** Open a persisted IVF index at its COMMITTED state (IndexCommits):
    * the cell table filtered to `_SUCCESS`-carrying epochs, so a crashed
    * admission's orphan rows never reach a probe; centroids are frozen
    * at build time and read as-is.
    */
  def loadIvfIndex(s: org.apache.spark.sql.SparkSession,
                   tableBase: String): IvfIndex =
    IvfIndex(s.table(s"${tableBase}_cents"),
      s.table(s"${tableBase}_cells")
        .filter(graft.sources.IndexCommits.committedFilter(s, tableBase))
        .drop("epoch"))

  /** Admit a NEW vector batch into a persisted IVF index without touching
    * the corpus already indexed: the saved centroids (frozen at build
    * time) assign only the arriving batch — one broadcast pass over the
    * batch, nothing corpus-side moves — and the assignments APPEND into
    * the bucketed cell table, at most one new file per touched bucket.
    * Because [[assignToCells]] depends only on the centroid vectors, the
    * appended index is row-identical to a full rebuild whose quantizer
    * saw the same centroids (q155 proves it under q28's exact oracle).
    * Repeated admissions accumulate small per-bucket files; compact with
    * Sinks.compactBucketedTable on the same cadence as any bucketed fact
    * table (q156 gates the full build → admit → compact loop). When the
    * admission runs in another session (a foreachBatch clone, another
    * job), readers must `refreshTable` — their relation cache still lists
    * the pre-append files.
    */
  def appendIvfIndexSaved(newEmb: DataFrame, tableBase: String,
                          numBuckets: Int = 32): IvfIndex = {
    val s = newEmb.sparkSession
    val e = appendIvfIndexPartial(newEmb, tableBase, numBuckets)
    graft.sources.IndexCommits.commit(s, tableBase, e)
    loadIvfIndex(s, tableBase)
  }

  /** [[appendIvfIndexSaved]] without the commit — the kill-point hook
    * (cell rows landed under a fresh epoch, never flipped visible).
    */
  private[graft] def appendIvfIndexPartial(newEmb: DataFrame,
                                           tableBase: String,
                                           numBuckets: Int = 32): Long = {
    val s = newEmb.sparkSession
    val e = graft.sources.IndexCommits.begin(s, tableBase)
    val cents = s.table(s"${tableBase}_cents")
    assignToCells(cents, newEmb)
      .withColumn("epoch", org.apache.spark.sql.functions.lit(e))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .format("parquet")
      .bucketBy(numBuckets, "cid").sortBy("cid")
      .saveAsTable(s"${tableBase}_cells")
    e
  }

  /** Streaming twin of the indexed ANN probe path — query vectors arrive
    * as a stream, each micro-batch probes the PERSISTED bucketed index
    * through the exact [[ivfTopKIndexed]] plan the batch path runs, and
    * the per-batch result frame goes to `onBatch`. Closes the last
    * batch/stream asymmetry in the similarity family (admission already
    * streams via appendIvfIndexSaved; retrieval via
    * Retrieval.retrievalProbeStream): a probe's top-k depends only on the
    * index, never on other probes, so any micro-batch split of a query
    * set unions to the one-shot answer bit-for-bit (SimilaritySpec gates
    * it against q153's plan on a MemoryStream).
    *
    * The index resolves BY TABLE NAME inside each micro-batch:
    * foreachBatch hands over a frame from a cloned session, and an
    * [[IvfIndex]] holding the launching session's DataFrames would mix
    * resolution across sessions. Same zero-corpus-shuffle posture as the
    * batch probe — the bucketed cell table never re-shuffles per batch.
    */
  def annProbeStream(tableBase: String, probes: DataFrame, k: Int,
                     nProbe: Int = 4,
                     onBatch: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    probes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          // committed view per micro-batch: an admission committing
          // between batches becomes visible at the next batch boundary,
          // and a crashed one never does
          onBatch(ivfTopKIndexed(loadIvfIndex(s, tableBase), batch, k,
            nProbe), id)
        }
      }
      .start()

  /** Probe an [[IvfIndex]] with a query batch: nProbe nearest cells per
    * query (centroids broadcast), candidate join keyed on cell id, per-
    * query top-k. Output and tie-breaks identical to [[ivfTopK]] with the
    * default quantizer. The small probe side broadcasts against the
    * (possibly bucketed) cell scan, so a persisted index serves repeated
    * query batches with no corpus-side shuffle at all; a genuinely large
    * query batch flips to a shuffled join on cid, which the bucketed side
    * still satisfies without re-shuffling the corpus.
    */
  def ivfTopKIndexed(index: IvfIndex, queries: DataFrame, k: Int,
                     nProbe: Int = 4): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"),
        toDouble(col("embedding")).as("qe"))
      .withColumn("qnrm", norm(col("qe")))
    val wProbe = Window.partitionBy("qid").orderBy(col("qdist").desc, col("cid"))
    val probes = q.crossJoin(broadcast(index.centroids))
      .withColumn("qdist", dot(col("qe"), col("ce")) / (col("qnrm") * col("cnrm")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nProbe)
      .select(col("qid"), col("qe"), col("qnrm"), col("cid"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    probes.join(index.assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qe"), col("e")) / (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
              round(col("cos"), 6).as("cos_sim"))
  }

  /** SEMANTIC admission — the embedding member of the admission family
    * (exact md5 → q67, SimHash → q96, MinHash → q103's banded walk):
    * admit an arriving vector batch iff NO indexed corpus vector sits
    * within cosine >= threshold. This is SemDeDup pointed at ingest —
    * the screen that rejects a paraphrase whose text passed every
    * lexical admission stage.
    *
    * Shape: the batch assigns to its nProbe nearest cells (one
    * BoundedTopK hash-agg under the broadcast centroid table — no
    * window), probes ONLY those cells of the index (left join keyed on
    * cid — a saved index's bucketed cell scan satisfies it with zero
    * corpus-side shuffle, the q103/q153 posture), and one hash-agg
    * counts threshold hits per batch vector. A vector probing only
    * empty cells survives the left join with n_neardup 0. The corpus is
    * never broadcast and never re-shuffled; per-batch work is
    * batch × probed-cell population. Recall is the standard IVF probe
    * trade (the corpus side sits in its rank-1 cell; a near-dup is
    * found iff that cell is among the batch vector's nProbe) — the same
    * contract q28/q153 carry, recall-gated there.
    *
    * `nSuper > 0` routes the batch's cell ranking through
    * [[rankCellsTwoLevel]] (probing top-`cSuper` super-cells first) —
    * the nList >> broadcast posture; the default stays flat, which is
    * the right plan while the centroid table genuinely broadcasts.
    */
  def admitEmbedding(newEmb: DataFrame, index: IvfIndex, threshold: Double,
                     nProbe: Int = 4, nSuper: Int = 0,
                     cSuper: Int = 2): DataFrame = {
    val v = newEmb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
    val ranked =
      if (nSuper <= 0) rankCellsFlat(v, index.centroids, nProbe)
      else rankCellsTwoLevel(v, index.centroids, nSuper, cSuper, nProbe)
    val probes = ranked
      .select(col("vec_id"), col("e"), col("nrm"),
        explode(col("cells.cid")).as("cid"))
    val cand = index.assigned.select(col("cid"),
      col("vec_id").as("cand_id"), col("e").as("ie"), col("nrm").as("inrm"))
    probes.join(cand.hint("shuffle_hash"), Seq("cid"), "left")
      .withColumn("hit",
        col("cand_id").isNotNull &&
          dot(col("e"), col("ie")) / (col("nrm") * col("inrm")) >= threshold)
      .groupBy("vec_id")
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("n_neardup"))
      .withColumn("admitted", col("n_neardup") === 0L)
  }

  /** Deterministic sampled k-means for the IVF coarse quantizer (the
    * production path docs/SCALE.md names; first-N is the fixture-scale
    * stand-in). Everything is reproducible by construction — no RNG:
    *
    *  - init = the first nList vectors (exactly the stand-in centroids);
    *  - the Lloyd rounds run over a deterministic hash-sample, vectors
    *    with xxhash64(vec_id) % sampleMod == 0 (sampleMod=1 keeps all;
    *    at 100 TB size it so the sample is ~100k rows — centroid quality
    *    needs a sample, not the corpus);
    *  - per-dimension means aggregate through DECIMAL(28,16), so refined
    *    centroids are bit-stable across partitionings;
    *  - assignment ties break toward the smaller cell id (same max_by
    *    rule the query-time assignment uses).
    *
    * Each round is ONE distributed aggregation job; only the nList x dim
    * centroid matrix (broadcast-sized by construction) ever reaches the
    * driver. Cells that capture no sample vectors keep their previous
    * centroid.
    */
  private[graft] def kmeansCentroids(v: DataFrame, nList: Int, iters: Int,
                                     sampleMod: Long): Array[(Long, Seq[Double])] = {
    val session = v.sparkSession
    import session.implicits._
    // persisted across the iters jobs: without it every Lloyd round (and
    // the init collect) would re-run the source lineage — scan, cast,
    // norm, hash-sample filter — from scratch
    val sample = (if (sampleMod <= 1L) v
                  else v.filter(pmod(xxhash64(col("vec_id")), lit(sampleMod)) === 0))
      .select(col("vec_id"), col("e"), col("nrm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // init reads from v, not the sample (the first nList vectors might not
    // survive the hash-sample): the vec_id < nList filter pushes down to
    // the scan, so this collect is footer-cheap
    var cents: Array[(Long, Array[Double])] = v.filter(col("vec_id") < nList)
      .orderBy("vec_id").select("vec_id", "e")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    for (_ <- 1 to iters) {
      val cdf = broadcast(
        cents.toSeq.map { case (cid, ce) =>
          (cid, ce.toSeq, math.sqrt(ce.map(x => x * x).sum))
        }.toDF("cid", "ce", "cnrm"))
      val assigned = sample.crossJoin(cdf)
        .withColumn("sim", dot(col("e"), col("ce")) / (col("nrm") * col("cnrm")))
        .groupBy("vec_id")
        .agg(max_by(col("cid"), struct(col("sim"), -col("cid"))).as("cid"),
             first(col("e")).as("e"), first(col("nrm")).as("vnrm"))
      // spherical k-means: average the UNIT vectors (the centroid that
      // maximizes the summed cosine of its members), not the raw vectors —
      // raw means of weakly-clustered high-dim data collapse toward the
      // origin and assign by noise
      val stats = assigned
        .select(col("cid"),
          posexplode(transform(col("e"), x => x / col("vnrm"))).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(sum(col("x").cast(org.apache.spark.sql.types.DecimalType(28, 16))).as("s"),
             count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getLong(0))
      cents = cents.map { case (cid, old) =>
        cid -> stats.get(cid).fold(old) { rows =>
          val mean = old.clone()
          rows.foreach { r =>
            mean(r.getInt(1)) =
              (r.getDecimal(2).doubleValue() / r.getLong(3).toDouble)
          }
          mean
        }
      }
    }
    sample.unpersist(blocking = false)
    cents.map { case (cid, ce) => cid -> ce.toSeq }
  }

  /** Per-label centroid of an embedding column, order-invariant by
    * construction: components are quantized to the 2^-20 fixed-point grid
    * (floor(x * 2^20) — EXACT in double for any float input, since scaling
    * by a power of two never rounds), so the distributed mean is a BIGINT
    * sum divided by a count — no IEEE summation order anywhere, no decimal
    * rounding-mode contract with the oracle engine. One shuffle on
    * (label, pos) sized labels x dim, then a labels-sized re-assembly; the
    * raw vectors never shuffle. Precondition: |x| < 2^43 per component
    * (unit-ish embedding scale), else the quantized value overflows a long.
    *
    * The 2^-20 grid shifts each centroid component by < 1e-6 of the exact
    * float mean — far below embedding noise; downstream cosines are stable
    * (and cosine is scale-invariant in the centroid anyway).
    */
  def labelCentroids(emb: DataFrame, labelCol: String = "label",
                     vecCol: String = "embedding"): DataFrame = {
    val quantized = transform(col(vecCol),
      x => floor(x.cast("double") * lit((1L << 20).toDouble)).cast("long"))
    emb.select(col(labelCol).as("label"), posexplode(quantized).as(Seq("pos", "q")))
      .groupBy("label", "pos")
      .agg((sum("q").cast("double") / count(lit(1))).as("m"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m") / lit((1L << 20).toDouble)).as("centroid"))
  }

  /** Symmetric int8 quantization audit — per vector, quantize each
    * component to q = clamp(floor(x * 127 / max|x|), -127, 127) and report
    * the integer code statistics (sum, sum of squares, saturation count).
    * This is the pre-flight check before shipping an int8-quantized ANN
    * index: a high saturation count or a degenerate code distribution
    * flags vectors a symmetric scheme will serve badly.
    *
    * Distributed shape: posexplode to (vec_id, pos, x) scalars, per-vector
    * max|x| as a hash-agg, join back on vec_id, integer re-aggregate.
    * At fixture scale the max-abs side is broadcast (observed plan); at
    * corpus scale it exceeds the broadcast threshold and the join falls
    * back to a vec_id-keyed shuffle join whose partitioning matches the
    * agg's exchange (ReuseExchange collapses the identical scan+explode
    * subplans). Nothing per-vector runs on
    * one task. The explode shape — rather than an array HOF referencing
    * max|x| computed in the same projection — is deliberate: lambda
    * bodies don't participate in subexpression elimination, so an inlined
    * max|x| would re-reduce the array once per element, O(dim^2) per row
    * (the q79 lesson, 13x measured).
    *
    * All outputs are integers computed from floor() over identical IEEE
    * double expressions — bit-exact across engines and parallelism.
    * Zero vectors (max|x| = 0) are excluded, matching SQL's NaN-division
    * row rather than inventing a code for them.
    */
  def int8QuantStats(emb: DataFrame, idCol: String = "vec_id",
                     labelCol: String = "label",
                     vecCol: String = "embedding"): DataFrame = {
    val pos = emb.select(col(idCol), col(labelCol),
      posexplode(transform(col(vecCol), _.cast("double"))).as(Seq("pos", "x")))
    val mx = pos.groupBy(idCol).agg(max(abs(col("x"))).as("maxabs"))
    pos.join(mx, idCol)
      .filter(col("maxabs") > 0)
      .select(col(idCol), col(labelCol),
        greatest(lit(-127L),
          least(lit(127L), floor(col("x") * lit(127.0) / col("maxabs")))).as("q"))
      .groupBy(idCol, labelCol)
      .agg(sum("q").as("sum_q"),
           sum(col("q") * col("q")).as("sum_q2"),
           sum(when(abs(col("q")) === 127, 1L).otherwise(0L)).as("n_sat"))
  }
}
