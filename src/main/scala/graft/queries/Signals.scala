package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.functions.VectorFunctions
import graft.operators.{Dedup, Similarity, Skew}

/** Round-5 additions: corpus-signal and analytics queries a training-data
  * pipeline runs AFTER the cleaning/dedup families already shipped —
  * token-rarity scoring, canonical-survivor selection, embedding-drift
  * distance, funnel analytics, and the partition-pruned scan path.
  *
  * Engine-parity contracts (SURVEY.md §8) as everywhere else: integer
  * aggregates + one final IEEE division (q80/q82), per-row IEEE arithmetic
  * replicated in the oracle (q81 quality), decimal sums for double
  * aggregation (q84), fixed-point quantization for float means (q82).
  */
object Signals {

  /** q80: token-rarity signal — for every document, the corpus frequency of
    * its tokens: mean over token OCCURRENCES and the rarest token's count.
    * Low mean_cf = jargon/gibberish-heavy; very high = boilerplate. The
    * standard cheap companion to the q39 quality score (a unigram-LM
    * log-prob is one `ln` away, but transcendental bit-parity across
    * engines isn't contractual, so the declared signal stays integral).
    *
    * Shape: explode -> (doc_id, term) tf agg -> term-keyed cf agg -> join
    * back -> per-doc agg. Linear in total tokens, never pairwise. The cf
    * join is keyed on term, a Zipf-skewed key ("the" carries ~5 % of
    * postings): the declared query routes it through Skew.saltedJoin —
    * the tf (postings) side salts deterministically on doc_id, the cf
    * (vocabulary) side replicates saltBuckets×, so the head term's
    * postings land on saltBuckets reducers instead of one. Replication
    * cost is vocabulary-sized (already aggregated, tiny next to
    * postings); both aggregations around the join are hash-aggs with
    * map-side partials, so the hot key never funnels into one task
    * anywhere in the plan. Identical output to the plain join — the
    * shared oracle proves it, SignalsSpec pins the ≥k-way spread on a
    * planted Zipf head.
    */
  def q80TokenRarity(s: SparkSession, dir: String): DataFrame =
    tokenRarity(Tables.documents(s, dir).filter(col("text").isNotNull),
      saltBuckets = 8)

  /** q80's engine. saltBuckets = 0 keeps the plain term join (AQE
    * skew-join territory); > 0 salts it (the shape that survives a Zipf
    * head without relying on runtime re-planning).
    */
  def tokenRarity(docs: DataFrame, saltBuckets: Int = 0): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy("term").agg(sum("tf").as("cf"))
    val joined =
      if (saltBuckets > 0) Skew.saltedJoin(tf, cf, "term", col("doc_id"), saltBuckets)
      else tf.join(cf, "term")
    joined
      .groupBy("doc_id")
      .agg((sum(col("tf") * col("cf")).cast("double") / sum("tf")).as("mean_cf"),
           min("cf").as("min_cf"))
  }

  /** q81: the dedup pipeline's LAST stage end-to-end — q24's exact
    * near-dup pairs, q58's connected components, then ONE survivor per
    * cluster: highest q39 quality, ties to the smaller doc_id
    * (operators.Dedup.keepBest — a single hash-agg argmax, no per-cluster
    * window). Unclustered docs survive as clusters of one. Oracle rebuilds
    * the identical selection over the recursive-CTE closure.
    */
  def q81DedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val scored = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality"))
    // jaccardPairs edges are (lang, source)-block-local, so resolution is
    // the one-pass blocked union-find (same fixed point as the iterative
    // resolvers q58/q77 gate — DedupSpec pins the equality)
    val labels = Dedup.blockedComponents(
      Dedup.jaccardPairs(docs, threshold = 0.8, keepBlock = true), "block")
    Dedup.keepBestLabeled(scored, labels)
  }

  /** q82: embedding drift/outlier signal — every vector's cosine to its
    * label's centroid (operators.Similarity.labelCentroids: 2^-20
    * fixed-point quantized mean, so the distributed average is a BIGINT
    * sum — order-invariant with no decimal rounding-mode contract). The
    * centroid frame is labels x dim scalars, broadcast back against the
    * corpus: the vectors themselves shuffle once on (label, pos) as
    * exploded longs and never as whole arrays.
    */
  def q82CentroidDist(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val cent = Similarity.labelCentroids(emb)
    emb.select(col("vec_id"), col("label"),
        VectorFunctions.toDouble(col("embedding")).as("e"))
      .join(broadcast(cent), "label")
      .select(col("vec_id"), col("label"),
        round(VectorFunctions.cosine(col("e"), col("centroid")), 6)
          .as("cos_centroid"))
  }

  /** q83: event-funnel stages — per user, how far the strictly-ordered
    * first-occurrence chain signup < view < click < purchase progresses
    * (0..4). One conditional-min aggregate per stage in ONE groupBy pass
    * over the events — no window, no self-join, no per-user sort; the
    * classic product-analytics query at its scale-correct shape.
    */
  def q83Funnel(s: SparkSession, dir: String): DataFrame = {
    def firstTs(t: String) = min(when(col("event_type") === t, col("ts")))
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(firstTs("signup").as("t_signup"), firstTs("view").as("t_view"),
           firstTs("click").as("t_click"), firstTs("purchase").as("t_purchase"))
      .select(col("user_id"),
        when(col("t_signup").isNull, 0)
          .when(col("t_view").isNull || col("t_view") <= col("t_signup"), 1)
          .when(col("t_click").isNull || col("t_click") <= col("t_view"), 2)
          .when(col("t_purchase").isNull || col("t_purchase") <= col("t_click"), 3)
          .otherwise(4).cast("int").as("funnel_stage"))
  }

  /** q84: the partition-pruning ingest path — events re-written once as
    * date-partitioned parquet (sources.Sinks.parquetPartitioned), then a
    * one-day rollup whose scan prunes to that single date directory
    * (PartitionFilters in the plan; SignalsSpec asserts exactly one
    * selected partition). At 100 TB this is the difference between
    * scanning a day and scanning a decade. Result is bit-identical to
    * filtering the unpartitioned table — partitioning is physical layout
    * only, which is exactly what the shared oracle proves.
    */
  def q84PartitionPruned(s: SparkSession, dir: String): DataFrame = {
    val path = PartitionedEvents.ensure(s, dir)
    s.read.parquet(path)
      .filter(col("d") === to_date(lit("2024-01-15")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("total_value"))
  }

  /** q97: the Z-order data-skipping read path — orders re-written once as
    * Morton-interleaved parquet on (o_custkey, o_totalprice)
    * (sources.Sinks.parquetZOrdered), then a 2-D band aggregate whose
    * scan's pushed min/max predicates skip every file whose dyadic
    * (custkey, price) rectangle misses the box (BucketedSinksSpec pins
    * the skipping; SignalsSpec pins it for THIS band). The layout
    * complement of q84: partition pruning cuts directories on a
    * partition key, Z-order cuts files on two NON-partition columns —
    * at 100 TB the dashboard's range reads (reference app.py:231,373)
    * touch a few dyadic squares instead of the whole table. Result is
    * bit-identical to the same predicate on the plain table — layout
    * only, which the shared-oracle comparison proves.
    */
  def q97ZOrderRead(s: SparkSession, dir: String): DataFrame = {
    val path = ZOrderedOrders.ensure(s, dir)
    s.read.parquet(path)
      .filter(col("o_custkey").between(40L, 120L) &&
              col("o_totalprice").between(50000.0, 200000.0))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("total_price"))
  }

  /** q108: JSONL round-trip under the oracle — documents written once as
    * newline-delimited JSON (sources.Sinks.jsonLines, memoized like the
    * other layout twins) and read back through the explicit-schema reader
    * (sources.JsonSource), then a per-source fidelity aggregate: row
    * count, character mass, and min(md5(text)) — the last one
    * content-sensitive, so any escaping loss in the round-trip flips the
    * hash. Oracle is the SAME aggregate on the parquet table: layout
    * only, bit-identical text. The reader declares only the 4 fields the
    * query needs (n_chars stays unparsed) — the JSON analog of column
    * pruning.
    */
  def q108JsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = JsonDocuments.ensure(s, dir)
    graft.sources.JsonSource
      .jsonLines(s, path, "doc_id LONG, text STRING, lang STRING, source STRING")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        min(md5(col("text"))).as("min_text_md5"))
  }

  /** q179: ORC round-trip parity — lineitem written once through the ORC
    * sink (sources.Sinks.orc), read back by Spark's native vectorized ORC
    * reader, and aggregated; the oracle runs the SAME aggregation over
    * the parquet original, so a hash match certifies every value class
    * survives the format hop bit-exactly (BIGINTs, doubles through the
    * DECIMAL(28,s) discipline, strings, timestamps via min/max). The
    * interchange contract a multi-engine lake needs before ORC can carry
    * curated exports.
    */
  def q179OrcRoundtrip(s: SparkSession, dir: String): DataFrame =
    s.read.orc(OrcLineitem.ensure(s, dir))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        graft.queries.dsum(col("l_quantity"), 2).as("sum_qty"),
        graft.queries.dsum(col("l_extendedprice"), 2).as("sum_price"),
        countDistinct(col("l_partkey")).as("n_parts"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q111: out-of-vocabulary rate per doc against the corpus top-N
    * vocabulary — the coverage signal read before fixing a tokenizer
    * vocab size (docs stuffed with tokens the vocab won't cover are
    * UNK-soup after tokenization). Top-N by (corpus frequency DESC, term)
    * so the cutoff is deterministic in both engines; N = 20 against the
    * fixtures' 31-term vocabulary (at production scale the same plan
    * carries N ≈ 50k).
    *
    * Scale shape: the vocabulary is an aggregate of the token-frequency
    * frame (vocab-sized, NOT corpus-sized) cut by a driver-bounded
    * TakeOrdered(N) — the one place a global sort is fine because N rows
    * survive it; it then broadcasts to the per-token left join, so the
    * corpus-side explode never shuffles at all for the membership test.
    */
  def q111OovRate(s: SparkSession, dir: String): DataFrame = {
    val terms = Tables.documents(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
    val vocab = terms.groupBy("term").agg(count(lit(1)).as("cf"))
      .orderBy(col("cf").desc, col("term")).limit(20)
      .select(col("term"), lit(1).as("in_vocab"))
    terms.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
  }

  /** q116: certified-exact heavy tokens — every token carrying ≥ 1/2000 of
    * the corpus's token mass, with its EXACT count. The naive shape
    * (`groupBy(term).count` then filter) shuffles one row per DISTINCT
    * term: at 100 TB the vocabulary is unbounded (typos, URLs, OOV noise),
    * so that shuffle grows with data while the answer stays ≤ 2000 rows.
    * Declared shape: one bounded-state Misra–Gries pass (capacity 8192
    * counters per partition, merged map-side like any agg) yields a
    * candidate set that PROVABLY contains every qualifying term — a term
    * absent from the summary has true count ≤ n/8193 < n/2000 — then an
    * exact recount restricted to the ≤ 8192 candidates via broadcast
    * semi-filter, so the second shuffle carries candidate tokens only.
    * Exact output from a sketch prescreen: which extra candidates MG
    * happens to keep never changes the answer, so the query is
    * deterministic and fully oracle-checked.
    */
  def q116HeavyTokens(s: SparkSession, dir: String): DataFrame =
    heavyTokens(Tables.documents(s, dir).filter(col("text").isNotNull),
      capacity = 8192, denom = 2000L)

  /** q177: count-min-sketch audit of the top-20 corpus tokens — the
    * third sketch in the family (q100 HLL distinct, q54 quantile): CMS
    * answers "how often did THIS key occur" from O(width·depth) state,
    * the streaming-side frequency primitive when exact per-key counts
    * can't be kept. Banded-gate formulation (the q25/q44 device): the
    * exact top-20 counts are SQL-expressible and hash-checked; the
    * sketch enters through its two guarantees stated as booleans the
    * oracle asserts TRUE — est ≥ count always (no deletions), and
    * est ≤ count + ⌈eps·N⌉ (the width bound). Seeded, so the whole
    * output is deterministic. The sketch aggregates distributedly
    * (map-side merged like any agg); only the ~160 KB serialized sketch
    * and the 20 result rows reach the driver — bounded by construction.
    */
  def q177CmsHeavyAudit(s: SparkSession, dir: String): DataFrame = {
    val eps = 0.001
    val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
    val terms = docs.select(explode(TextFunctions.tokens(col("text"))).as("term"))
    val row = terms.agg(
      count_min_sketch(col("term"), lit(eps), lit(0.999), lit(42)).as("cms"),
      count(lit(1)).as("n")).head()
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    val slack = math.ceil(eps * row.getLong(1)).toLong
    val top = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(20).collect()
    import s.implicits._
    top.toSeq.map { r =>
      val est = cms.estimateCount(r.getString(0))
      (r.getString(0), r.getLong(1),
        est >= r.getLong(1), est <= r.getLong(1) + slack)
    }.toDF("term", "cnt", "cms_lower_ok", "cms_upper_ok")
      .orderBy(col("cnt").desc, col("term"))
  }

  /** q116's engine: exact counts of all terms with count*denom >= n.
    * Completeness needs capacity > denom (certified at require-time, not
    * discovered at answer-time).
    */
  def heavyTokens(docs: DataFrame, capacity: Int, denom: Long): DataFrame = {
    require(capacity.toLong > denom,
      s"capacity $capacity cannot certify threshold n/$denom: a term " +
        "missing from the summary may still qualify")
    val terms = docs.select(explode(TextFunctions.tokens(col("text"))).as("term"))
    val summary = terms.agg(
      graft.functions.MisraGries.sketch(col("term"), capacity).as("mg"),
      count(lit(1)).as("n")).head()
    val n = summary.getLong(1)
    // bounded-matrix contract: ≤ capacity rows ever reach the driver
    val cands = summary.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    val ss = docs.sparkSession
    import ss.implicits._
    terms.join(broadcast(cands.toDF("term")), "term")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(denom) >= lit(n))
  }

  /** One micro-batch transition of the streaming heavy-hitters state:
    * fold `batch`'s own MG summary and token count into `(state, n)` via
    * the mergeable-summaries trim. This is the foreachBatch body of a
    * streaming ingest — state stays ≤ capacity entries no matter how many
    * batches arrive, and the mergeable guarantee holds over everything
    * ingested (a term absent from state has true count ≤ n/(capacity+1)).
    */
  def heavyState(batch: DataFrame, state: Seq[(String, Long)], n: Long,
                 capacity: Int): (Seq[(String, Long)], Long) = {
    val row = batch
      .select(explode(TextFunctions.tokens(col("text"))).as("term"))
      .agg(graft.functions.MisraGries.sketch(col("term"), capacity).as("mg"),
           count(lit(1)).as("n")).head()
    val part = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1))
    (graft.functions.MisraGries.mergeSummaries(state, part, capacity),
      n + row.getLong(1))
  }

  /** q154: q116's answer produced the way a streaming ingest would.
    * The corpus arrives as micro-batches (replayed here as deterministic
    * md5-bucket chunks of doc_id, the q67/q96 admission-replay device);
    * each batch contributes ONE bounded Misra–Gries summary; summaries
    * fold into a ≤-capacity state via [[heavyState]]; then one exact
    * recount of the final candidate set over the archived corpus
    * certifies exact counts. The mergeable-summaries guarantee survives
    * the fold, so with capacity > denom the final state provably contains
    * every qualifying term — the recounted answer equals q116 bit-for-bit
    * regardless of how the stream was chunked, which is what lets the
    * driver check it under q116's own oracle. SignalsSpec drives the SAME
    * [[heavyState]] from a real MemoryStream via foreachBatch and asserts
    * equality with this replay.
    */
  def q154HeavyIncremental(s: SparkSession, dir: String): DataFrame =
    heavyTokensIncremental(
      Tables.documents(s, dir).filter(col("text").isNotNull),
      capacity = 8192, denom = 2000L, numBatches = 4)

  /** q154's engine: sequential micro-batch fold + exact recount. */
  def heavyTokensIncremental(docs: DataFrame, capacity: Int, denom: Long,
                             numBatches: Int): DataFrame = {
    require(capacity.toLong > denom,
      s"capacity $capacity cannot certify threshold n/$denom")
    require(numBatches > 0, s"numBatches must be positive, got $numBatches")
    val batchOf = pmod(xxhash64(col("doc_id")), lit(numBatches.toLong))
    var state = Seq.empty[(String, Long)]
    var n = 0L
    (0 until numBatches).foreach { b =>
      val (st, nn) = heavyState(docs.filter(batchOf === b), state, n, capacity)
      state = st; n = nn
    }
    val ss = docs.sparkSession
    import ss.implicits._
    val terms = docs.select(explode(TextFunctions.tokens(col("text"))).as("term"))
    terms.join(broadcast(state.map(_._1).toDF("term")), "term")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(denom) >= lit(n))
  }

  /** q118: BM25 relevance of every document against a fixed query-term
    * set — the lexical-retrieval scorer behind quality-targeted corpus
    * selection ("find docs about X to upweight"). Same distributed shape
    * as q43's TF-IDF: postings → tf / df / dl aggregates → per-row scoring
    * at the join, never a doc×query cartesian beyond the |Q| query terms,
    * and all corpus statistics (N, total tokens) stay in-plan as a
    * broadcast 1-row aggregate.
    *
    * Engine parity: k1 = 1.25 and b = 0.75 so every constant in the
    * formula (2.25, 1.25, 0.75, 0.25, 0.5) is binary-exact — no
    * decimal-literal-vs-double-literal rounding gap between engines —
    * and the classic log-idf is replaced by its rational core
    * (N − df + 0.5)/(df + 0.5) (monotone in the same argument), keeping
    * the whole score inside deterministic IEEE arithmetic, q43's
    * contract. The per-doc sum over matched query terms goes through the
    * decimal cast (dsum) so term-accumulation order cannot drift.
    */
  /** q118's lexical query — shared with q162's persisted-index probe,
    * which must score the SAME terms to run under q118's oracle. */
  val Bm25QueryTerms: Seq[String] = Seq("query", "join", "scan")

  def q118Bm25(s: SparkSession, dir: String): DataFrame =
    bm25(Tables.documents(s, dir).filter(col("text").isNotNull),
      Bm25QueryTerms)

  /** q118's engine: BM25 with rational idf, k1 = 1.25, b = 0.75.
    * `unicode` switches the tokenizer to TextFunctions.tokensUnicode
    * (q144's dirty-whitespace twin); the scoring algebra is unchanged.
    */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
           unicode: Boolean = false): DataFrame = {
    val terms = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"), unicode)).as("term"))
    val dl = terms.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot"))
    val tf = terms.filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df_ = terms.select("doc_id", "term").distinct()
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
    // every operand is an explicit double before any arithmetic, and the
    // parenthesization is mirrored token-for-token in the oracle SQL —
    // both engines then run the identical IEEE op sequence
    val avgdl = col("tot").cast("double") / col("n_docs").cast("double")
    val idf = ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val score = idf * ((col("tf").cast("double") * lit(2.25)) /
      (col("tf").cast("double") +
        lit(1.25) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl))))
    tf.join(broadcast(df_), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("score", score)
      .groupBy("doc_id").agg(dsum(col("score"), 10).as("bm25"))
  }

  /** q89: gaps-and-islands — contiguous runs of the same event_type per
    * user (the classic state-timeline/SCD build): change flag via lag,
    * island id via running sum of flags, one groupBy per island. Windows
    * are user-partitioned (never global), so each key's events sort within
    * its own task — the q31 per-key-volume contract. Deterministic order:
    * (ts, event_id) is unique, so RANGE and ROWS frames agree and both
    * engines number islands identically.
    */
  def q89TypeIslands(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("chg",
        when(lag("event_type", 1).over(w).isNull ||
             col("event_type") =!= lag("event_type", 1).over(w), 1L).otherwise(0L))
      .withColumn("island", sum("chg").over(w))
      .groupBy("user_id", "island")
      .agg(min("event_type").as("event_type"), count(lit(1)).as("n_events"),
           min("ts").cast("timestamp_ntz").as("t_start"),
           max("ts").cast("timestamp_ntz").as("t_end"))
  }

  /** q90: date-spine gap fill + last-observation-carried-forward — the
    * time-series densification step before any daily-rollup model input:
    * per-user daily totals, a complete day spine from each user's first to
    * last active day, missing days filled by LOCF. Spine explode emits
    * DATES (integers under the hood), bounded by each user's span; the
    * LOCF window is user-partitioned. Daily totals go through the
    * decimal-cast sum (dsum) so the doubles being carried forward are
    * order-invariant — LOCF then just copies bits.
    */
  def q90GapFill(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(dsum(col("value"), 6).as("day_value"))
    val spine = daily.groupBy("user_id")
      .agg(min("d").as("d0"), max("d").as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("d"))
    val w = Window.partitionBy("user_id").orderBy("d")
    spine.join(daily, Seq("user_id", "d"), "left")
      .select(col("user_id"),
        // timestamp_ntz rather than date: parquet DATE surfaces as python
        // objects in the comparison harness while DuckDB DATEs surface as
        // datetimes — the q45 output convention
        col("d").cast("timestamp_ntz").as("d"),
        col("day_value"),
        last("day_value", ignoreNulls = true).over(w).as("filled"),
        col("day_value").isNull.as("is_gap"))
  }

  /** q127: per-source least-squares trend of token count against char
    * length — the "is this slice's tokenization drifting" signal (a
    * changed char-per-token ratio flags encoding or boilerplate shifts).
    * HASH-SAFE FLOATS BY CONSTRUCTION: every aggregate is an exact
    * BIGINT moment (n, Σx, Σy, Σxy, Σx², Σy² — order-independent integer
    * adds), and slope/intercept/r are derived from those integers in a
    * fixed expression tree of IEEE-correctly-rounded ops (÷, √), so both
    * engines compute bit-identical doubles; no double ever enters a SUM.
    * One map-side-combined hash-agg over ~|sources| groups.
    */
  def q127SourceTrend(s: SparkSession, dir: String): DataFrame = {
    val m = Tables.documents(s, dir).filter(col("text").isNotNull)
      .select(col("source"),
        length(col("text")).cast("long").as("x"),
        TextFunctions.tokenCount(col("text")).cast("long").as("y"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val num  = col("n") * col("sxy") - col("sx") * col("sy")
    val denx = col("n") * col("sxx") - col("sx") * col("sx")
    val deny = col("n") * col("syy") - col("sy") * col("sy")
    val slope = when(denx =!= 0, num.cast("double") / denx.cast("double"))
    m.select(col("source"), col("n"), col("sx"), col("sy"),
      slope.as("slope"),
      when(denx =!= 0, (col("sy").cast("double") -
        slope * col("sx").cast("double")) / col("n").cast("double"))
        .as("intercept"),
      when(denx =!= 0 && deny =!= 0, num.cast("double") /
        (sqrt(denx.cast("double")) * sqrt(deny.cast("double"))))
        .as("r"))
  }

  /** q128: inverted-index AND-containment search — documents containing
    * EVERY query token, the conjunctive companion to q118's ranked BM25.
    * Shape: explode only the matching postings (an IN-list filter lands
    * before the explode output grows), count distinct matched terms per
    * doc, keep count == |query|. The corpus text never joins anything;
    * posting lists for absent terms cost nothing.
    */
  def q128ContainsAll(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("hash", "join", "scan")
    Tables.documents(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        explode(array_distinct(TextFunctions.tokens(col("text")))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") === terms.length)
  }

  /** q138: SemDeDup-style semantic deduplication composed end to end —
    * embedding-cosine near-dup pairs blocked on COARSE-QUANTIZER CELLS
    * (Dedup.embeddingNearDupsCells — the published cluster-then-dedup
    * SemDeDup shape, multi-probed, fenced, recall-gated by q234) →
    * connected-component resolution (contracted union-find + star stitch)
    * → highest-quality survivor per cluster (q81's keepBest argmax), run
    * over the embedded slice of the corpus (vec_id keys documents; q93
    * audits that contract). The flow a curation team runs when textual
    * dedup has already collapsed exact/near-text copies and what remains
    * is SEMANTIC redundancy — paraphrases and re-renderings that no
    * shingle overlap catches but embeddings place within a tight cone.
    *
    * Each stage's plan is its individually-gated one (pairs: cell-blocked
    * joins sized by the TUNABLE nList, never corpus², fenced loud; CC:
    * one union-find pass + bounded stitch rounds; keepBest: one hash-agg
    * argmax); what this gate adds is the WIRING — pair ids flowing into
    * labels, labels into clusters, the embedded-slice restriction, and
    * the quality tie-break — which no single-stage oracle sees. The
    * oracle replays the quantizer (first-16 centroids, 4-probe ranked
    * assignment — q28's replay device), the pair walk, and the closure.
    */
  def q138SemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // quantizer-CELL-blocked pairs (Dedup.embeddingNearDupsCells): the
    // production SemDeDup blocking whose key cardinality (nList) scales
    // with the corpus, multi-probed so rank-1 cell splits don't lose
    // near-dup pairs (recall vs the exact label-blocked walk gated ≥ 0.8
    // by q234), fenced so an over-cap cell trips graft_q29_cell_cap
    // instead of running cell².
    val pairs = graft.operators.Dedup.embeddingNearDupsCells(emb,
        threshold = 0.3, nList = 16, nProbe = 4, maxBlockSize = 1 << 20)
      .select(col("vec_id_a").as("doc_id_a"), col("vec_id_b").as("doc_id_b"))
    val scored = Tables.documents(s, dir)
      .join(emb.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_semi")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality"))
    // CONTRACTED resolution, not blockedComponents: multi-probe pairs are
    // NOT block-local (a vector sits in nProbe cells, so clusters chain
    // ACROSS cells — exactly blockedComponents' documented precondition
    // violation). contractedComponents keeps the in-task union-find win
    // (one pass collapses in-partition structure to depth-1) and pays the
    // iterative stitch only on the residual cross-partition forest —
    // 1-2 rounds on fixture graphs instead of the direct resolvers'
    // diameter/log-n rounds over cosine-chain clusters.
    // FOREST contraction in place (round 16): the verified pairs stream
    // out of the cell join already partitioned — forestEdges collapses
    // each partition's pairs to its spanning forest with NO shuffle, so
    // the resolver's first exchange moves O(vectors), not O(pairs).
    // Labels are provably identical (spanning subgraph); this query's
    // own closure-replaying oracle is the hash gate.
    val labels = graft.operators.Dedup.contractedComponents(
      graft.operators.Dedup.forestEdges(pairs), stitch = "star")
    graft.operators.Dedup.keepBestLabeled(scored, labels)
  }

  /** q166: bigram language-model estimation — for every vocabulary token,
    * its 3 most likely successors with conditional-probability estimates
    * (count-based MLE, reported in integer ppm so both engines divide in
    * the exact integer domain). The classic n-gram-LM fit step: Markov
    * next-token tables drive perplexity filters, gibberish detectors, and
    * cheap synthetic-text generators over a curated corpus.
    *
    * Shape: consecutive-pair extraction is per-row array algebra
    * (zip_with over two slices — no posexplode self-join on positions,
    * which would shuffle postings twice), pair counts are one map-side-
    * combined hash-agg, and the windows run over the AGGREGATED
    * (tok, nxt) table — vocabulary²-bounded, never postings-sized. A
    * Zipf-headed corpus skews the pair agg's input, not its output: the
    * head token lands in one window partition only after reduction to
    * its ≤|V| distinct successors.
    */
  def q166BigramLm(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextIndex
    TextIndex.bigramTopK(
      TextIndex.bigramPairs(Tables.documents(s, dir))
        .groupBy("tok", "nxt").agg(count(lit(1)).as("cnt")))
  }

  /** q169: q166's bigram statistics served from a PERSISTED bucketed
    * stats table through the full admission lifecycle — build from the
    * even-doc_id slice, admit the odd slice by bucketed append, fold the
    * accumulated partials with a semantic compaction (one row per pair,
    * one file per bucket, shuffle-free on the bucketing), then probe.
    * Counts are an additive monoid, so unlike BM25 postings the admission
    * path has NO doc-disjointness precondition: any batch split folds to
    * the same statistics, which is exactly why the probe can sit under
    * q166's own oracle. Declared under q166's oracle string (one LM
    * semantics, two hash-equal plans — the q162/q163 device for n-gram
    * statistics).
    */
  def q169BigramIndexed(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.bigramTopKIndexed(
      BigramStatsTables.ensure(s, dir))

  /** q167: fixed-point PageRank over the supplier↔customer trade graph —
    * nodes are suppliers and customers (disjoint 'S'/'C' id namespaces),
    * with a directed edge each way per distinct (supplier, customer)
    * shipping relation from lineitem⋈orders. Output: the 20 most central
    * nodes after 3 rounds. The integer fixed-point semantics (damping
    * 17/20, teleport 3/20, SCALE = 1e12 — operators.Graph scaladoc) make
    * the whole trajectory engine-reproducible; the oracle replays all
    * 3 rounds as an unrolled CTE chain and an independent driver-side
    * reference implementation pins the same trajectory in GraphSpec.
    *
    * Scale: edge extraction is one distinct over the fact join (linear);
    * each round is the canonical 2-exchange PageRank step (Graph
    * scaladoc); top-20 is TakeOrdered, never a global sort.
    */
  def q167PageRank(s: SparkSession, dir: String): DataFrame = {
    // node ids stay LONG through the whole computation (suppliers on the
    // even axis, customers on the odd — disjoint by parity): integer
    // distinct/joins/aggs beat string keys by ~3x here; the 'S'/'C'
    // presentation labels are minted on the final 20 rows only. The
    // distinct pair set comes from the TradeGraphPairs materialization
    // (shared with q170) — rebuilding the fact join + distinct per
    // invocation measurably dominated the whole query (2.4 s of 3.9 s).
    val sc = s.read.parquet(TradeGraphPairs.ensure(s, dir))
    val edges = sc.select(col("sk").as("src"), col("ck").as("dst"))
      .union(sc.select(col("ck").as("src"), col("sk").as("dst")))
    graft.operators.Graph.fixedPointPageRank(edges, iterations = 3)
      .orderBy(col("pr").desc, col("id"))
      .limit(20)
      .select(
        when(col("id") % 2 === 0, concat(lit("S"), expr("id DIV 2")))
          .otherwise(concat(lit("C"), expr("id DIV 2")))
          .as("id"),
        col("pr"))
  }

  /** q170: PERSONALIZED PageRank over q167's trade graph — teleport mass
    * restricted to the suppliers of nations 0-4 (the trusted-seed set),
    * so authority flows outward from them: the seed-propagation scorer
    * behind "upweight sources linked from curated domains". Same integer
    * fixed-point contract (operators.Graph scaladoc); the oracle replays
    * all 3 rounds with the seed-conditional base term, and GraphSpec pins
    * the plain-Scala reference on the same graph.
    */
  def q170PersonalizedPr(s: SparkSession, dir: String): DataFrame = {
    val sc = s.read.parquet(TradeGraphPairs.ensure(s, dir))
    val edges = sc.select(col("sk").as("src"), col("ck").as("dst"))
      .union(sc.select(col("ck").as("src"), col("sk").as("dst")))
    val seeds = Tables.supplier(s, dir).filter(col("s_nationkey") < 5)
      .select((col("s_suppkey").cast("long") * 2).as("id"))
    graft.operators.Graph.personalizedPageRank(edges, seeds, iterations = 3)
      .orderBy(col("pr").desc, col("id"))
      .limit(20)
      .select(
        when(col("id") % 2 === 0, concat(lit("S"), expr("id DIV 2")))
          .otherwise(concat(lit("C"), expr("id DIV 2")))
          .as("id"),
        col("pr"))
  }

  /** q171: HITS hubs & authorities over the DIRECTED supplier→customer
    * trade graph (no symmetrization — the two roles are the point:
    * hub = supplier ranked by the breadth×quality of customers reached,
    * authority = customer ranked by the hubs reaching it). Integer
    * max-quantized normalization per operators.Graph.hits; the oracle
    * replays both rounds' a/h alternation, GraphSpec pins the reference.
    */
  def q171Hits(s: SparkSession, dir: String): DataFrame = {
    val sc = s.read.parquet(TradeGraphPairs.ensure(s, dir))
    val edges = sc.select(col("sk").as("src"), col("ck").as("dst"))
    val hs = graft.operators.Graph.hits(edges, iterations = 2)
    val dec = when(col("id") % 2 === 0, concat(lit("S"), expr("id DIV 2")))
      .otherwise(concat(lit("C"), expr("id DIV 2"))).as("id")
    hs.hubs.orderBy(col("s").desc, col("id")).limit(10)
      .select(lit("hub").as("role"), dec, col("s"))
      .unionByName(
        hs.authorities.orderBy(col("s").desc, col("id")).limit(10)
          .select(lit("authority").as("role"), dec, col("s")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q171_hits"            -> (q171Hits _),
    "q170_personalized_pr" -> (q170PersonalizedPr _),
    "q167_pagerank"       -> (q167PageRank _),
    "q166_bigram_lm"      -> (q166BigramLm _),
    "q169_bigram_indexed" -> (q169BigramIndexed _),
    "q138_semantic_dedup" -> (q138SemanticDedup _),
    "q127_source_trend"   -> (q127SourceTrend _),
    "q128_contains_all"   -> (q128ContainsAll _),
    "q80_token_rarity"    -> (q80TokenRarity _),
    "q81_dedup_keep_best" -> (q81DedupKeepBest _),
    "q82_centroid_dist"   -> (q82CentroidDist _),
    "q83_funnel"          -> (q83Funnel _),
    "q84_partition_pruned" -> (q84PartitionPruned _),
    "q89_type_islands"    -> (q89TypeIslands _),
    "q90_gap_fill"        -> (q90GapFill _),
    "q97_zorder_read"     -> (q97ZOrderRead _),
    "q108_json_roundtrip" -> (q108JsonRoundtrip _),
    "q179_orc_roundtrip"  -> (q179OrcRoundtrip _),
    "q111_oov_rate"       -> (q111OovRate _),
    "q116_heavy_tokens"   -> (q116HeavyTokens _),
    "q154_heavy_incremental" -> (q154HeavyIncremental _),
    "q177_cms_heavy_audit" -> (q177CmsHeavyAudit _),
    "q118_bm25"           -> (q118Bm25 _))

  /** q116's oracle, shared verbatim by q154: the incremental fold must
    * reproduce the exact heavy-hitters answer, so both run under the one
    * SQL formulation.
    */
  /** q166's oracle, shared verbatim by q169: the persisted bigram-stats
    * probe must reproduce the exact direct-pass answer. */
  private val bigramLmSql: String =
    """WITH t AS (
      |  SELECT string_split(text, ' ') AS ts
      |  FROM documents WHERE text IS NOT NULL),
      |p AS (
      |  SELECT ts[i] AS tok, ts[i + 1] AS nxt
      |  FROM t, UNNEST(range(1, len(ts))) AS u(i)
      |  WHERE len(ts) >= 2),
      |c AS (SELECT tok, nxt, COUNT(*) AS cnt FROM p GROUP BY 1, 2),
      |r AS (
      |  SELECT tok, nxt, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY tok) AS BIGINT) AS tot,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY tok
      |      ORDER BY cnt DESC, nxt) AS INTEGER) AS rk
      |  FROM c)
      |SELECT tok, rk, nxt, cnt, tot, cnt * 1000000 // tot AS p_ppm
      |FROM r WHERE rk <= 3""".stripMargin

  private val heavyTokensSql: String =
    """WITH terms AS (SELECT unnest(string_split(text, ' ')) AS term
      |               FROM documents WHERE text IS NOT NULL),
      |tot AS (SELECT COUNT(*) AS n FROM terms)
      |SELECT term, COUNT(*) AS cnt
      |FROM terms GROUP BY term
      |HAVING COUNT(*) * 2000 >= (SELECT n FROM tot)""".stripMargin

  /** One unrolled PageRank round over `prev` — Graph.fixedPointPageRank's
    * integer recurrence verbatim (see its scaladoc for the contract). */
  private def pageRankRoundSql(prev: String): String =
    s"""SELECT e.dst AS id,
      |  CAST((3 * 1000000000000) // (20 * nn.n)
      |    + (17 * CAST(SUM(p.pr // d.outdeg) AS BIGINT)) // 20 AS BIGINT) AS pr
      |FROM edges e JOIN $prev p ON p.id = e.src
      |  JOIN deg d ON d.src = e.src, nn
      |GROUP BY e.dst, nn.n""".stripMargin

  /** One unrolled personalized round over `prev`: the seed-conditional
    * base term joins from the static basef CTE. */
  private def personalizedRoundSql(prev: String): String =
    s"""SELECT e.dst AS id,
      |  bf.b + (17 * CAST(SUM(p.pr // d.outdeg) AS BIGINT)) // 20 AS pr
      |FROM edges e JOIN $prev p ON p.id = e.src
      |  JOIN deg d ON d.src = e.src
      |  JOIN basef bf ON bf.id = e.dst
      |GROUP BY e.dst, bf.b""".stripMargin

  /** One unrolled HITS round i over hub frame `hprev` (CTE fragments). */
  private def hitsRoundSql(hprev: String, i: Int): String =
    s"""araw$i AS (
      |  SELECT e.dst AS id, CAST(SUM(h.s) AS BIGINT) AS raw
      |  FROM edges e JOIN $hprev h ON h.id = e.src GROUP BY e.dst),
      |ga$i AS (SELECT GREATEST(CAST(1 AS BIGINT), MAX(raw) // 1000000000000) AS g
      |         FROM araw$i),
      |auth$i AS (SELECT id, raw // (SELECT g FROM ga$i) AS s FROM araw$i),
      |hraw$i AS (
      |  SELECT e.src AS id, CAST(SUM(a.s) AS BIGINT) AS raw
      |  FROM edges e JOIN auth$i a ON a.id = e.dst GROUP BY e.src),
      |gh$i AS (SELECT GREATEST(CAST(1 AS BIGINT), MAX(raw) // 1000000000000) AS g
      |         FROM hraw$i),
      |hub$i AS (SELECT id, raw // (SELECT g FROM gh$i) AS s FROM hraw$i)""".stripMargin

  val oracles: Map[String, String] = Map(
    // two unrolled a/h alternations with max-quantized normalization
    "q171_hits" ->
      s"""WITH sc AS (
        |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) * 2 AS sk,
        |    CAST(o_custkey AS BIGINT) * 2 + 1 AS ck
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT sk AS src, ck AS dst FROM sc),
        |h0 AS (SELECT DISTINCT src AS id, CAST(1000000000000 AS BIGINT) AS s
        |       FROM edges),
        |${hitsRoundSql("h0", 1)},
        |${hitsRoundSql("hub1", 2)},
        |tophub AS (SELECT 'hub' AS role, id, s FROM hub2
        |           ORDER BY s DESC, id LIMIT 10),
        |topauth AS (SELECT 'authority' AS role, id, s FROM auth2
        |            ORDER BY s DESC, id LIMIT 10),
        |u AS (SELECT * FROM tophub UNION ALL SELECT * FROM topauth)
        |SELECT role, CASE WHEN id % 2 = 0 THEN 'S' || (id // 2)
        |                  ELSE 'C' || (id // 2) END AS id, s
        |FROM u""".stripMargin,
    // personalized teleport: seed-conditional base; same unrolled device
    "q170_personalized_pr" ->
      s"""WITH sc AS (
        |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) * 2 AS sk,
        |    CAST(o_custkey AS BIGINT) * 2 + 1 AS ck
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT sk AS src, ck AS dst FROM sc
        |          UNION ALL SELECT ck, sk FROM sc),
        |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |seeds AS (SELECT DISTINCT CAST(s_suppkey AS BIGINT) * 2 AS id
        |          FROM supplier WHERE s_nationkey < 5),
        |sn AS (SELECT COUNT(*) AS k FROM seeds s JOIN nodes n ON n.id = s.id),
        |basef AS (SELECT n.id,
        |    CASE WHEN s.id IS NOT NULL
        |         THEN CAST((3 * 1000000000000) // (20 * sn.k) AS BIGINT)
        |         ELSE CAST(0 AS BIGINT) END AS b
        |  FROM nodes n LEFT JOIN seeds s ON n.id = s.id, sn),
        |pr0 AS (SELECT n.id,
        |    CASE WHEN s.id IS NOT NULL THEN CAST(1000000000000 // sn.k AS BIGINT)
        |         ELSE CAST(0 AS BIGINT) END AS pr
        |  FROM nodes n LEFT JOIN seeds s ON n.id = s.id, sn),
        |it1 AS (${personalizedRoundSql("pr0")}),
        |it2 AS (${personalizedRoundSql("it1")}),
        |it3 AS (${personalizedRoundSql("it2")}),
        |top AS (SELECT id, pr FROM it3 ORDER BY pr DESC, id LIMIT 20)
        |SELECT CASE WHEN id % 2 = 0 THEN 'S' || (id // 2)
        |            ELSE 'C' || (id // 2) END AS id, pr
        |FROM top""".stripMargin,
    // 3 unrolled rounds of the integer recurrence; the S/C namespaces keep
    // supplier and customer keys disjoint
    "q167_pagerank" ->
      s"""WITH sc AS (
        |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) * 2 AS sk,
        |    CAST(o_custkey AS BIGINT) * 2 + 1 AS ck
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT sk AS src, ck AS dst FROM sc
        |          UNION ALL SELECT ck, sk FROM sc),
        |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |pr0 AS (SELECT id, CAST(1000000000000 // nn.n AS BIGINT) AS pr
        |        FROM nodes, nn),
        |it1 AS (${pageRankRoundSql("pr0")}),
        |it2 AS (${pageRankRoundSql("it1")}),
        |it3 AS (${pageRankRoundSql("it2")}),
        |top AS (SELECT id, pr FROM it3 ORDER BY pr DESC, id LIMIT 20)
        |SELECT CASE WHEN id % 2 = 0 THEN 'S' || (id // 2)
        |            ELSE 'C' || (id // 2) END AS id, pr
        |FROM top""".stripMargin,
    // consecutive-pair MLE; integer ppm so both engines divide integers
    "q166_bigram_lm" -> bigramLmSql,
    // the persisted-stats probe must be bit-identical to the direct pass
    "q169_bigram_indexed" -> bigramLmSql,
    // q29's pair CTE (same unrounded-cos threshold), q58's recursive
    // closure, q81's (quality DESC, doc_id) argmax — over the embedded
    // document slice
    "q138_semantic_dedup" ->
      s"""WITH RECURSIVE
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |cents AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 16),
        |ranked AS (
        |  SELECT v.vec_id, v.e, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
        |      ORDER BY list_dot_product(v.e, c.ce)
        |        / (sqrt(list_dot_product(v.e, v.e))
        |           * sqrt(list_dot_product(c.ce, c.ce))) DESC, c.cid) AS rk
        |  FROM v CROSS JOIN cents c),
        |asn AS (SELECT vec_id, e, cid FROM ranked WHERE rk <= 4),
        |p AS (SELECT DISTINCT a.vec_id AS da, b.vec_id AS db
        |      FROM asn a JOIN asn b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |      WHERE list_dot_product(a.e, b.e)
        |        / (sqrt(list_dot_product(a.e, a.e))
        |           * sqrt(list_dot_product(b.e, b.e))) >= 0.3),
        |edges AS (SELECT da AS a, db AS b FROM p UNION SELECT db, da FROM p),
        |reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |labels AS (SELECT a AS doc_id, least(a, min(b)) AS component
        |           FROM reach GROUP BY a),
        |scored AS (SELECT d.doc_id, ${Extensions.qualitySqlExpr} AS quality
        |           FROM documents d JOIN embeddings em ON d.doc_id = em.vec_id
        |           WHERE d.text IS NOT NULL),
        |cl AS (SELECT s.doc_id, coalesce(l.component, s.doc_id) AS cluster,
        |              s.quality
        |       FROM scored s LEFT JOIN labels l USING (doc_id))
        |SELECT cluster, doc_id, quality, n_docs FROM (
        |  SELECT cluster, doc_id, quality,
        |    ROW_NUMBER() OVER (PARTITION BY cluster
        |      ORDER BY quality DESC, doc_id) AS rk,
        |    COUNT(*) OVER (PARTITION BY cluster) AS n_docs
        |  FROM cl) q WHERE rk = 1""".stripMargin,
    // identical integer moments, identical derived-double expression tree
    "q127_source_trend" ->
      """WITH m AS (
        |  SELECT source, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
        |    SUM(x*x) AS sxx, SUM(y*y) AS syy
        |  FROM (SELECT source,
        |          CAST(length(text) AS BIGINT) AS x,
        |          CAST(len(string_split(text, ' ')) AS BIGINT) AS y
        |        FROM documents WHERE text IS NOT NULL)
        |  GROUP BY source)
        |SELECT source, n, CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
        |  CASE WHEN n*sxx - sx*sx <> 0 THEN
        |    CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
        |  END AS slope,
        |  CASE WHEN n*sxx - sx*sx <> 0 THEN
        |    (CAST(sy AS DOUBLE) -
        |     (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE))
        |       * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |  END AS intercept,
        |  CASE WHEN n*sxx - sx*sx <> 0 AND n*syy - sy*sy <> 0 THEN
        |    CAST(n*sxy - sx*sy AS DOUBLE) /
        |    (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
        |     sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
        |  END AS r
        |FROM m""".stripMargin,
    "q128_contains_all" ->
      """SELECT doc_id, source, COUNT(*) AS n_matched
        |FROM (SELECT doc_id, source,
        |        unnest(list_distinct(string_split(text, ' '))) AS term
        |      FROM documents WHERE text IS NOT NULL)
        |WHERE term IN ('hash', 'join', 'scan')
        |GROUP BY doc_id, source
        |HAVING COUNT(*) = 3""".stripMargin,
    "q116_heavy_tokens" -> heavyTokensSql,
    // banded CMS gate: exact top-20 counts hash-checked, the sketch's
    // two guarantees stated as booleans the oracle asserts TRUE
    "q177_cms_heavy_audit" ->
      """WITH terms AS (SELECT unnest(string_split(text, ' ')) AS term
        |               FROM documents WHERE text IS NOT NULL)
        |SELECT term, cnt, TRUE AS cms_lower_ok, TRUE AS cms_upper_ok
        |FROM (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY term) t
        |ORDER BY cnt DESC, term LIMIT 20""".stripMargin,
    "q154_heavy_incremental" -> heavyTokensSql,
    // parenthesization mirrors Signals.bm25 token-for-token; every operand
    // is cast to DOUBLE before arithmetic so DuckDB's decimal literals
    // can't introduce a different rounding path
    "q118_bm25" ->
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |               FROM documents WHERE text IS NOT NULL),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM terms GROUP BY 1),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS tot FROM dl),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms
        |       WHERE term IN ('query', 'join', 'scan') GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM terms
        |             WHERE term IN ('query', 'join', 'scan')) GROUP BY 1)
        |SELECT tf.doc_id,
        |  CAST(SUM(CAST(
        |    ((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |    * ((CAST(tf AS DOUBLE) * 2.25)
        |       / (CAST(tf AS DOUBLE)
        |          + 1.25 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
        |                    / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
        |    AS DECIMAL(28,10))) AS DOUBLE) AS bm25
        |FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        |GROUP BY tf.doc_id""".stripMargin,
    "q80_token_rarity" ->
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |               FROM documents WHERE text IS NOT NULL),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
        |cf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1)
        |SELECT doc_id, CAST(SUM(tf * cf) AS DOUBLE) / SUM(tf) AS mean_cf,
        |  MIN(cf) AS min_cf
        |FROM tf JOIN cf USING (term) GROUP BY doc_id""".stripMargin,
    // same pair CTEs as q24/q58 + the same closure as q58, then the
    // identical (quality DESC, doc_id) selection
    "q81_dedup_keep_best" ->
      s"""WITH RECURSIVE
        |${Extensions.unigramPairCtes},
        |edges AS (SELECT da AS a, db AS b FROM p UNION SELECT db, da FROM p),
        |reach AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |labels AS (SELECT a AS doc_id, least(a, min(b)) AS component
        |           FROM reach GROUP BY a),
        |scored AS (SELECT doc_id, ${Extensions.qualitySqlExpr} AS quality
        |           FROM documents WHERE text IS NOT NULL),
        |cl AS (SELECT s.doc_id, coalesce(l.component, s.doc_id) AS cluster,
        |              s.quality
        |       FROM scored s LEFT JOIN labels l USING (doc_id))
        |SELECT cluster, doc_id, quality, n_docs FROM (
        |  SELECT cluster, doc_id, quality,
        |    ROW_NUMBER() OVER (PARTITION BY cluster
        |      ORDER BY quality DESC, doc_id) AS rk,
        |    COUNT(*) OVER (PARTITION BY cluster) AS n_docs
        |  FROM cl) q WHERE rk = 1""".stripMargin,
    // floor(x * 2^20) is exact in double for any float x; the mean is a
    // BIGINT sum / count, then the 2^-20 de-scale (power-of-two division,
    // also exact) — no decimal casts, no rounding-mode dependence
    "q82_centroid_dist" ->
      """WITH v AS (SELECT label, vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |pos AS (SELECT label, vec_id, i, CAST(floor(e[i] * 1048576.0) AS BIGINT) AS q
        |        FROM v, range(1, 65) t(i)),
        |cent AS (SELECT label, i,
        |           CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1048576.0 AS m
        |         FROM pos GROUP BY 1, 2),
        |carr AS (SELECT label, list(m ORDER BY i) AS c FROM cent GROUP BY 1)
        |SELECT v.vec_id, v.label,
        |  ROUND(list_dot_product(v.e, c.c)
        |    / (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c.c, c.c))),
        |    6) AS cos_centroid
        |FROM v JOIN carr c USING (label)""".stripMargin,
    "q83_funnel" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM events GROUP BY 1)
        |SELECT user_id,
        |  CAST(CASE WHEN t_signup IS NULL THEN 0
        |       WHEN t_view IS NULL OR t_view <= t_signup THEN 1
        |       WHEN t_click IS NULL OR t_click <= t_view THEN 2
        |       WHEN t_purchase IS NULL OR t_purchase <= t_click THEN 3
        |       ELSE 4 END AS INTEGER) AS funnel_stage
        |FROM per_user""".stripMargin,
    // the oracle reads the UNPARTITIONED table: partitioning must be
    // physical layout only
    "q84_partition_pruned" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
        |GROUP BY 1""".stripMargin,
    // (ts, event_id) is unique -> RANGE/ROWS frames agree on both engines
    "q89_type_islands" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR event_type <> lag(event_type) OVER w THEN 1 ELSE 0 END AS chg
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |isl AS (
        |  SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS BIGINT) AS island
        |  FROM flagged)
        |SELECT user_id, island, MIN(event_type) AS event_type,
        |  COUNT(*) AS n_events, MIN(ts) AS t_start, MAX(ts) AS t_end
        |FROM isl GROUP BY 1, 2""".stripMargin,
    // day_value is the decimal-cast sum on BOTH engines, so the doubles
    // LOCF copies forward are bit-identical
    "q90_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS day_value
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1),
        |spine AS (SELECT user_id, CAST(t.s AS DATE) AS d
        |          FROM span, unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |            CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS t(s))
        |SELECT s.user_id, CAST(s.d AS TIMESTAMP) AS d, dly.day_value,
        |  last_value(dly.day_value IGNORE NULLS) OVER (PARTITION BY s.user_id
        |    ORDER BY s.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        |  dly.day_value IS NULL AS is_gap
        |FROM spine s LEFT JOIN daily dly
        |  ON s.user_id = dly.user_id AND s.d = dly.d""".stripMargin,
    // the oracle reads the PLAIN table: Z-order must be physical layout
    // only (q84's contract, for the two-column skipping layout)
    "q97_zorder_read" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE o_custkey BETWEEN 40 AND 120
        |  AND o_totalprice BETWEEN 50000 AND 200000
        |GROUP BY 1""".stripMargin,
    // the oracle reads the PLAIN parquet table: the JSONL round-trip must
    // be lossless, and min(md5(text)) makes any escaping loss visible
    "q108_json_roundtrip" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
        |  MIN(md5(text)) AS min_text_md5
        |FROM documents GROUP BY 1""".stripMargin,
    // round-trip parity: the oracle aggregates the parquet ORIGINAL; the
    // Spark side aggregates the ORC copy — a hash match certifies the hop
    "q179_orc_roundtrip" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  MIN(l_shipdate) AS first_ship,
        |  MAX(l_shipdate) AS last_ship
        |FROM lineitem GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // identical tokenization + (cf DESC, term) cutoff + left-join
    // membership test
    "q111_oov_rate" ->
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |               FROM documents WHERE text IS NOT NULL),
        |v AS (SELECT term FROM (
        |    SELECT term, COUNT(*) AS cf FROM terms GROUP BY 1)
        |  ORDER BY cf DESC, term LIMIT 20)
        |SELECT t.doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS oov_rate
        |FROM terms t LEFT JOIN v ON t.term = v.term
        |GROUP BY 1""".stripMargin)
}

/** JSONL twin of the documents fixture, written once per (warehouse,
  * sf-dir) through sources.Sinks.jsonLines — q108's interchange layout
  * (same dir-hash naming and _SUCCESS completeness check as the other
  * layout twins).
  */
/** q179's ORC copy of lineitem, written once per (warehouse, sf-dir) —
  * same dir-hash naming and _SUCCESS completeness contract as
  * JsonDocuments.
  */
private[queries] object OrcLineitem {
  def ensure(s: SparkSession, dir: String): String = synchronized {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), s"graft_lineitem_orc_$tag")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
      graft.sources.Sinks.orc(graft.Tables.lineitem(s, dir), path.toString)
    }
    path.toString
  }
}

private[queries] object JsonDocuments {
  def ensure(s: SparkSession, dir: String): String = synchronized {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), s"graft_documents_jsonl_$tag")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
      graft.sources.Sinks.jsonLines(graft.Tables.documents(s, dir), path.toString)
    }
    path.toString
  }
}

/** Date-partitioned twin of the events fixture, written once per
  * (warehouse, sf-dir) through sources.Sinks.parquetPartitioned — the
  * partition-pruned-read counterpart of BucketedTables (same dir-hash
  * naming, same stale-leftover handling via Overwrite semantics).
  */
private[queries] object PartitionedEvents {
  def ensure(s: SparkSession, dir: String): String = synchronized {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), s"graft_events_bydate_$tag")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    // _SUCCESS marks a complete prior write; anything else is re-written
    // (Overwrite replaces partial leftovers atomically enough for a
    // fixture twin — content is deterministic from the source dir)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
      graft.sources.Sinks.parquetPartitioned(
        Tables.events(s, dir).withColumn("d", to_date(col("ts"))),
        path.toString, "d")
    }
    path.toString
  }
}

/** Z-ordered twin of the orders fixture on (o_custkey, o_totalprice),
  * written once per (warehouse, sf-dir) through sources.Sinks
  * .parquetZOrdered — the 2-D data-skipping counterpart of
  * PartitionedEvents (same dir-hash naming, same _SUCCESS completeness
  * check). o_custkey first: the q97 band is most selective on it, and the
  * leading interleave bit gives it the finer dyadic slabs.
  */
private[queries] object ZOrderedOrders {
  def ensure(s: SparkSession, dir: String): String = synchronized {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), s"graft_orders_zorder_$tag")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
      graft.sources.Sinks.parquetZOrdered(
        Tables.orders(s, dir), path.toString,
        "o_custkey", "o_totalprice", parts = 8)
    }
    path.toString
  }
}

/** q169's lifecycle table: bigram partial counts built from the even-doc_id
  * slice, the odd slice admitted by bucketed append, then semantically
  * compacted (one row per pair, one file per bucket). Same rebuild
  * contract as Bm25AdmitTables: completeness is checked by TOTAL COUNT
  * (the additive monoid's invariant — sum(cnt) must equal the corpus's
  * consecutive-pair count), and the file-count check distinguishes
  * "admitted" from "admitted then compacted", so a crash between stages
  * rebuilds rather than serving a half-grown table as the gated one.
  */
private[queries] object BigramStatsTables {
  // per-session memo of a PASSED completeness check: the check's
  // total-count invariant costs a full corpus scan + a stats scan, and
  // with q169/q243/q244 all probing the table, a bench run paid it 4-6
  // times per query invocation (round 15: ~0.4 s each at sf0.1). Keyed
  // on the SESSION OBJECT (WeakHashMap — no identityHashCode collisions,
  // GC-friendly) and the source parquet's (length, mtime), so a
  // regenerated fixture dir invalidates the memo instead of serving
  // stale statistics (round-15 review catch). Crash safety unchanged —
  // a fresh session always re-verifies once.
  private val verified =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Set[String]]()

  private def srcStamp(dir: String): String =
    try {
      val f = new java.io.File(s"$dir/documents.parquet")
      s"${f.length}|${f.lastModified}"
    } catch { case _: Throwable => "nostat" }

  def ensure(s: SparkSession, dir: String): DataFrame = synchronized {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val table = s"graft_bigram_$tag"
    val memoKey = s"$table|${srcStamp(dir)}"
    val sessionMemo = {
      var m = verified.get(s)
      if (m == null) { m = scala.collection.mutable.Set[String](); verified.put(s, m) }
      m
    }
    if (sessionMemo.contains(memoKey) && s.catalog.tableExists(table))
      return graft.operators.TextIndex.loadBigramStats(s, table)
    val numBuckets = 32
    val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
    def files: Long = {
      val loc = new org.apache.hadoop.fs.Path(java.net.URI.create(
        s.sessionState.catalog.getTableMetadata(
          s.sessionState.sqlParser.parseTableIdentifier(table))
          .location.toString))
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.listStatus(loc).count(_.getPath.getName.endsWith(".parquet")).toLong
    }
    lazy val corpusPairs = docs
      .select(greatest(size(TextFunctions.tokens(col("text"))) - 1, lit(0))
        .cast("long").as("np"))
      .agg(coalesce(sum("np"), lit(0L))).collect()(0).getLong(0)
    val complete = s.catalog.tableExists(table) &&
      s.table(table).columns.contains("epoch") &&
      graft.sources.IndexCommits.committed(s, table).nonEmpty &&
      files <= numBuckets &&
      graft.operators.TextIndex.loadBigramStats(s, table)
        .agg(coalesce(sum("cnt"), lit(0L)))
        .collect()(0).getLong(0) == corpusPairs
    if (!complete) {
      s.sql(s"DROP TABLE IF EXISTS $table")
      graft.sources.Sinks.reclaimOrphanTableLocation(s, table)
      val isBase = pmod(col("doc_id"), lit(2L)) === 0
      graft.operators.TextIndex.saveBigramStats(docs.filter(isBase), table,
        numBuckets)
      graft.operators.TextIndex.appendBigramStats(docs.filter(!isBase), table,
        numBuckets)
      graft.operators.TextIndex.compactBigramStats(table, numBuckets)
    }
    sessionMemo += memoKey
    graft.operators.TextIndex.loadBigramStats(s, table)
  }
}

/** q167/q170's shared edge source: the distinct supplier↔customer pair
  * table (sk = suppkey*2, ck = custkey*2+1) materialized ONCE per
  * (warehouse, sf-dir) — both PageRank queries then pay only their
  * rounds, not a per-invocation fact-join + distinct. Same dir-hash
  * naming and _SUCCESS completeness contract as PartitionedEvents;
  * content is deterministic from the source dir, so Overwrite repair is
  * safe.
  */
private[queries] object TradeGraphPairs {
  def ensure(s: SparkSession, dir: String): String = synchronized {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), s"graft_trade_pairs_$tag")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
      Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey").cast("long") * 2).as("sk"),
          (col("o_custkey").cast("long") * 2 + 1).as("ck"))
        .distinct()
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path.toString)
    }
    path.toString
  }
}
