package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.Similarity

/** Retrieval-chain and corpus-mixture queries: the RAG-side operators a
  * training-data engine grows into once dedup/curation are in place.
  *
  *  - q158: hybrid retrieval — lexical BM25 candidate generation, then a
  *    pseudo-relevance-feedback (PRF) embedding rerank. The classic
  *    two-stage retriever (BM25 recall, dense precision) expressed as one
  *    declarative plan.
  *  - q159: context packing — the reranked hits greedily packed into a
  *    fixed token budget in rank order (the "fill the prompt window" step
  *    after retrieval).
  *  - q160: Gopher-style composite quality rules — the published
  *    rule-based document filter family (word-count bounds, mean word
  *    length bounds, lexical diversity, stopword presence) as one
  *    scan-only pass.
  *  - q161: temperature-based mixture weights — alpha=0.5 source
  *    re-weighting (w_s proportional to sqrt(tokens_s)), the standard
  *    multilingual-LM recipe for up-weighting small sources.
  *
  * Engine-parity contracts used throughout (SURVEY.md §8): decimal sums
  * for order-invariant double aggregation, the 2^-20 fixed-point
  * order-invariant vector mean (q82's trick), sequential-index dot
  * products (native DotProduct kernel == DuckDB list_dot_product), and
  * sqrt (correctly rounded per IEEE 754 on both engines).
  */
object Retrieval {

  /** The lexical query for q158/q159 — shares Signals.bm25's scoring. */
  private[queries] val QueryTerms = Seq("vector", "stream", "merge")

  private val CandidateK = 20  // BM25 recall set
  private val FeedbackK = 3    // PRF seed set
  private val FinalK = 10      // reranked result size
  private val TokenBudget = 200L // q159 context window

  /** Shared stage 1+2: BM25-scored candidates with their lexical rank.
    *
    * Scale shape: bm25() is fully distributed (broadcast df/stats,
    * doc_id-keyed aggs); the top-CandidateK selection is orderBy+limit —
    * planned as TakeOrderedAndProject (per-partition heaps, merge of K
    * rows), never a global sort. The row_number window after the limit
    * only ever sees CandidateK rows (the q15 surrogate-key contract).
    */
  private def bm25Candidates(s: SparkSession, dir: String): DataFrame =
    topCandidates(Signals.bm25(
      Tables.documents(s, dir).filter(col("text").isNotNull), QueryTerms))

  private def topCandidates(scored: DataFrame): DataFrame =
    scored
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(CandidateK)
      .withColumn("brank",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
          .cast("int"))

  /** Stages 3+4: PRF centroid of the top-FeedbackK candidates, cosine
    * rerank of the full candidate set against it.
    *
    * Scale shape: the candidate set (CandidateK rows) broadcasts against
    * the embedding table — a broadcast semi-join probe, the corpus never
    * shuffles. The PRF centroid is Similarity.labelCentroids over
    * FeedbackK vectors (one label): a dim-scalars frame, broadcast as the
    * 1-row query matrix (the bounded-matrix contract). Rank is taken on
    * the RAW cosine (bit-identical on both engines: exact fixed-point
    * centroid, sequential dot, IEEE sqrt) and only the reported value is
    * rounded.
    */
  private def rerank(s: SparkSession, dir: String): DataFrame =
    rerankFrom(s, dir, bm25Candidates(s, dir))

  private def rerankFrom(s: SparkSession, dir: String,
                         candidates: DataFrame): DataFrame = {
    // the CandidateK-row candidate frame feeds BOTH the PRF seed and the
    // rerank probe. Left declarative, the diamond duplicates the whole
    // BM25 corpus pass (ReuseExchange does not collapse the branches —
    // audited: 8 document scans, 0 reused exchanges), which is two full
    // corpus reads at 100 TB. The frame is CandidateK rows by contract —
    // the bounded-matrix case (k-means centroid tables, top-20 limits) —
    // so collect it once and re-enter the plan as a local relation: one
    // corpus pass total, and the downstream PRF/rerank chain plans
    // against a 20-row literal (trivially broadcast, no cache lifecycle,
    // no serialized re-scan jobs — the round-16 persist() shape cost
    // ~0.7 s of listener/serialization tax on a 20-row frame).
    val cand = s.createDataFrame(
      java.util.Arrays.asList(candidates.collect(): _*), candidates.schema)
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
    val fb = broadcast(cand.filter(col("brank") <= FeedbackK))
      .join(emb, cand("doc_id") === emb("vec_id"))
      .select(lit(0).as("label"), col("embedding"))
    val qv = Similarity.labelCentroids(fb).select(col("centroid").as("qvec"))
    broadcast(cand)
      .join(emb, cand("doc_id") === emb("vec_id"))
      .crossJoin(broadcast(qv))
      .withColumn("cosr",
        VectorFunctions.cosine(VectorFunctions.toDouble(col("embedding")), col("qvec")))
      .withColumn("rrank",
        row_number().over(Window.orderBy(col("cosr").desc, col("doc_id")))
          .cast("int"))
      .filter(col("rrank") <= FinalK)
  }

  /** q158: hybrid retrieval — BM25 top-20, PRF-centroid cosine rerank,
    * final top-10 with both ranks and both scores.
    *
    * Candidates without an embedding row drop out of the rerank (inner
    * join): the sf0.1 fixture embeds only a 40 % prefix of the corpus, so
    * the result is the top-FinalK of the EMBEDDED candidates — the
    * partial-coverage reality of any corpus whose embedding backfill
    * trails ingestion. The oracle applies the same join.
    */
  def q158HybridRetrieval(s: SparkSession, dir: String): DataFrame =
    rerank(s, dir)
      .select(col("doc_id"), col("brank"), col("rrank"), col("bm25"),
        round(col("cosr"), 6).as("cos_prf"))

  /** q159: context packing — q158's reranked hits greedily packed into a
    * TokenBudget-token context in rerank order: a hit is admitted while
    * the budget is not yet exhausted BEFORE it (so the first over-budget
    * doc still fits partially — the q61 token-budget convention).
    * The window sees FinalK rows; the packing itself is a prefix sum.
    */
  def q159ContextPack(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
    // tokenCount AFTER the join: the reranked side is FinalK rows, so the
    // kernel runs FinalK times instead of once per corpus document (the
    // projection does not defer through the join on its own — measured)
    val withTokens = rerank(s, dir)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .withColumn("n_tokens",
        TextFunctions.tokenCount(col("text")).cast("long"))
      .drop("text")
    val w = Window.orderBy("rrank").rowsBetween(Window.unboundedPreceding, -1)
    withTokens
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("cum_before") < TokenBudget)
      .select(col("doc_id"), col("rrank"), col("n_tokens"), col("cum_before"))
  }

  /** q160: Gopher-style rule filter — the published rule family over the
    * documents table in a single scan-only projection (no shuffle at all):
    * word-count bounds, mean-word-length bounds, lexical diversity
    * (distinct-token ratio), and stopword presence; `keep` is their
    * conjunction. mean_wlen uses the exact identity
    * chars_without_separators = length(text) - (n_words - 1) for
    * single-space-joined text — integer arithmetic until one final double
    * division on both engines.
    */
  def q160GopherRules(s: SparkSession, dir: String): DataFrame = {
    val t = TextFunctions.tokens(col("text"))
    val nWords = size(t)
    val meanWlen = (length(col("text")) - (nWords - lit(1))).cast("double") /
      nWords.cast("double")
    val distinctRatio = size(array_distinct(t)).cast("double") /
      nWords.cast("double")
    val hasStop = arrays_overlap(t, array(lit("the"), lit("a"), lit("data")))
    Tables.documents(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        nWords.as("n_words"),
        round(meanWlen, 6).as("mean_wlen"),
        round(distinctRatio, 6).as("distinct_ratio"),
        hasStop.as("has_stop"),
        (nWords.between(25, 80) && meanWlen >= 4.0 && meanWlen <= 5.0 &&
          distinctRatio >= 0.45 && hasStop).as("keep"))
  }

  /** q161: temperature-based mixture weights (alpha = 0.5): each source's
    * sampling weight is sqrt(its token share), normalized — small sources
    * are up-weighted relative to proportional sampling, the standard
    * multilingual recipe. upsample_x is the resulting multiplier over
    * natural frequency. One hash-agg over the corpus plus a broadcast
    * 1-row totals frame; sqrt is correctly rounded per IEEE 754 so both
    * engines agree bit-for-bit, and the sqrt-sum is a decimal sum
    * (order-invariant across parallelism).
    */
  def q161TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(s, dir).filter(col("text").isNotNull)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text")).cast("long")).as("n_tokens"))
    val tot = per.agg(
      dsum(sqrt(col("n_tokens").cast("double")), 10).as("sum_sqrt"),
      sum("n_tokens").as("total_tokens"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(sqrt(col("n_tokens").cast("double")) / col("sum_sqrt"), 6)
          .as("temp_weight"),
        round((sqrt(col("n_tokens").cast("double")) / col("sum_sqrt")) /
          (col("n_tokens").cast("double") / col("total_tokens").cast("double")), 6)
          .as("upsample_x"))
  }

  /** q162: q118's BM25 through the PRODUCTION persisted inverted index —
    * the lexical analog of q153's persisted IVF probe: postings/doc-length/
    * stats tables built once (TextIndex.saveBm25Index, memoized per
    * (session, sf-dir)), the query answered from the term-pruned bucketed
    * posting read with the corpus never rescanned. Declared under q118's
    * own oracle: one BM25 semantics, two hash-equal plans (direct corpus
    * pass / persisted index) — the build-once / query-many migration a
    * 100 TB text corpus follows.
    */
  def q162Bm25Indexed(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.bm25Indexed(
      Bm25IndexTables.ensure(s, dir), Signals.Bm25QueryTerms)

  /** q163: the FULL text-index lifecycle under one hash gate — build the
    * inverted index from the even-doc_id slice, admit the odd slice
    * through TextIndex.appendBm25Index (batch-only tokenization, bucketed
    * appends, additive stats), COMPACT the grown tables back to one file
    * per bucket, and probe. Still q118's own oracle: admission and
    * compaction are physical lifecycle only, so the probe must stay
    * bit-identical to the direct corpus pass through build → admit →
    * compact — the maintenance loop a 100 TB text index actually runs.
    * The q156 of text retrieval.
    */
  def q163Bm25IndexAdmit(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.bm25Indexed(
      Bm25AdmitTables.ensure(s, dir), Signals.Bm25QueryTerms)

  /** q164: the WHOLE hybrid-retrieval chain (q158's semantics) served
    * from the persisted inverted index — the lexical recall stage probes
    * TextIndex.bm25Indexed instead of re-scoring the corpus, then the
    * identical PRF-centroid rerank runs downstream. Declared under q158's
    * own oracle: one retrieval semantics, two hash-equal plans (direct
    * corpus pass / persisted index), which is what a production RAG stack
    * actually runs — the corpus is tokenized once at index-build time and
    * never again on the query path.
    */
  def q164RetrievalIndexed(s: SparkSession, dir: String): DataFrame =
    hybridIndexed(s, dir, QueryTerms)

  /** The q164 chain parameterized by query terms: BM25 recall from the
    * persisted inverted index, PRF-centroid rerank, final top-k. One
    * retrieval semantics — q164 pins it to q158's oracle; the probe
    * stream below serves it per request.
    */
  private[queries] def hybridIndexed(s: SparkSession, dir: String,
                                     terms: Seq[String]): DataFrame =
    rerankFrom(s, dir, topCandidates(graft.operators.TextIndex.bm25Indexed(
        Bm25IndexTables.ensure(s, dir), terms)))
      .select(col("doc_id"), col("brank"), col("rrank"), col("bm25"),
        round(col("cosr"), 6).as("cos_prf"))

  /** Streaming twin of the indexed retrieval path (round-10 verdict ask
    * #8): a STREAM of search probes `(query_id, terms)` answered per
    * micro-batch from the SAME persisted BM25 index + embedding table the
    * batch path (q164) probes — the serving loop of a production RAG
    * stack, where the corpus was tokenized once at index-build time and
    * each arriving request pays only its own candidate read + rerank.
    *
    * Shape: foreachBatch; the micro-batch (request-sized — human queries,
    * never data) collects to the driver and each probe runs the
    * [[hybridIndexed]] chain, results tagged with the probe's query_id
    * and unioned before `onBatch` sees them. Per-probe work is the q164
    * plan verbatim, so RetrievalSpec gates stream-vs-batch EQUALITY
    * rather than mere plausibility (the q178/q154 batch-equal contract,
    * applied to retrieval).
    */
  def retrievalProbeStream(s: SparkSession, dir: String, probes: DataFrame,
      onBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    probes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val ps = batch.select(col("query_id").cast("long"), col("terms")).collect()
        if (ps.nonEmpty) {
          val res = ps.toSeq.map { r =>
            hybridIndexed(s, dir, r.getSeq[String](1))
              .withColumn("query_id", lit(r.getLong(0)))
          }.reduce(_ unionByName _)
          onBatch(res, id)
        }
      }
      .start()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q158_hybrid_retrieval" -> (q158HybridRetrieval _),
    "q159_context_pack"     -> (q159ContextPack _),
    "q160_gopher_rules"     -> (q160GopherRules _),
    "q161_temperature_mix"  -> (q161TemperatureMix _),
    "q162_bm25_indexed"     -> (q162Bm25Indexed _),
    "q163_bm25_index_admit" -> (q163Bm25IndexAdmit _),
    "q164_retrieval_indexed" -> (q164RetrievalIndexed _))

  /** The BM25→candidates→PRF-centroid→rerank CTE chain shared by the
    * q158/q159 oracles; parenthesization mirrors the Spark side
    * token-for-token (the q118 + q82 parity contracts composed).
    */
  private val rerankCtes: String =
    s"""terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |           FROM documents WHERE text IS NOT NULL),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM terms GROUP BY 1),
      |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS tot FROM dl),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms
      |       WHERE term IN ('vector', 'stream', 'merge') GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(*) AS df
      |       FROM (SELECT DISTINCT doc_id, term FROM terms
      |             WHERE term IN ('vector', 'stream', 'merge')) GROUP BY 1),
      |bm AS (SELECT tf.doc_id, CAST(SUM(CAST(
      |         ((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
      |         * ((CAST(tf AS DOUBLE) * 2.25)
      |            / (CAST(tf AS DOUBLE)
      |               + 1.25 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
      |                         / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
      |         AS DECIMAL(28,10))) AS DOUBLE) AS bm25
      |       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      |       GROUP BY tf.doc_id),
      |cand AS (SELECT doc_id, bm25, brank FROM (
      |           SELECT doc_id, bm25,
      |             CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER)
      |               AS brank
      |           FROM bm) WHERE brank <= $CandidateK),
      |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |fbq AS (SELECT i, CAST(floor(e[i] * 1048576.0) AS BIGINT) AS q
      |        FROM cand JOIN v ON v.vec_id = cand.doc_id, range(1, 65) t(i)
      |        WHERE brank <= $FeedbackK),
      |qv AS (SELECT list(m ORDER BY i) AS qvec FROM (
      |         SELECT i, CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1048576.0 AS m
      |         FROM fbq GROUP BY 1)),
      |rer AS (SELECT c.doc_id, c.brank, c.bm25,
      |          list_dot_product(v.e, qvec)
      |            / (sqrt(list_dot_product(v.e, v.e))
      |               * sqrt(list_dot_product(qvec, qvec))) AS cosr
      |        FROM cand c JOIN v ON v.vec_id = c.doc_id CROSS JOIN qv),
      |ranked AS (SELECT doc_id, brank, bm25, cosr,
      |             CAST(ROW_NUMBER() OVER (ORDER BY cosr DESC, doc_id) AS INTEGER)
      |               AS rrank
      |           FROM rer)""".stripMargin

  /** Shared by q158 (direct corpus pass) and q164 (persisted-index
    * probe) — one retrieval semantics, two hash-equal plans. */
  private val hybridOracle: String =
    s"""WITH $rerankCtes
      |SELECT doc_id, brank, rrank, bm25, ROUND(cosr, 6) AS cos_prf
      |FROM ranked WHERE rrank <= $FinalK""".stripMargin

  val oracles: Map[String, String] = Map(
    "q158_hybrid_retrieval" -> hybridOracle,
    "q164_retrieval_indexed" -> hybridOracle,
    "q159_context_pack" ->
      s"""WITH $rerankCtes
        |SELECT doc_id, rrank, n_tokens, cum_before FROM (
        |  SELECT r.doc_id, r.rrank, CAST(dl.dl AS BIGINT) AS n_tokens,
        |    CAST(COALESCE(SUM(CAST(dl.dl AS BIGINT)) OVER (ORDER BY r.rrank
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_before
        |  FROM ranked r JOIN dl USING (doc_id) WHERE r.rrank <= $FinalK)
        |WHERE cum_before < $TokenBudget""".stripMargin,
    "q160_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w
        |           FROM documents WHERE text IS NOT NULL),
        |m AS (SELECT doc_id,
        |        CAST(len(w) AS INTEGER) AS n_words,
        |        CAST(length(text) - (len(w) - 1) AS DOUBLE) / CAST(len(w) AS DOUBLE)
        |          AS mean_wlen,
        |        CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE)
        |          AS distinct_ratio,
        |        list_has_any(w, ['the', 'a', 'data']) AS has_stop
        |      FROM t)
        |SELECT doc_id, n_words, ROUND(mean_wlen, 6) AS mean_wlen,
        |  ROUND(distinct_ratio, 6) AS distinct_ratio, has_stop,
        |  (n_words BETWEEN 25 AND 80 AND mean_wlen >= 4.0 AND mean_wlen <= 5.0
        |   AND distinct_ratio >= 0.45 AND has_stop) AS keep
        |FROM m""".stripMargin,
    "q161_temperature_mix" ->
      """WITH per AS (SELECT source, COUNT(*) AS n_docs,
        |               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |             FROM documents WHERE text IS NOT NULL GROUP BY 1),
        |tot AS (SELECT CAST(SUM(CAST(sqrt(CAST(n_tokens AS DOUBLE))
        |                  AS DECIMAL(28,10))) AS DOUBLE) AS sum_sqrt,
        |          SUM(n_tokens) AS total_tokens
        |        FROM per)
        |SELECT source, n_docs, n_tokens,
        |  ROUND(sqrt(CAST(n_tokens AS DOUBLE)) / sum_sqrt, 6) AS temp_weight,
        |  ROUND((sqrt(CAST(n_tokens AS DOUBLE)) / sum_sqrt)
        |        / (CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)), 6)
        |    AS upsample_x
        |FROM per CROSS JOIN tot""".stripMargin,
    // the persisted-index probes must be bit-identical to the direct pass
    "q162_bm25_indexed"     -> Signals.oracles("q118_bm25"),
    "q163_bm25_index_admit" -> Signals.oracles("q118_bm25"))
}

/** q162's memoized index tables — same lifecycle contract as
  * IvfIndexTables/AdmissionIndexTables in Scaled.scala: name tagged by
  * sf-dir, orphan locations reclaimed, built once per session+dir.
  */
private[queries] object Bm25IndexTables {
  def ensure(s: SparkSession, dir: String): graft.operators.TextIndex.Bm25Index =
    synchronized {
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      val base = s"graft_bm25idx_$tag"
      val names = Seq(s"${base}_post", s"${base}_dl", s"${base}_stats")
      // epoch-aware completeness (round 16): a pre-epoch-format table (no
      // epoch column) or a crashed build (no committed epoch) rebuilds
      val complete = names.forall(s.catalog.tableExists) &&
        names.forall(t => s.table(t).columns.contains("epoch")) &&
        graft.sources.IndexCommits.committed(s, base).nonEmpty
      if (!complete) {
        names.filter(s.catalog.tableExists)
          .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
        names.foreach(graft.sources.Sinks.reclaimOrphanTableLocation(s, _))
        graft.operators.TextIndex.saveBm25Index(
          Tables.documents(s, dir).filter(col("text").isNotNull), base,
          numBuckets = 32)
      }
      graft.operators.TextIndex.loadBm25Index(s, base)
    }
}

/** q163's lifecycle index: built from the even-doc_id slice, the odd slice
  * admitted by bucketed append, then both grown tables compacted back to
  * one file per bucket. The completeness check (dl covers the corpus)
  * guards the build; the file-count check distinguishes "admitted" from
  * "admitted then compacted", so a crash between admit and compact
  * rebuilds rather than serving the uncompacted layout as the gated one
  * (IvfCompactTables' contract, applied to text).
  */
private[queries] object Bm25AdmitTables {
  def ensure(s: SparkSession, dir: String): graft.operators.TextIndex.Bm25Index =
    synchronized {
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      val base = s"graft_bm25adm_$tag"
      val names = Seq(s"${base}_post", s"${base}_dl", s"${base}_stats")
      val numBuckets = 32
      val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
      def files(t: String): Long = {
        val loc = new org.apache.hadoop.fs.Path(java.net.URI.create(
          s.sessionState.catalog.getTableMetadata(
            s.sessionState.sqlParser.parseTableIdentifier(t))
            .location.toString))
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.listStatus(loc).count(_.getPath.getName.endsWith(".parquet")).toLong
      }
      val complete = names.forall(s.catalog.tableExists) &&
        names.forall(t => s.table(t).columns.contains("epoch")) &&
        graft.sources.IndexCommits.committed(s, base).nonEmpty &&
        graft.operators.TextIndex.loadBm25Index(s, base)
          .docLens.count() == docs.count() &&
        files(s"${base}_post") <= numBuckets && files(s"${base}_dl") <= numBuckets
      if (!complete) {
        names.filter(s.catalog.tableExists)
          .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
        names.foreach(graft.sources.Sinks.reclaimOrphanTableLocation(s, _))
        val isBase = pmod(col("doc_id"), lit(2L)) === 0
        graft.operators.TextIndex.saveBm25Index(docs.filter(isBase), base,
          numBuckets = numBuckets)
        graft.operators.TextIndex.appendBm25Index(docs.filter(!isBase), base,
          numBuckets = numBuckets)
        graft.sources.Sinks.compactBucketedTableCommitted(s,
          s"${base}_post", base)
        graft.sources.Sinks.compactBucketedTableCommitted(s,
          s"${base}_dl", base)
      }
      graft.operators.TextIndex.loadBm25Index(s, base)
    }
}
