package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Similarity, TextChunks}

/** Round-5 curation additions: line-level boilerplate removal (CCNet
  * pattern), sliding-window document chunking, int8 embedding
  * quantization audit, and source-mixture reweighting — the remaining
  * restructure/prepare stages of a training-data pipeline. Each carries a
  * full DuckDB oracle; the boilerplate fixture plants deterministic
  * synthetic lines (the q62 pattern) because the word-soup fixture has no
  * newlines of its own.
  */
object Curation2 {

  /** q85: line-level boilerplate strip. The fixture docs are single-line,
    * so two synthetic lines are appended first, deterministically from
    * doc_id: `boiler_<doc_id % 7>` (shared by ~1/7 of the corpus — a nav
    * bar) and `rare_<doc_id>` (unique — real content). With maxDf = 5 the
    * boiler lines and the original word-soup dupes drop; rare lines and
    * unique soup survive in original order. The oracle rebuilds the same
    * planted text and the same doc-frequency rule over raw lines (Spark
    * keys the frequency agg on xxhash64(line) — the hash-set contract).
    */
  def q85BoilerplateStrip(s: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(s, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), concat(
        col("text"), lit("\n"),
        lit("boiler_"), (col("doc_id") % 7).cast("string"), lit("\n"),
        lit("rare_"), col("doc_id").cast("string")).as("text"))
    TextChunks.stripFrequentLines(planted, maxDf = 5)
  }

  /** q86: sliding-window chunking — 32-token chunks every 24 tokens
    * (8-token overlap), the training-sequence / RAG splitter. Pure map
    * work; the oracle replays the identical slice arithmetic.
    */
  def q86DocChunks(s: SparkSession, dir: String): DataFrame =
    TextChunks.slidingChunks(
      Tables.documents(s, dir).filter(col("text").isNotNull),
      chunkSize = 32, stride = 24)

  /** q87: int8 quantization audit over the embeddings table — integer
    * code stats per vector (operators.Similarity.int8QuantStats). All
    * outputs integral: floor() over identical IEEE doubles on both
    * engines, so the hash comparison is exact.
    */
  def q87EmbedQuantize(s: SparkSession, dir: String): DataFrame =
    Similarity.int8QuantStats(Tables.embeddings(s, dir))

  /** q88: source-mixture reweighting — per source, the sampling weight
    * (in ppm) that moves the corpus from its ACTUAL token share to a
    * TARGET share. Target shares are a pure function of the source name
    * ((n mod 5 + 1) x 40000 ppm — deterministic at every sf, standing in
    * for the config table a real pipeline would broadcast). The corpus
    * total stays in-plan as a broadcast 1-row crossJoin (q43 pattern, no
    * driver count()), and the weight is integer floor-division so the
    * oracle comparison is exact. BIGINT headroom: target_ppm x
    * total_tokens overflows past ~4.6e13 corpus tokens — at that scale
    * swap the product into DECIMAL(38,0) (the dsum pattern).
    */
  def q88MixtureWeights(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(s, dir)
      .filter(col("text").isNotNull)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(size(TextFunctions.tokens(col("text"))).cast("long")).as("n_tokens"))
    val tot = per.agg(sum("n_tokens").as("total_tokens"))
    per.crossJoin(broadcast(tot))
      .withColumn("target_ppm",
        (regexp_extract(col("source"), "(\\d+)$", 1).cast("long") % 5 + 1) * 40000L)
      .select(col("source"), col("n_docs"), col("n_tokens"), col("target_ppm"),
        expr("(target_ppm * total_tokens) DIV n_tokens").as("weight_ppm"))
  }

  /** q92: apply q88's weights — deterministically downsample each source
    * toward the target mixture by md5-ppm bucket
    * (operators.Sampling.resampleToMixture). End-to-end: weights are
    * computed in-plan (q88), broadcast against the corpus, and the keep
    * decision is a pure function of doc_id — reproducible at any
    * parallelism, no RNG state, no shuffle of the corpus. Weights over
    * 1e6 ppm (under-represented sources) keep all rows: filtering cannot
    * upsample; the q88 weight output is what a repetition-based upsampler
    * would consume instead.
    */
  def q92MixtureResample(s: SparkSession, dir: String): DataFrame = {
    val weights = q88MixtureWeights(s, dir).select("source", "weight_ppm")
    graft.operators.Sampling.resampleToMixture(
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("source")),
      idCol = "doc_id", stratumCol = "source", weights = weights)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_boilerplate_strip" -> (q85BoilerplateStrip _),
    "q86_doc_chunks"        -> (q86DocChunks _),
    "q87_embed_quantize"    -> (q87EmbedQuantize _),
    "q88_mixture_weights"   -> (q88MixtureWeights _),
    "q92_mixture_resample"  -> (q92MixtureResample _))

  val oracles: Map[String, String] = Map(
    "q85_boilerplate_strip" ->
      """WITH docs AS (SELECT doc_id,
        |    text || chr(10) || 'boiler_' || CAST(doc_id % 7 AS VARCHAR)
        |         || chr(10) || 'rare_' || CAST(doc_id AS VARCHAR) AS t2
        |  FROM documents WHERE text IS NOT NULL),
        |lines AS (SELECT doc_id,
        |    generate_subscripts(string_split(t2, chr(10)), 1) AS pos,
        |    unnest(string_split(t2, chr(10))) AS line FROM docs),
        |freq AS (SELECT line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY 1)
        |SELECT l.doc_id,
        |  CAST(SUM(CASE WHEN f.df < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN f.df >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  string_agg(CASE WHEN f.df < 5 THEN l.line END, chr(10)
        |             ORDER BY l.pos) AS cleaned
        |FROM lines l JOIN freq f USING (line)
        |GROUP BY 1""".stripMargin,
    "q86_doc_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id,
        |  CAST((t.s - 1) // 24 AS INTEGER) AS chunk_idx,
        |  CAST(t.s AS INTEGER) AS chunk_start,
        |  CAST(len(toks[t.s : least(t.s + 31, len(toks))]) AS INTEGER) AS n_tokens,
        |  array_to_string(toks[t.s : least(t.s + 31, len(toks))], ' ') AS chunk_text
        |FROM d, unnest(generate_series(1, greatest(len(toks), 1), 24)) AS t(s)""".stripMargin,
    // floor() over the same double expression on both engines; all
    // outputs integral, so exact. Zero vectors excluded (maxabs > 0).
    "q87_embed_quantize" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
        |pos AS (SELECT vec_id, label, i, e[i] AS x FROM v, range(1, 65) t(i)),
        |mx AS (SELECT vec_id, MAX(abs(x)) AS maxabs FROM pos GROUP BY 1),
        |q AS (SELECT p.vec_id, p.label,
        |        GREATEST(-127, LEAST(127,
        |          CAST(floor(p.x * 127.0 / m.maxabs) AS BIGINT))) AS q
        |      FROM pos p JOIN mx m USING (vec_id) WHERE m.maxabs > 0)
        |SELECT vec_id, label, CAST(SUM(q) AS BIGINT) AS sum_q,
        |  CAST(SUM(q * q) AS BIGINT) AS sum_q2,
        |  CAST(SUM(CASE WHEN abs(q) = 127 THEN 1 ELSE 0 END) AS BIGINT) AS n_sat
        |FROM q GROUP BY 1, 2""".stripMargin,
    // TRY_CAST(NULLIF(...)) mirrors Spark's null-yielding regexp_extract →
    // cast on a source name WITHOUT trailing digits; plain CAST('' AS
    // BIGINT) would raise in DuckDB — an engine divergence the srcN
    // fixture naming otherwise masks
    "q88_mixture_weights" ->
      """WITH per AS (SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM per)
        |SELECT source, n_docs, n_tokens,
        |  (TRY_CAST(NULLIF(regexp_extract(source, '(\d+)$', 1), '') AS BIGINT) % 5 + 1) * 40000
        |    AS target_ppm,
        |  ((TRY_CAST(NULLIF(regexp_extract(source, '(\d+)$', 1), '') AS BIGINT) % 5 + 1) * 40000
        |    * total_tokens) // n_tokens AS weight_ppm
        |FROM per, tot""".stripMargin,
    // q88's weight CTE + the md5-ppm keep rule (q60's '0x'||hex device,
    // 8 hex digits for ppm granularity)
    "q92_mixture_resample" ->
      """WITH per AS (SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM per),
        |w AS (SELECT source,
        |  ((TRY_CAST(NULLIF(regexp_extract(source, '(\d+)$', 1), '') AS BIGINT) % 5 + 1) * 40000
        |    * total_tokens) // n_tokens AS weight_ppm
        |  FROM per, tot)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN w USING (source)
        |WHERE d.text IS NOT NULL
        |  AND ('0x' || substr(md5(coalesce(d.doc_id::VARCHAR, '')), 1, 8))::BIGINT
        |      % 1000000 < w.weight_ppm""".stripMargin)
}
