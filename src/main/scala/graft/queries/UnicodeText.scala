package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Unicode-aware tokenization under the gate (q142-q144).
  *
  * `TextFunctions.tokens` splits on a single space — oracle-consistent,
  * but real corpora carry tabs, newlines, NBSP and ideographic spaces,
  * and until round 10 callers had to remember to compose `normalizeWs`
  * (the q70 step) or tokenize wrong. `tokensUnicode` closes that trap;
  * these queries prove the variant end-to-end against DuckDB by planting
  * deterministic whitespace dirt (per-doc separator drawn from
  * tab / NBSP / double-space / U+3000 by doc_id mod 4, plus leading tab
  * and trailing space) and running token counting, quality scoring, OOV
  * rate, and BM25 over the dirty text with the Unicode tokenizer. The
  * single-space tokenizer's counts are emitted alongside in q142 so the
  * artifact SHOWS the failure the variant fixes (whole-document tokens,
  * empty-fragment inflation).
  *
  * Engine parity: the whitespace class is the enumerated
  * `TextFunctions.UnicodeWsChars` injected into BOTH the Java regex and
  * the RE2 `regexp_split_to_array` — never `\s`, whose membership
  * differs between the engines.
  */
object UnicodeText {

  /** Per-doc deterministic separator: the doc_id mod-4 ladder. */
  private def sepCol: Column =
    when(col("doc_id") % 4 === 0, lit("\t"))
      .when(col("doc_id") % 4 === 1, lit("\u00A0"))
      .when(col("doc_id") % 4 === 2, lit("  "))
      .otherwise(lit("\u3000"))

  /** The fixture documents with planted whitespace dirt: every space
    * replaced by the doc's separator, a leading tab, a trailing space.
    */
  private def dirtyDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        concat(lit("\t"), regexp_replace(col("text"), lit(" "), sepCol),
          lit(" ")).as("t"))

  /** q142: token counts + quality components over dirty text — Unicode
    * tokenizer vs the single-space tokenizer side by side.
    */
  def q142TokensUnicode(s: SparkSession, dir: String): DataFrame =
    dirtyDocs(s, dir).select(col("doc_id"),
      TextFunctions.tokenCount(col("t")).as("n_plain"),
      TextFunctions.tokenCount(col("t"), unicode = true).as("n_uni"),
      TextFunctions.meanTokenLen(col("t"), unicode = true).as("mean_len_u"),
      TextFunctions.qualityScore(col("t"), unicode = true).as("quality_u"))

  /** q143: q111's OOV-rate chain (top-20 vocabulary, broadcast membership
    * join) with the Unicode tokenizer over the dirty text — the vocab and
    * rates must come out as if the text were clean, which is exactly the
    * recovery property the tokenizer claims.
    */
  def q143OovUnicode(s: SparkSession, dir: String): DataFrame = {
    val terms = dirtyDocs(s, dir).select(col("doc_id"),
      explode(TextFunctions.tokensUnicode(col("t"))).as("term"))
    val vocab = terms.groupBy("term").agg(count(lit(1)).as("cf"))
      .orderBy(col("cf").desc, col("term")).limit(20)
      .select(col("term"), lit(1).as("in_vocab"))
    terms.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
  }

  /** q144: q118's BM25 (same terms, same scoring algebra) tokenized with
    * the Unicode variant over the dirty text.
    */
  def q144Bm25Unicode(s: SparkSession, dir: String): DataFrame =
    Signals.bm25(
      dirtyDocs(s, dir).select(col("doc_id"), col("t").as("text")),
      Seq("query", "join", "scan"), unicode = true)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q142_tokens_unicode" -> (q142TokensUnicode _),
    "q143_oov_unicode"    -> (q143OovUnicode _),
    "q144_bm25_unicode"   -> (q144Bm25Unicode _))

  // ---------------------------------------------------------------- oracle

  /** RE2 run-of-whitespace pattern — same literal characters as the Java
    * side (UnicodeWsChars resolves to literals at compile time).
    */
  private val wsRun = s"[${TextFunctions.UnicodeWsChars}]+"

  private def uToks(x: String): String =
    s"list_filter(regexp_split_to_array($x, '$wsRun'), x -> x <> '')"

  private val dirtyCte: String =
    """dirty AS (
      |  SELECT doc_id,
      |    chr(9) || regexp_replace(text, ' ',
      |      CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN chr(9)
      |        WHEN 1 THEN chr(160) WHEN 2 THEN '  ' ELSE chr(12288) END,
      |      'g') || ' ' AS t
      |  FROM documents WHERE text IS NOT NULL)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q142_tokens_unicode" ->
      s"""WITH $dirtyCte,
         |tok AS (SELECT doc_id, t, ${uToks("t")} AS ut FROM dirty)
         |SELECT doc_id,
         |  CAST(len(string_split(t, ' ')) AS INTEGER) AS n_plain,
         |  CAST(len(ut) AS INTEGER) AS n_uni,
         |  CAST(list_aggregate(list_transform(ut, x -> length(x)), 'sum')
         |    AS DOUBLE) / len(ut) AS mean_len_u,
         |  least(CAST(length(t) AS DOUBLE) / 500.0, 1.0) * 0.4
         |    + CAST(len(list_filter(ut,
         |        x -> x IN ('the', 'a', 'and', 'of', 'to', 'in'))) AS DOUBLE)
         |      / len(ut) * 0.3
         |    + (1.0 - CAST(length(t) - length(regexp_replace(t, '[.,;:!?]', '', 'g'))
         |             AS DOUBLE) / length(t)) * 0.3 AS quality_u
         |FROM tok""".stripMargin,
    "q143_oov_unicode" ->
      s"""WITH $dirtyCte,
         |terms AS (SELECT doc_id, unnest(${uToks("t")}) AS term FROM dirty),
         |v AS (SELECT term FROM (
         |    SELECT term, COUNT(*) AS cf FROM terms GROUP BY 1)
         |  ORDER BY cf DESC, term LIMIT 20)
         |SELECT t.doc_id, COUNT(*) AS n_tokens,
         |  CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |  CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS oov_rate
         |FROM terms t LEFT JOIN v ON t.term = v.term
         |GROUP BY 1""".stripMargin,
    "q144_bm25_unicode" ->
      s"""WITH $dirtyCte,
         |terms AS (SELECT doc_id, unnest(${uToks("t")}) AS term FROM dirty),
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
         |GROUP BY tf.doc_id""".stripMargin)
}
