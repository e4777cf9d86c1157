package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal and sliding-window document chunking —
  * the two text-restructuring stages a web-corpus training pipeline runs
  * between cleaning (q62/q63/q70) and packing (q71/q74).
  *
  * Both are strictly linear in total corpus tokens: one explode, at most
  * one aggregate + join keyed on a line hash, one re-aggregate. No
  * windows, no pairwise work, nothing per-document that could funnel a
  * stratum through one task.
  */
object TextChunks {

  /** CCNet-style boilerplate strip: drop every line whose corpus document
    * frequency reaches `maxDf` (nav bars, cookie banners, footers — text
    * repeated verbatim across many pages), keep the rest in original
    * order.
    *
    * Distributed shape: posexplode lines → line-frequency hash-agg →
    * join back → per-doc re-aggregate. The frequency agg and the join are
    * keyed on `xxhash64(line)`, not the line text, so 100 TB of long
    * lines shuffle as 8-byte keys (the q38/q56/q64 hash-set == string-set
    * contract: a 64-bit collision between two distinct lines in one
    * corpus is accepted and documented, not defended against).
    *
    * The per-doc rebuild is `array_sort(collect_list(struct(pos, line)))`
    * — safe because a DOCUMENT's own line list is bounded (a document is
    * at most megabytes; it is the corpus that is 100 TB), the same
    * contract as q71's per-doc token collect.
    *
    * Output: (id, carryCols..., n_kept, n_dropped, cleaned) with `cleaned`
    * NULL when every line was boilerplate (matches SQL
    * string_agg-over-no-rows). `carryCols` ride the per-doc re-aggregate
    * as extra grouping keys (functions of the id — lang/source tags), so
    * a pipeline doesn't pay a corpus-sized join to re-attach them.
    */
  def stripFrequentLines(docs: DataFrame, maxDf: Int,
                         idCol: String = "doc_id",
                         textCol: String = "text",
                         carryCols: Seq[String] = Nil): DataFrame = {
    val keyCols = idCol +: carryCols
    val lines = docs
      .select(keyCols.map(col) :+
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")): _*)
      .select(keyCols.map(col) :+ col("pos") :+ col("line") :+
        xxhash64(col("line")).as("lh"): _*)
    val freq = lines.groupBy("lh").agg(countDistinct(idCol).as("df"))
    val keep = col("df") < maxDf
    lines.join(freq, "lh")
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
        sum(when(keep, 0L).otherwise(1L)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(when(keep, struct(col("pos").as("p"), col("line").as("l"))))),
            s => s.getField("l")),
          "\n").as("joined"))
      .select(keyCols.map(col) :+ col("n_kept") :+ col("n_dropped") :+
        when(col("n_kept") > 0, col("joined")).as("cleaned"): _*)
  }

  /** Fixed-size sliding-window chunking with overlap — the RAG /
    * training-sequence splitter: token windows of `chunkSize` starting
    * every `stride` tokens (overlap = chunkSize - stride), final chunk
    * truncated at the document end.
    *
    * Pure map work: split → posexplode(sequence(...)) → slice. The
    * sequence holds ceil(len/stride) INTEGERS (not token copies), so the
    * generator row stays small even for book-length documents; the token
    * array is carried once per output chunk by the generator, which is
    * exactly the output amplification factor chunkSize/stride (~1.3 at
    * the 32/24 default) — unavoidable, since that is the output size.
    *
    * Output: (id, chunk_idx, chunk_start [1-based], n_tokens, chunk_text).
    */
  def slidingChunks(docs: DataFrame, chunkSize: Int, stride: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"need 0 < stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    docs
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .select(col(idCol), col("toks"),
        posexplode(sequence(lit(1), greatest(size(col("toks")), lit(1)), lit(stride)))
          .as(Seq("chunk_idx", "chunk_start")))
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        slice(col("toks"), col("chunk_start"), lit(chunkSize)).as("chunk"))
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        size(col("chunk")).as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }
}
