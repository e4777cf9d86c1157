package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic star-schema parquet fixtures
  * (/root/repo/TESTDATA.md). One method per table so call sites read like a
  * catalog; all scans are plain `spark.read.parquet`, which gives Catalyst
  * column pruning + filter pushdown into the parquet reader for free.
  */
object Tables {
  private def p(dir: String, name: String) = s"$dir/$name.parquet"

  def region(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "region"))
  def nation(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "nation"))
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "customer"))
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "supplier"))
  def part(s: SparkSession, dir: String): DataFrame     = s.read.parquet(p(dir, "part"))
  def orders(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "orders"))
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "lineitem"))
  def documents(s: SparkSession, dir: String): DataFrame  = s.read.parquet(p(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "embeddings"))

  /** `events.parquet` has shipped with several on-disk `ts` encodings across
    * fixture generations; normalize them all to a plain TIMESTAMP so every
    * downstream consumer (`unix_micros`, `withWatermark`, window functions)
    * sees one type:
    *
    *  - TIMESTAMP(NANOS): with `spark.sql.legacy.parquet.nanosAsLong` the
    *    column arrives as a Long of nanoseconds → floor-divide to µs (same
    *    truncation DuckDB applies when it narrows ns to its native us).
    *  - TIMESTAMP(isAdjustedToUTC=false, µs): Spark 4 reads this as
    *    TIMESTAMP_NTZ → cast to TIMESTAMP. The session is pinned to UTC
    *    (GraftSession), so the cast reinterprets the wall-clock value at
    *    UTC and the stored micros are unchanged — DuckDB reads the same
    *    naive timestamps, so oracle hashes still match.
    */
  def events(s: SparkSession, dir: String): DataFrame =
    normalizeTs(s.read.parquet(p(dir, "events")))

  /** ts normalization shared by the batch reader above and the streaming
    * file source (streaming/EventStreams.readEventStream).
    */
  def normalizeTs(raw: DataFrame, tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema(tsCol).dataType match {
      // integral `div`, NOT `/` — double division would lose precision on
      // nanosecond epochs (> 2^53)
      case LongType => raw.withColumn(tsCol, timestamp_micros(expr(s"`$tsCol` div 1000")))
      case TimestampNTZType => raw.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case TimestampType => raw
      // schema-drift canary: the fixtures have already shipped three `ts`
      // encodings across generations; a FOURTH must be handled
      // deliberately (truncation/zone semantics decided, oracle parity
      // re-proven), never allowed to flow through un-normalized
      case other => throw new IllegalStateException(
        s"events.`$tsCol` arrived as unhandled type ${other.sql} — known " +
          "encodings are BIGINT nanos (nanosAsLong), TIMESTAMP_NTZ µs, and " +
          "TIMESTAMP; extend Tables.normalizeTs for the new fixture " +
          "encoding and re-verify oracle hash parity before relying on it")
    }
  }

  /** Register every fixture table as a temp view so `spark.sql(...)` works —
    * the engine's SQL passthrough surface (SURVEY.md §2.9, E3).
    */
  def registerAll(s: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders").foreach { t =>
      s.read.parquet(p(dir, t)).createOrReplaceTempView(t)
    }
    lineitem(s, dir).createOrReplaceTempView("lineitem")
    documents(s, dir).createOrReplaceTempView("documents")
    embeddings(s, dir).createOrReplaceTempView("embeddings")
    events(s, dir).createOrReplaceTempView("events")
  }
}
