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

  /** Fixture FRAME memo, round 17 — metadata caching, never data.
    *
    * Every `s.read.parquet(path)` constructs a fresh relation: a driver
    * file listing plus a footer read for schema resolution, measured at
    * 60-160 ms per call on these fixtures (tools.ReadCostProbe; lineitem
    * worst). Query constructors call these loaders on every invocation,
    * so a bench sweep paid that footer tax thousands of times over for
    * byte-identical immutable files — the exact repeated-listing cost
    * guide §6 tells you to cache. The memo returns the same LOGICAL plan
    * (an immutable DataFrame); every action still plans, optimizes and
    * SCANS parquet from disk — no rows, results or intermediates are
    * cached, so bench/oracle runs keep computing from the inputs.
    * Keyed weakly on the session (a stopped session's plans drop with
    * it) and strongly on (dir, table): a different dir in the same
    * session builds its own frames.
    */
  private val frameCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[(String, String), DataFrame]]()
  private def cachedFrame(s: SparkSession, dir: String, name: String)
                         (build: => DataFrame): DataFrame =
    frameCache.synchronized {
      val m = frameCache.computeIfAbsent(s,
        _ => scala.collection.mutable.Map.empty[(String, String), DataFrame])
      m.getOrElseUpdate((dir, name), build)
    }
  private def pq(s: SparkSession, dir: String, name: String): DataFrame =
    cachedFrame(s, dir, name)(s.read.parquet(p(dir, name)))

  def region(s: SparkSession, dir: String): DataFrame   = pq(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame   = pq(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = pq(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = pq(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame     = pq(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame   = pq(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = pq(s, dir, "lineitem")
  def documents(s: SparkSession, dir: String): DataFrame  = pq(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = pq(s, dir, "embeddings")

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
    cachedFrame(s, dir, "events")(normalizeTs(s.read.parquet(p(dir, "events"))))

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
    *
    * Memoized per (session, dir) — round 17: every SQL-surface query
    * construction called this, and each call re-read TEN parquet footers
    * on the driver and re-bound ten temp views, which the bench's
    * task-parallelism columns exposed as the dominant wall of the whole
    * TPC-H family (task-cpu/wall 0.05–0.15 with process-cpu/wall > 1.2:
    * the time was Catalyst/catalog work on the driver, not execution).
    * Registration is catalog SETUP, not data: the views bind file scans,
    * every query still reads parquet at execution, and nothing about
    * results can depend on re-registration of an immutable fixture dir.
    * A dir CHANGE within one session (tests sweep sf0.001/sf0.01/sf0.1)
    * re-registers and re-points the marker; no path ever drops these
    * views without registering replacements.
    */
  private val registeredDirKey = "graft.tables.registeredDir"
  def registerAll(s: SparkSession, dir: String): Unit = synchronized {
    if (s.conf.getOption(registeredDirKey).contains(dir)) return
    Seq("region", "nation", "customer", "supplier", "part", "orders").foreach { t =>
      pq(s, dir, t).createOrReplaceTempView(t)
    }
    lineitem(s, dir).createOrReplaceTempView("lineitem")
    documents(s, dir).createOrReplaceTempView("documents")
    embeddings(s, dir).createOrReplaceTempView("embeddings")
    events(s, dir).createOrReplaceTempView("events")
    s.conf.set(registeredDirKey, dir)
  }
}
