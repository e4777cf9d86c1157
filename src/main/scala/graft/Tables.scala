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

  /** `events.parquet` stores TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong` the column arrives as a Long of
    * nanoseconds. Convert to a microsecond timestamp (floor division — same
    * truncation DuckDB applies when it narrows ns to its native us).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(p(dir, "events"))
    import org.apache.spark.sql.types.LongType
    raw.schema("ts").dataType match {
      // integral `div`, NOT `/` — double division would lose precision on
      // nanosecond epochs (> 2^53)
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw
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
