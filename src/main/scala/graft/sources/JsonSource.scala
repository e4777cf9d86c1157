package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Newline-delimited JSON reader. The schema parameter is REQUIRED on
  * purpose: Spark's JSON schema inference is a full extra pass over the
  * data before the real job starts — harmless on a laptop, a second
  * 100 TB scan in production. Declaring the schema also turns field
  * selection into parser-level projection: Jackson skips the tokens of
  * fields the schema omits, so reading 2 of 10 fields parses ~2/10 of
  * the bytes' structure instead of materializing every field and
  * pruning later.
  */
object JsonSource {
  def jsonLines(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  /** DDL-string convenience: `jsonLines(s, path, "a LONG, b STRING")`. */
  def jsonLines(s: SparkSession, path: String, ddl: String): DataFrame =
    jsonLines(s, path, StructType.fromDDL(ddl))
}
