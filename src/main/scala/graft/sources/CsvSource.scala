package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Header handling modes for messy CSV inputs (SURVEY.md §2.1 S1-S4, §7.3.1).
  *
  *  - `Raw`: column names untouched apart from BOM removal.
  *  - `Trim`: strip whitespace (the reference's
  *    `columns.str.strip()`, /root/reference/main.py:36,88).
  *  - `SnakeUpper`: full normalization for drifted headers — strip BOM /
  *    whitespace / trailing `;`, drop `(...)`/`[...]` unit suffixes,
  *    uppercase, spaces -> `_`. Makes the local `data/Ev_Population.csv`
  *    (headers `FUEL TYPE`, `LISTED PRICE ($AUD)`, `RANGE (km)`) expose the
  *    names the reference pipeline consumes (`FUEL_TYPE`, `LISTED_PRICE`,
  *    `RANGE`, main.py:49,58,62), which only the blob-hosted copies had.
  */
sealed trait HeaderMode
object HeaderMode {
  case object Raw extends HeaderMode
  case object Trim extends HeaderMode
  case object SnakeUpper extends HeaderMode
}

/** Schema-on-read CSV source with the quirks the reference inputs need:
  * arbitrary delimiter, a header that is not on the first physical line
  * (`headerLine` lines of junk titles above it — Pollution_Index.csv has 2,
  * main.py:29-35 `header=2`), UTF-8 BOM on the first header cell
  * (Electricity_Consumption.csv), and header normalization.
  *
  * Every column is read as StringType — production paths cast explicitly
  * (pandas-`coerce` semantics via `Cleaning.coerceDouble`), never infer.
  *
  * Scale note: `headerLine > 0` is implemented by zipWithIndex-dropping the
  * leading lines of the text dataset and re-parsing with Spark's CSV reader
  * over the Dataset[String] — fully distributed, no driver materialization;
  * the index filter touches only partition 0's first rows.
  *
  * Limitation: the `headerLine > 0` path splits the file into physical lines
  * before CSV parsing, so quoted fields with EMBEDDED NEWLINES are not
  * supported there (quoted embedded separators are fine; the reference
  * inputs contain neither). The default path delegates wholly to Spark's
  * parser.
  */
final case class CsvSource(
    path: String,
    sep: String = ",",
    headerLine: Int = 0,
    headerMode: HeaderMode = HeaderMode.Trim) {

  def read(spark: SparkSession): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("inferSchema", "false")
      .option("mode", "PERMISSIVE")
    val df =
      if (headerLine == 0) base.csv(path)
      else {
        // The index-drop is GLOBAL over the concatenated text, so this path
        // only makes sense for exactly one file — a glob/directory would
        // keep every later file's junk title lines as data rows.
        val hPath = new org.apache.hadoop.fs.Path(path)
        val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val matches = fs.globStatus(hPath)
        require(matches != null && matches.length == 1 && matches.head.isFile,
          s"CsvSource(headerLine=$headerLine) requires a single regular file, " +
            s"got ${if (matches == null) 0 else matches.length} matches for $path")
        import spark.implicits._
        val lines: Dataset[String] = spark.read.textFile(path)
        val body = lines.rdd.zipWithIndex()
          .filter(_._2 >= headerLine.toLong).map(_._1).toDS()
        base.csv(body)
      }
    normalizeColumns(df)
  }

  private def normalizeColumns(df: DataFrame): DataFrame = {
    val renamed = df.columns.zipWithIndex.map { case (c, i) =>
      val cleaned = CsvSource.normalize(c, headerMode)
      if (cleaned.isEmpty) s"_c$i" else cleaned
    }
    // De-duplicate collisions deterministically (pandas would mangle too).
    // The candidate loops past suffixes already taken AND past raw names
    // still to come: [X, X, X_1] -> [X, X_2, X_1], never a duplicate X_1.
    val seen = scala.collection.mutable.Set.empty[String]
    val unique = renamed.zipWithIndex.map { case (c, i) =>
      val out =
        if (!seen.contains(c)) c
        else {
          var n = 1
          var cand = s"${c}_$n"
          while (seen.contains(cand) || renamed.indexOf(cand, i + 1) >= 0) {
            n += 1; cand = s"${c}_$n"
          }
          cand
        }
      seen += out
      out
    }
    df.toDF(unique.toIndexedSeq: _*)
  }
}

object CsvSource {
  private val Bom = "﻿"

  def normalize(name: String, mode: HeaderMode): String = {
    val noBom = name.replace(Bom, "")
    mode match {
      case HeaderMode.Raw  => noBom
      case HeaderMode.Trim => noBom.trim
      case HeaderMode.SnakeUpper =>
        noBom.trim.stripSuffix(";").trim
          .replaceAll("\\s*[\\(\\[][^\\)\\]]*[\\)\\]]", "")
          .trim.toUpperCase.replaceAll("\\s+", "_")
    }
  }
}
