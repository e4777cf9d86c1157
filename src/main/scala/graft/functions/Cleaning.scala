package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Shared cleaning / scrubbing kernels used across the ETL pipeline.
  *
  * Semantics parity notes (SURVEY.md §7.3): the reference engine produces
  * pandas NaN/±inf from bad casts and zero divisions and then scrubs them
  * (/root/reference/main.py:266,283,334 `replace([inf,-inf],0)` +
  * `fillna(0)`). With ANSI off, Spark produces NULL instead of inf/NaN in the
  * same spots, so `scrubDoubles` only needs the NaN/inf guards for values
  * that arrive from the source data itself.
  */
object Cleaning {

  /** pandas `pd.to_numeric(errors='coerce')`: unparseable -> NULL. Spark's
    * non-ANSI string->double cast has exactly this behavior; trim first
    * because the reference strips before coercing (main.py:58-59).
    */
  def coerceDouble(c: Column): Column = trim(c).cast(DoubleType)

  /** `replace([inf,-inf],0).fillna(0)` over every double column. */
  def scrubDoubles(df: DataFrame): DataFrame = {
    val doubles = df.schema.fields.filter(_.dataType == DoubleType).map(_.name)
    val guarded = doubles.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(isnan(col(c)) || col(c) === Double.PositiveInfinity ||
             col(c) === Double.NegativeInfinity, 0.0).otherwise(col(c)))
    }
    guarded.na.fill(0.0, doubles)
  }

  /** `round(6)` over every double column (main.py:338-340). */
  def round6(df: DataFrame): DataFrame =
    df.schema.fields.filter(_.dataType == DoubleType).map(_.name)
      .foldLeft(df)((d, c) => d.withColumn(c, round(col(c), 6)))

  /** Percent change with pandas division semantics: (b-a)/a*100, where a
    * zero denominator yields ±inf by the numerator's sign (pandas float
    * division) and 0/0 or missing inputs yield NULL (pandas NaN). Spark's
    * non-ANSI Divide returns NULL for ALL zero denominators, which would
    * conflate the inf case with the NaN case — and pandas `fillna` fills
    * only NaN, so the distinction is observable through the reference's
    * fill-then-derive pipeline (main.py:104-106,166-167,182-200).
    */
  def pctChange(prev: Column, cur: Column): Column =
    when(prev === 0.0 && cur > 0.0, lit(Double.PositiveInfinity))
      .when(prev === 0.0 && cur < 0.0, lit(Double.NegativeInfinity))
      .otherwise((cur - prev) / prev * 100.0)

  /** The reference's `.replace(0, 1)` divisor guard (main.py:199,300). */
  def zeroToOne(c: Column): Column = when(c === 0, lit(1.0)).otherwise(c)

  /** The reference's safe-division closures (main.py:304-331): guard on a
    * non-positive divisor precondition, clamp absurd magnitudes to 0.
    */
  def safeRatio(num: Column, den: Column, precondition: Column): Column = {
    val r = num / den
    when(!precondition, lit(0.0))
      .when(r.isNull || isnan(r) || abs(r) === Double.PositiveInfinity || r > 1e15, lit(0.0))
      .otherwise(r)
  }

  /** Min-max normalize `c` into [0,100] given group min/max columns, with the
    * constant-column -> 50 fallback (app.py:350-359,388-398); `invert` for
    * lower-is-better metrics.
    */
  def minMaxNorm(c: Column, mn: Column, mx: Column, invert: Boolean = false): Column = {
    val scaled = (c - mn) / (mx - mn) * 100.0
    when(mx === mn, lit(50.0)).otherwise(if (invert) lit(100.0) - scaled else scaled)
  }
}
