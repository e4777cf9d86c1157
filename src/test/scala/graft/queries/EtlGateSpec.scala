package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Structural invariants of the q139-q141 ETL-gate family (value-level
  * equivalence is the driver's DuckDB hash gate; tools/oracle_check.py
  * replicates it locally at all three SFs).
  */
class EtlGateSpec extends SparkSpecBase {

  test("q139 energy fact: 2023 ids 1..N then 2022 ids N+1..2N, dense") {
    val f = EtlGate.q139EnergyFact(spark, Sf0001)
    val n = f.filter(col("YEAR") === 2023).count()
    assert(n > 0 && f.count() == 2 * n)
    val ids2023 = f.filter(col("YEAR") === 2023)
      .select("fact_energy_pollution_id").collect().map(_.getInt(0)).sorted
    val ids2022 = f.filter(col("YEAR") === 2022)
      .select("fact_energy_pollution_id").collect().map(_.getInt(0)).sorted
    assert(ids2023.toSeq == (1 to n.toInt))
    assert(ids2022.toSeq == (n.toInt + 1 to 2 * n.toInt))
  }

  test("q139: every scrubbed double is finite and non-null") {
    val f = EtlGate.q139EnergyFact(spark, Sf0001)
    val doubles = f.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.DoubleType).map(_.name)
    val bad = f.filter(doubles.map(c =>
      col(c).isNull || isnan(col(c)) ||
        col(c) === Double.PositiveInfinity || col(c) === Double.NegativeInfinity)
      .reduce(_ || _)).count()
    assert(bad == 0, "inf/NaN/null leaked through the fact-boundary scrub")
  }

  test("q140 ev fact covers exactly the merged suburbs; q141 dims consistent") {
    val evf = EtlGate.q140EvFact(spark, Sf0001)
    val dims = EtlGate.q141Dims(spark, Sf0001)
    val nSuburbs = dims.filter(col("dim") === "suburb").count()
    assert(evf.count() == nSuburbs)
    // the merge is a FULL outer: EV-only, elec-only and pollution-only
    // suburbs must all be present (25 nations + Newtown/Glebe + the 4
    // pollution-only sites + Alexandria/Rozelle/Sydney overlap = 34)
    assert(nSuburbs == 34)
    assert(dims.filter(col("dim") === "vehicle_type").count() == 4)
    assert(dims.filter(col("dim") === "time").count() == 2)
    assert(dims.filter(col("dim") === "fuel_type").count() == 2)
  }

  test("fixture trio is written once and reused (completeness marker)") {
    val a = EtlCsvFixture.ensure(spark, Sf0001)
    val p = new org.apache.hadoop.fs.Path(a, "pollution.csv")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t0 = fs.getFileStatus(p).getModificationTime
    assert(EtlCsvFixture.ensure(spark, Sf0001) == a)
    assert(fs.getFileStatus(p).getModificationTime == t0, "fixture was rewritten")
  }
}
