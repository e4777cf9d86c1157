package graft.sources

import graft.SparkSpecBase

/** S6/S7 integration against embedded Derby (ships with Spark's jars):
  * distributed JDBC write, post-write PK DDL, and read-back.
  */
class JdbcSinkSpec extends SparkSpecBase {
  import spark.implicits._

  val url = "jdbc:derby:memory:graftdb;create=true"

  test("jdbc sink writes, applies PK DDL, and reads back") {
    val dim = Seq((1L, "BEV", "Battery Electric Vehicle"),
                  (2L, "PHEV", "Plug-in Hybrid Electric Vehicle"))
      .toDF("id_fuel_type", "FUEL_TYPE", "FUEL_DESCRIPTION")
    Sinks.jdbc(dim, url, "dim_fuel_type", pkDdl = Sinks.ansiPkDdl)

    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "dim_fuel_type").load()
    assert(back.count() == 2)
    assert(back.columns.map(_.toLowerCase).toSet ==
      Set("id_fuel_type", "fuel_type", "fuel_description"))

    // the PK constraint exists: inserting a duplicate key must fail
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      intercept[java.sql.SQLException] {
        st.execute("INSERT INTO dim_fuel_type VALUES (1, 'X', 'dup key')")
      }
    } finally conn.close()
  }

  test("jdbc append adds rows without touching the existing PK") {
    val dim = Seq((10L, "HEV", "Hybrid Electric Vehicle"))
      .toDF("id_fuel2", "FUEL_TYPE", "FUEL_DESCRIPTION")
    Sinks.jdbc(dim, url, "dim_fuel2", pkDdl = Sinks.ansiPkDdl)
    val more = Seq((11L, "FCEV", "Fuel Cell Electric Vehicle"))
      .toDF("id_fuel2", "FUEL_TYPE", "FUEL_DESCRIPTION")
    Sinks.jdbc(more, url, "dim_fuel2", pkDdl = Sinks.ansiPkDdl,
      mode = org.apache.spark.sql.SaveMode.Append)

    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "dim_fuel2").load()
    assert(back.count() == 2)

    // the original PK constraint survives the append
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      intercept[java.sql.SQLException] {
        st.execute("INSERT INTO dim_fuel2 VALUES (10, 'X', 'dup key')")
      }
    } finally conn.close()
  }

  test("pk naming follows the reference's rule") {
    assert(Sinks.pkColumn("dim_suburb") == "id_suburb")
    assert(Sinks.pkColumn("fact_ev_impact") == "fact_ev_impact_id")
  }
}
