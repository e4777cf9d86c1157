package graft.sources

import graft.SparkSpecBase

class OrcSinkSpec extends SparkSpecBase {

  test("ORC round-trip preserves every row and every dtype exactly") {
    val orig = graft.Tables.lineitem(spark, Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("orc_rt").toString
    Sinks.orc(orig, dir)
    val back = spark.read.orc(dir)
    assert(back.schema == orig.schema)
    // full-row set equality, timestamps and doubles included
    assert(back.collect().map(_.toSeq).toSet == orig.collect().map(_.toSeq).toSet)
    assert(back.count() == orig.count())
  }
}
