package graft.tools

import org.apache.spark.sql.functions._

/** Timing experiment for the approx profile: the mixed agg (HLL +
  * min/max/count in one HashAggregate) runs interpreted because one
  * ImperativeAggregate in the list disables whole-stage codegen for all
  * of them. Compares the shipped shape against a split shape (codegen
  * scalar agg + HLL-only agg) and cheaper sketch precisions.
  */
object Q76Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    val li = graft.Tables.lineitem(spark, sfDir)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

    def t(label: String)(f: => Any): Unit = {
      (1 to 3).foreach(_ => f) // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q76] $label: ${times.min}%.2f s")
    }

    t("shipped: mixed agg rsd=0.01") {
      graft.operators.Profile.numericProfileApprox(li, cols).collect()
    }
    def mixed(rsd: Double) = {
      val aggs = count(lit(1)).as("__n_rows") +: cols.flatMap { c => Seq(
        count(col(c)).as(s"${c}__n"),
        approx_count_distinct(col(c), rsd).as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
      }
      li.agg(aggs.head, aggs.tail: _*)
    }
    t("mixed agg rsd=0.05")(mixed(0.05).collect())
    def split(rsd: Double) = {
      val scalarAggs = count(lit(1)).as("__n_rows") +: cols.flatMap { c => Seq(
        count(col(c)).as(s"${c}__n"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
      }
      val hllAggs = cols.map(c => approx_count_distinct(col(c), rsd).as(s"${c}__nd"))
      li.agg(scalarAggs.head, scalarAggs.tail: _*)
        .crossJoin(broadcast(li.agg(hllAggs.head, hllAggs.tail: _*)))
    }
    t("split aggs rsd=0.01")(split(0.01).collect())
    t("split aggs rsd=0.05")(split(0.05).collect())
    t("hll-only rsd=0.01") {
      val hllAggs = cols.map(c => approx_count_distinct(col(c), 0.01).as(s"${c}__nd"))
      li.agg(hllAggs.head, hllAggs.tail: _*).collect()
    }
    t("split aggs rsd=0.02")(split(0.02).collect())
    t("split aggs rsd=0.03")(split(0.03).collect())
    for (r <- Seq(0.01, 0.02, 0.03, 0.05)) {
      val nd = split(r).select("l_extendedprice__nd").collect()(0).getLong(0)
      println(f"[q76] rsd=$r%.2f l_extendedprice nd=$nd err=${math.abs(nd - 583090.0) / 583090.0 * 100}%.2f%%")
    }
    t("scalar-only (codegen)") {
      val scalarAggs = count(lit(1)).as("__n_rows") +: cols.flatMap { c => Seq(
        count(col(c)).as(s"${c}__n"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
      }
      li.agg(scalarAggs.head, scalarAggs.tail: _*).collect()
    }
    spark.stop()
  }
}
