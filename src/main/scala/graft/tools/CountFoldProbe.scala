package graft.tools

import org.apache.spark.sql.functions._

/** Does Dataset.count() prune the work under a one-row (ungrouped
  * aggregate) query? Establishes what the bench's count() action actually
  * times for the banded one-row gates (q234/q240 family).
  */
object CountFoldProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val big = spark.range(0, 200000000L).toDF("id")
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
    }
    // shape A: r16-q234 — join + single ungrouped agg + project
    val a = big.filter($"id" % 7 === 0)
      .join(big.filter($"id" % 3 === 0).select($"id", lit(1).as("__f")),
        Seq("id"), "left_outer")
      .agg(count(lit(1)).as("n"), count($"__f").as("m"))
      .select($"n", ($"m" * 10 >= $"n" * 8).as("ok"))
    t("A count()")(a.count())
    t("A collect()")(a.collect().mkString)
    // shape B: r17-q234 — two aggs + crossJoin
    val b1 = big.filter($"id" % 7 === 0).agg(count(lit(1)).as("n"))
    val b2 = big.filter($"id" % 3 === 0).agg(count(lit(1)).as("m"))
    val b = b1.crossJoin(b2).select($"n", ($"m" * 10 >= $"n" * 8).as("ok"))
    t("B count()")(b.count())
    t("B collect()")(b.collect().mkString)
    println("=== A count plan ===")
    val ac = a.groupBy().count()
    println(ac.queryExecution.optimizedPlan.toString.split("\n").take(12).mkString("\n"))
    spark.stop()
  }
}
