package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.AtomicInteger

/** Which node kinds break AQE stage reuse across a self-join's identical
  * branches? Ground truth by executed stage/task counts.
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new AtomicInteger; val tasks = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    def probe(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val a = df.select(col("k"), col("v").as("va"))
      val b = df.select(col("k"), col("v").as("vb"))
      val j = a.join(b, Seq("k")).filter(col("va") < col("vb"))
      j.count() // warm
      stages.set(0); tasks.set(0)
      j.count()
      Thread.sleep(300)
      println(s"[reuse] $name: stages=${stages.get} tasks=${tasks.get}")
    }
    val base = spark.range(0, 10000).select((col("id") % 37).as("k"), col("id").as("v"))
    probe("plain")(base)
    probe("repartitioned")(base.repartition(col("k")))
    probe("observe")(base.observe("probe_m", max(col("v"))))
    probe("objagg")(base.groupBy("k").agg(collect_list(col("v")).as("l"))
      .select(col("k"), explode(col("l")).as("v")))
    probe("crossjoin-1row-scalar")(
      base.crossJoin(base.agg(max("v").as("mx")))
        .filter(col("v") <= col("mx")).drop("mx"))
    probe("crossjoin-1row-with-observe")(
      base.crossJoin(base.observe("probe_m2", min(col("v"))).agg(max("v").as("mx")))
        .filter(col("v") <= col("mx")).drop("mx"))
    spark.stop()
  }
}
