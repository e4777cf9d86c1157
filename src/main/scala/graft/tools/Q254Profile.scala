package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.AtomicInteger

/** Phase timing for q254's rolling-admission + epoch-fold lifecycle. */
object Q254Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    def t[A](l: String)(f: => A): A = {
      jobs.set(0)
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[q254] $l: $dt%.2f s jobs=${jobs.get}"); r
    }
    val docs = graft.Tables.documents(spark, sfDir).filter(col("text").isNotNull)
    val isNew = col("source").isin(graft.queries.Curation.NewBatchSources: _*)
    val news = docs.filter(isNew).select("doc_id", "text")
    val mx = news.agg(max("doc_id")).head().getLong(0)
    val q = mx / 4
    val batches = (0 until 4).map(i =>
      news.filter(
        (if (i == 0) lit(true) else col("doc_id") > i * q) &&
        (if (i == 3) lit(true) else col("doc_id") <= (i + 1) * q)))
    val base = "graft_rollfold_prof"
    // run twice: cold then warm
    (1 to 2).foreach { round =>
      t(s"r$round admitRollingExact(corpus, 3 batches)")(
        graft.operators.Dedup.admitRollingExact(docs.filter(!isNew), batches.take(3), base))
      t(s"r$round foldRollingAdmissions")(
        graft.operators.Dedup.foldRollingAdmissions(spark, base, Long.MaxValue))
      val out = t(s"r$round admitRollingMore(batch 4)")(
        graft.operators.Dedup.admitRollingMore(Seq(batches(3)), base))
      t(s"r$round probe count")(out.count())
    }
    spark.stop()
  }
}
