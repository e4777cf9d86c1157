package graft.tools

import org.apache.spark.sql.functions._

object CellsPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val cells = graft.operators.Dedup.embeddingNearDupsCells(emb, 0.3,
      nList = 16, nProbe = 4, maxBlockSize = 1 << 20, nSuper = 4, cSuper = 3)
    cells.count()
    val s = cells.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGE_COUNT=" + "ReusedExchange".r.findAllIn(s).length)
    println("EXCHANGE_COUNT=" + "Exchange hashpartitioning".r.findAllIn(s).length)
    println("BROADCAST_COUNT=" + "BroadcastExchange".r.findAllIn(s).length)
    println("NLJ=" + "BroadcastNestedLoopJoin".r.findAllIn(s).length)
    println(s.split("\n").filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("CollectMetrics") || l.contains("QueryStage") || l.contains("ObjectHashAggregate") || l.contains("HashAggregate")).take(80).mkString("\n"))
    spark.stop()
  }
}
