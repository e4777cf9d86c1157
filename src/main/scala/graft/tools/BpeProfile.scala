package graft.tools

/** Dev harness: per-round wall time of the BPE trainer with and without
  * the checkpoint cadence (round-13 verdict ask #2's "Soak entry") —
  * walls at rounds = 4/8/12/16 over the sf documents table. Flat
  * per-round time = wall linear in rounds; the lazy unrolled plan's
  * re-executed aggregation subtrees show as super-linear growth.
  * Usage: runMain graft.tools.BpeProfile [sfDir]
  */
object BpeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    def wall(rounds: Int, ckptEvery: Int): Double = {
      val t0 = System.nanoTime()
      graft.operators.TextIndex.bpeMergeRounds(docs, rounds,
        ckptEvery = ckptEvery).count()
      (System.nanoTime() - t0) / 1e9
    }
    wall(2, 0) // JIT/codegen warm-up, untimed
    // lazy arm capped at 8 rounds: a prior full run measured the blow-up
    // directly (1.44 s/round at 8 -> 47 s/round at 12 — the re-executed
    // aggregation subtrees plus Catalyst analysis over the deepening
    // plan), and past it the lazy mode is minutes per point
    for (r <- Seq(4, 8)) {
      val w = wall(r, 0)
      println(f"[bpe] sf=$sfDir rounds=$r ckptEvery=0 wall=$w%.2f s " +
        f"perRound=${w / r}%.3f s")
    }
    // 32/64 added in round 15 (q245's depth): the marginal per-round wall
    // between consecutive points is the flatness statistic — the lazy
    // plan's exponential signature would show as super-linear marginals
    var prev = (0, 0.0)
    for (r <- Seq(4, 8, 12, 16, 32, 64)) {
      val w = wall(r, 4)
      val marginal = if (prev._1 == 0) w / r
                     else (w - prev._2) / (r - prev._1)
      println(f"[bpe] sf=$sfDir rounds=$r ckptEvery=4 wall=$w%.2f s " +
        f"perRound=${w / r}%.3f s marginalPerRound=$marginal%.3f s")
      prev = (r, w)
    }
    spark.stop()
  }
}
