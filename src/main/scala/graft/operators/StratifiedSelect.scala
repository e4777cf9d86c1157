package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe stratified selection — the 100 TB path the per-stratum window
  * queries (q61 token budget, q66 quantile filter, q71 sequence packing)
  * document: their exact plans run `Window.partitionBy(stratum)`, which
  * funnels EVERY row of a stratum through one task's sort. Fine at
  * dimension-sized strata; a cliff when one language holds 40 % of a
  * 100 TB corpus.
  *
  * [[chunkedPrefix]] computes the same running aggregates (prefix sum of a
  * value column, 1-based rank, stratum row count) with NO single-task
  * stratum sort, via deterministic range chunking + two-level prefix sums:
  *
  *  1. Chunk boundaries: approx quantiles of the primary order column (one
  *     columnar pass). The chunk id is then a PURE FUNCTION of the row —
  *     `#boundaries above/below the value` — monotone in the stratum
  *     order by construction. Correctness does NOT depend on boundary
  *     quality or sketch determinism: ANY monotone chunking yields the
  *     same final prefix sums, because step 3's offsets compensate
  *     exactly; boundaries only balance the partitions.
  *  2. Local pass: one window over (chunk, stratum) — partitions are
  *     chunk-bounded (~N/nChunks rows), never stratum-sized — yielding
  *     intra-chunk running sums in the stratum's exact order.
  *  3. Offsets: per-(chunk, stratum) totals (a map-side-combined
  *     aggregation, nChunks x strata rows) get per-stratum running
  *     offsets via a window over that TINY frame, then broadcast-join
  *     back; global prefix = offset + local prefix. The only
  *     stratum-partitioned window in the plan runs over the aggregate,
  *     not the data (StratifiedSelectSpec pins exactly that shape).
  *
  * The boundary array (nChunks-1 doubles) is collected to the driver once
  * and re-embedded as a literal — the k-means-centroid pattern
  * (Similarity.scala): a bounded, dimension-sized matrix, never data. It
  * also makes the chunk id bit-identical across every branch of the plan
  * (an in-plan sketch could legally re-evaluate per branch; row-level
  * arithmetic cannot drift).
  *
  * COST CAVEAT — the boundary sketch is a separate ACTION over `base`.
  * When `base` is a cheap table scan (every Scaled twin), that is one
  * extra columnar pass. When `base` is the tail of a deep pipeline, the
  * sketch re-executes the whole upstream chain OUTSIDE the main query's
  * DAG, forfeiting AQE exchange reuse — measured 4.3 s → 10 s when q99's
  * chained quartile/budget/packing stages were routed through here even
  * WITH the stage input persisted (its dedup prefix runs eagerly at
  * construction and re-runs per boundary action). For pipeline tails,
  * either materialize `base` to storage first or keep the per-stratum
  * window when the stratum input is already reduced.
  */
object StratifiedSelect {

  /** Adds to `base` (which must already carry `stratum`, `primary`, the
    * tie-break columns, and whatever the caller selects downstream):
    *
    *  - `cum_before`  — sum of `value` over all STRICTLY EARLIER rows of
    *    the same stratum, ordered by (`primary` asc/desc, tieBreak...);
    *  - `rn`          — the row's 1-based rank in that order (long);
    *  - `n_stratum`   — total row count of the stratum (long).
    *
    * Exactly equal to `sum(value).over(Window.partitionBy(stratum)
    * .orderBy(...).rowsBetween(unboundedPreceding, -1))`,
    * `row_number()`, and `count().over(partitionBy(stratum))` — the
    * per-stratum-window formulation — at any data size and any chunk
    * count (long arithmetic, no float drift). The full order
    * (primary, tieBreak...) must be a total order within a stratum
    * (tie-break on a unique id) or ties make both formulations
    * order-ambiguous. `value` must be non-null.
    *
    * Names `cum_before` / `rn` / `n_stratum` / `__pid` are reserved:
    * `base` must not already contain them.
    */
  def chunkedPrefix(base: DataFrame, stratum: String, primary: String,
                    desc: Boolean, tieBreak: Seq[Column], value: Column,
                    nChunks: Int): DataFrame = {
    require(nChunks >= 2, s"need >= 2 chunks, got $nChunks")
    val reserved = Seq("cum_before", "rn", "n_stratum", "__pid")
    reserved.foreach { r =>
      require(!base.columns.contains(r),
        s"input column '$r' collides with chunkedPrefix's reserved output")
    }
    require(nChunks <= 1024,
      s"$nChunks chunks would inline a $nChunks-term comparison chain " +
        "per row; size chunks to cluster cores, not data")
    val p = col(primary).cast("double")
    // one columnar pass for boundaries; a bounded (nChunks-1)-element
    // array reaches the driver, never data rows. Boundaries only BALANCE
    // partitions (correctness needs monotonicity only, see step 1 above),
    // so they come from a deterministic ~2% hash-sample of the primary at
    // modest sketch accuracy: sampling noise + rank error skew any chunk
    // by a few percent of its share, while the sketch update — the single
    // most expensive part of the ranking pass at fixture scale (~0.4 s of
    // q54's 1.5 s at accuracy 10000 over the full column) — drops 50x in
    // row count. Hash-of-value sampling is reproducible across runs and
    // engines-independent; a heavily-duplicated primary value skews the
    // sample but never the result. Empty sample (tiny input) falls back
    // to the full column — the balance guarantee must not silently
    // degrade to one chunk.
    val qs = (1 until nChunks).map(_.toDouble / nChunks)
    def sketch(src: DataFrame): Seq[Double] = Option(
      src.select(percentile_approx(p, array(qs.map(lit): _*), lit(20 * nChunks))
        .as("b")).head().getSeq[Double](0)).getOrElse(Seq.empty)
    val sampled = sketch(base.where(pmod(xxhash64(p), lit(50)) === 0))
    val bounds: Seq[Double] = if (sampled.nonEmpty) sampled else sketch(base)
    // chunk id: how many boundaries precede this value in stratum order —
    // monotone in (primary asc/desc) whatever the boundary values are.
    // Deliberately a flat codegen'd comparison chain, NOT
    // size(filter(boundsArray, b => cmp)): a lambda references `primary`
    // ONCE, so CollapseProject may inline an expensive upstream expression
    // (a quality-score HOF chain) into the lambda body, re-evaluating it
    // per boundary element — measured 13x slower on q72. The chain
    // references `primary` once per boundary, which also suppresses the
    // collapse outright (producers referenced more than once don't inline).
    val pidExpr =
      if (bounds.isEmpty) lit(0)
      else bounds.map { b =>
        (if (desc) when(lit(b) > p, 1) else when(lit(b) <= p, 1)).otherwise(0)
      }.reduce(_ + _)
    val withPid = base.withColumn("__pid", pidExpr)
    val ord = (if (desc) col(primary).desc else col(primary).asc) +: tieBreak
    val localW = Window.partitionBy(col("__pid"), col(stratum)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // value == lit(1): the prefix sum IS the rank minus one, so the
    // window needs only the count column and the offsets frame only the
    // count offsets — the common rank-only callers (q54/q79/q101 medians)
    // skip half the running-aggregate machinery.
    val unitValue = {
      import org.apache.spark.sql.GraftColumnBridge.expression
      expression(value).semanticEquals(expression(lit(1L))) ||
        expression(value).semanticEquals(expression(lit(1)))
    }
    // tiny per-(chunk, stratum) totals -> per-stratum running offsets.
    // chunk order in a window is __pid ASC for both directions: pid was
    // built order-aligned (desc primary => higher quality = lower pid)
    val countAgg = count(lit(1)).as("__pc")
    val tiny =
      if (unitValue) withPid.groupBy(col("__pid"), col(stratum)).agg(countAgg)
      else withPid.groupBy(col("__pid"), col(stratum))
        .agg(sum(value).as("__pv"), countAgg)
    val offW = Window.partitionBy(stratum).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val coff = coalesce(sum("__pc").over(offW), lit(0L)).as("__coff")
    val nStratum = sum("__pc").over(Window.partitionBy(stratum)).as("n_stratum")
    val offsets =
      if (unitValue) tiny.select(col("__pid"), col(stratum), coff, nStratum)
      else tiny.select(col("__pid"), col(stratum),
        coalesce(sum("__pv").over(offW), lit(0L)).as("__voff"), coff, nStratum)
    val localRanked =
      if (unitValue) withPid.withColumn("__cloc", count(lit(1)).over(localW))
      else withPid
        .withColumn("__vloc", coalesce(sum(value).over(localW), lit(0L)))
        .withColumn("__cloc", count(lit(1)).over(localW))
    localRanked
      .join(broadcast(offsets), Seq("__pid", stratum))
      .withColumn("rn", col("__coff") + col("__cloc") + lit(1L))
      .withColumn("cum_before",
        if (unitValue) col("rn") - lit(1L) else col("__voff") + col("__vloc"))
      .drop("__pid", "__pv", "__pc", "__voff", "__coff", "__vloc", "__cloc")
  }

  /** Exact per-stratum ORDER STATISTICS without ranking the table: returns
    * only the rows sitting at the requested ranks (plus `rn` and
    * `n_stratum`), touching one chunk-sized sort per target instead of a
    * full ranking pass. The median/quantile-band selectors (q54/q79/q101)
    * need 2-4 specific ranks per stratum — [[chunkedPrefix]] ranks EVERY
    * row to find them, which is the right tool when the ranks feed
    * downstream prefix logic but pure waste for point selection: at
    * 100 TB the full ranking shuffles the whole table where this shuffles
    * ~targets x chunk (a few million rows of a trillion).
    *
    * Algorithm:
    *  1. monotone chunk ids from the sampled boundary sketch (exactly
    *     [[chunkedPrefix]] step 1 — balance-only, correctness-free);
    *  2. per-(chunk, stratum) exact counts — a map-side-combined
    *     aggregate whose result is nChunks x strata rows, COLLECTED:
    *     this operator's one boundedness contract is dimension-sized
    *     strata (use chunkedPrefix when strata are data-sized);
    *  3. driver-side: per-stratum cumulative counts locate, for each
    *     target rank, its (chunk, local-rank) cell address — a bounded
    *     targets-sized table, re-embedded as a broadcast lookup;
    *  4. one pass over ONLY the addressed cells: row_number within
    *     (chunk, stratum) — partitions are chunk-bounded — equi-joined
    *     to the lookup on the local rank.
    *
    * `targets(n)` maps a stratum's row count to the 1-based ranks wanted
    * (out-of-range ranks are ignored). The full (primary, tieBreak...)
    * order must be total within a stratum, as in [[chunkedPrefix]].
    */
  def stratumRanks(base: DataFrame, stratum: String, primary: String,
                   desc: Boolean, tieBreak: Seq[Column],
                   targets: Long => Seq[Long], nChunks: Int): DataFrame = {
    require(nChunks >= 2 && nChunks <= 1024, s"bad chunk count $nChunks")
    val reserved = Seq("rn", "n_stratum", "__pid", "__lrn")
    reserved.foreach { r =>
      require(!base.columns.contains(r),
        s"input column '$r' collides with stratumRanks's reserved output")
    }
    // NULL/NaN primaries are excluded from the ranking (SQL engines
    // disagree on where they sort; every caller ranks non-null measures).
    // Excluding them HERE keeps the count pass and the cell pass
    // consistent — counting them into chunk 0 but filtering them out
    // later would shift every rank.
    val p0 = col(primary).cast("double")
    val base0 = base.schema(primary).dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType =>
        base.where(col(primary).isNotNull && !isnan(col(primary)))
      case _ => base.where(col(primary).isNotNull)
    }
    val p = p0
    val qs = (1 until nChunks).map(_.toDouble / nChunks)
    def sketch(src: DataFrame): Seq[Double] = Option(
      src.select(percentile_approx(p, array(qs.map(lit): _*), lit(20 * nChunks))
        .as("b")).head().getSeq[Double](0)).getOrElse(Seq.empty)
    val sampled = sketch(base0.where(pmod(xxhash64(p), lit(50)) === 0))
    val bounds: Seq[Double] = if (sampled.nonEmpty) sampled else sketch(base0)
    val pidExpr =
      if (bounds.isEmpty) lit(0)
      else bounds.map { b =>
        (if (desc) when(lit(b) > p, 1) else when(lit(b) <= p, 1)).otherwise(0)
      }.reduce(_ + _)
    val withPid = base0.withColumn("__pid", pidExpr)

    // (2) exact cell counts -> driver; bounded by the strata contract
    val cells = withPid.groupBy(col("__pid"), col(stratum))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getInt(0), r.get(1), r.getLong(2)))

    // (3) address each target rank: stratum -> sorted cells -> cumulative
    case class Addr(pid: Int, strat: Any, localRank: Long, rn: Long, n: Long)
    val addrs = cells.groupBy(_._2).toSeq.flatMap { case (strat, cs) =>
      val sorted = cs.sortBy(_._1)
      val n = sorted.map(_._3).sum
      val wanted = targets(n).filter(r => r >= 1 && r <= n).distinct.sorted
      var cum = 0L
      val it = sorted.iterator
      var cur = it.next()
      wanted.map { r =>
        while (r > cum + cur._3) { cum += cur._3; cur = it.next() }
        Addr(cur._1, strat, r - cum, r, n)
      }
    }
    if (addrs.isEmpty) {
      // no stratum had an in-range target: empty frame, full schema
      return withPid.filter(lit(false))
        .withColumn("rn", lit(0L)).withColumn("n_stratum", lit(0L))
        .drop("__pid")
    }

    // (4) sort only the addressed cells; equi-join local ranks to targets
    val strCol = base.schema(stratum).dataType
    val lookup = base.sparkSession.createDataFrame(
      base.sparkSession.sparkContext.parallelize(addrs.map(a =>
        org.apache.spark.sql.Row(a.pid, a.strat, a.localRank, a.rn, a.n)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField(stratum, strCol),
        org.apache.spark.sql.types.StructField("__lrn", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rn", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_stratum", org.apache.spark.sql.types.LongType))))
    // Cell filter as RANGES ON THE RAW PRIMARY, never on __pid: chunk k
    // is by construction the primary-interval between two boundary
    // values, so the filter is a handful of comparisons the parquet scan
    // can push — whereas a predicate on __pid gets the whole
    // boundary-comparison chain substituted into EVERY disjunct when the
    // filter pushes below the defining Project (measured 5.8 s vs 0.9 s
    // for q54's 12-cell selection at sf0.1). Consecutive selected chunks
    // merge into one interval per run.
    def chunkInterval(k: Int): (Option[Double], Option[Double]) = {
      val m = bounds.length
      if (m == 0) (None, None)
      else if (!desc) // pid = #{b <= p}: p in [b(k-1), b(k))
        (if (k > 0) Some(bounds(k - 1)) else None,
         if (k < m) Some(bounds(k)) else None)
      else // pid = #{b > p}: p in [b(m-k-1), b(m-k))
        (if (k < m) Some(bounds(m - k - 1)) else None,
         if (k > 0) Some(bounds(m - k)) else None)
    }
    val cellPred = addrs.groupBy(_.strat).map { case (s, as) =>
      val runs = as.map(_.pid).distinct.sorted
        .foldLeft(Vector.empty[(Int, Int)]) {
          case (acc :+ ((lo, hi)), k) if k == hi + 1 => acc :+ (lo, k)
          case (acc, k) => acc :+ (k, k)
        }
      val rangePred = runs.map { case (kLo, kHi) =>
        // the run covers pids kLo..kHi — one primary interval
        val (lo, hi) =
          if (!desc) (chunkInterval(kLo)._1, chunkInterval(kHi)._2)
          else (chunkInterval(kHi)._1, chunkInterval(kLo)._2)
        (lo, hi) match {
          case (Some(a), Some(b)) => p >= a && p < b
          case (Some(a), None) => p >= a
          case (None, Some(b)) => p < b
          case (None, None) => lit(true)
        }
      }.reduce(_ || _)
      // <=> not ===: a NULL-valued stratum is a legal group (the count
      // pass already addressed its targets), and plain equality would
      // silently drop every row of it here and again at the join below
      // — a rows-vanish bug chunkedPrefix does not have (round-11
      // advice). lit(null) <=> col is Catalyst's EqualNullSafe.
      (col(stratum) <=> lit(s)) && rangePred
    }.reduce(_ || _)
    val ord = (if (desc) col(primary).desc else col(primary).asc) +: tieBreak
    val w = Window.partitionBy(col("__pid"), col(stratum)).orderBy(ord: _*)
    // null-safe join on the stratum for the same reason; the key columns
    // are renamed on the lookup side so the condition can name both.
    val lk = lookup.withColumnRenamed("__pid", "__kpid")
      .withColumnRenamed(stratum, "__kstrat")
      .withColumnRenamed("__lrn", "__klrn")
    withPid.filter(cellPred)
      .withColumn("__lrn", row_number().over(w).cast("long"))
      .join(broadcast(lk),
        col("__pid") === col("__kpid") &&
          (col(stratum) <=> col("__kstrat")) &&
          col("__lrn") === col("__klrn"))
      .drop("__pid", "__lrn", "__kpid", "__kstrat", "__klrn")
  }
}
