package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for corpus curation — the "data
  * mixture" step of a training pipeline: downsample over-represented
  * strata (language/source/quality band) by fixed per-stratum rates.
  *
  * Sampling decisions are a pure function of the row's id: bucket =
  * first 16 bits of md5(id) mod 100 — identical on every engine that
  * agrees on md5 (Spark and the DuckDB oracle do), stable across runs,
  * partitionings, and cluster sizes, and independent per id (md5 mixes
  * fully, unlike `id % 100` which aliases any systematic id stride).
  * Map-only: no shuffle, no RNG state, nothing on the driver.
  */
object Sampling {

  /** Bucket in [0, 100) from the row id — the shared kernel. NULL ids get
    * a defined bucket (md5 of the empty string) instead of a NULL
    * predicate that would silently drop them at every rate including 100.
    */
  def hashBucket(id: Column): Column =
    (conv(substring(md5(coalesce(id.cast("string"), lit(""))), 1, 4), 16, 10)
      .cast("int") % 100).as("bucket")

  /** Keep ~pct% of rows, deterministically by id. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol)) < pct)

  /** Per-stratum keep rates (percent), e.g. Map("en" -> 100, "de" -> 50);
    * strata absent from the map keep `defaultPct`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < rate)
  }

  /** Parts-per-million bucket in [0, 1e6): first 32 md5 bits mod 1e6 —
    * the fine-grained twin of [[hashBucket]] for sub-percent keep rates.
    * 2^32 mod 1e6 = 967296, so the low buckets appear 4295 times in the
    * hash range vs 4294 for the rest: ≤ 0.024 % selection bias, three
    * orders below the sampling noise it steers. Same null contract as
    * hashBucket.
    */
  def ppmBucket(id: Column): Column =
    conv(substring(md5(coalesce(id.cast("string"), lit(""))), 1, 8), 16, 10)
      .cast("long") % 1000000L

  /** Exactly-k deterministic sample per stratum: rank rows by the salted
    * md5 of their id (a reproducible uniform-ish priority) and keep each
    * stratum's k smallest through the bounded heap aggregate
    * (functions.BoundedTopK) — the per-stratum ROW_NUMBER shape without
    * the window's whole-stratum single-task sort, so stratum size is
    * unbounded. Unlike [[hashSample]]'s ~pct% filter this yields EXACTLY
    * min(k, |stratum|) rows; reruns, engines, and partitionings all agree
    * on the selection (q120's oracle re-derives it in SQL).
    */
  def uniformKPerStratum(df: DataFrame, idCol: String, stratumCol: String,
                         k: Int, seed: String): DataFrame =
    df.select(col(stratumCol), col(idCol),
        md5(concat(lit(s"$seed:"), col(idCol).cast("string"))).as("h"))
      .groupBy(stratumCol)
      .agg(graft.functions.BoundedTopK.topK(
        struct(col("h"), col(idCol)), k, desc = Seq(false, false)).as("top"))
      .select(col(stratumCol), posexplode(col("top")))
      .select(col(stratumCol), (col("pos") + 1).cast("int").as("rk"),
        col(s"col.$idCol"), col("col.h"))

  /** Downsample each stratum toward a target mixture: keep a row iff its
    * ppm bucket falls under the stratum's weight (1e6 ppm = keep all).
    * `weights` is a (stratumCol, weight_ppm) frame — dimension-sized, so
    * it broadcasts; weights above 1e6 (under-represented strata, which
    * filtering cannot upsample) simply keep everything. Rows whose stratum
    * has no weight row are dropped — an inner join, because a stratum
    * missing from a mixture config is a config bug better surfaced as
    * missing data in the output counts than silently passed through.
    */
  def resampleToMixture(df: DataFrame, idCol: String, stratumCol: String,
                        weights: DataFrame): DataFrame =
    df.join(broadcast(weights), stratumCol)
      .filter(ppmBucket(col(idCol)) < col("weight_ppm"))
      .drop("weight_ppm")

  /** Dedup-aware train/val/test split: the split key is the DUPLICATE
    * CLUSTER's fingerprint, not the row id, so every copy of a document
    * lands in the same split — the leakage a row-keyed split quietly
    * commits (a test doc whose duplicate sits in train is a leaked
    * answer). `clusterKey` is any cluster-constant column: md5(text) for
    * exact-dup clusters (map-only, used by q132); q239 swaps in the resolved CC
    * label (Dedup.connectedComponents) for near-dup-safe splits — the
    * assignment algebra is identical. Deterministic md5 bucketing, same
    * engine-agreement contract as [[hashBucket]]; map-only, no shuffle.
    */
  def splitAssign(clusterKey: Column,
                  trainPct: Int = 90, valPct: Int = 5): Column = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val b = (conv(substring(md5(concat(lit("split:"),
        coalesce(clusterKey.cast("string"), lit("")))), 1, 4), 16, 10)
      .cast("int") % 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Probability-proportional-to-size systematic sampling (classic survey
    * sampling): exactly k picks per stratum, a row's pick count
    * proportional to its weight, in PURE INTEGER arithmetic — no RNG, no
    * floating point, no u^(1/w) priority whose pow/ln would be at the
    * mercy of cross-engine libm rounding. Rows are laid on the stratum's
    * cumulative-weight axis in id order; the k thresholds m·T/k
    * (m = 0..k-1, T = stratum weight total) each select the row whose
    * [cum_before, cum_before+w) interval covers them:
    *   n_hits = ⌊(cum_before + w)·k / T⌋ − ⌊cum_before·k / T⌋,
    * so Σ n_hits = k exactly and a row wider than T/k is honestly picked
    * more than once (n_hits is in the output, never collapsed).
    *
    * Scale shape: the cumulative sums come from
    * [[StratifiedSelect.chunkedPrefix]] — per-(chunk, stratum) windows
    * only, never a whole-stratum sort task — plus one broadcast of the
    * dimension-sized per-stratum totals. Headroom: cum·k must fit a
    * BIGINT, i.e. stratum_tokens × k < 9.2e18 — 1e15 tokens at k=1000
    * still clears it.
    */
  def ppsSystematic(df: DataFrame, stratumCol: String, idCol: String,
                    weight: Column, k: Int, nChunks: Int = 16): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = df.withColumn("__w",
      coalesce(weight.cast("long"), lit(0L)))
    val pref = StratifiedSelect.chunkedPrefix(base, stratumCol, idCol,
      desc = false, tieBreak = Seq.empty, value = col("__w"), nChunks)
    val totals = base.groupBy(stratumCol).agg(sum("__w").as("__T"))
    pref.join(broadcast(totals), Seq(stratumCol))
      .filter(col("__T") > 0)
      .withColumn("n_hits",
        expr(s"((cum_before + __w) * $k) DIV __T - (cum_before * $k) DIV __T"))
      .filter(col("n_hits") >= 1)
      .drop("rn", "n_stratum", "__T")
      .withColumnRenamed("__w", "weight")
  }

  /** Weighted WITHOUT-replacement sampling — the Efraimidis–Spirakis
    * exponential-sort / A-ES reservoir (IPL 2006): each row gets priority
    * `-ln(u) / w` with u uniform in (0, 1]; the k smallest priorities per
    * stratum are EXACTLY a weight-proportional without-replacement draw
    * ("pick w-proportionally, remove, repeat k times"). The missing third
    * of the sampling family: [[hashSample]] is uniform-rate,
    * [[ppsSystematic]] is with-replacement (n_hits multi-counts wide
    * rows); this one never picks a row twice and favors heavy rows.
    *
    * u is the md5 device, not an RNG: the first 13 md5 hex digits of
    * `seed:id` are a 52-bit integer m, u = (m+1)/2^52 ∈ (0,1] —
    * deterministic, engine-agreed (md5 + IEEE divide + ln; q220's oracle
    * replays the formula verbatim in DuckDB). A cross-libm 1-ulp ln gap
    * could in principle flip the k-th/k+1-th selection, but that needs
    * two priorities within ~1 ulp of EACH OTHER at the boundary —
    * distinct md5-derived u's make that ~2^-40 per stratum; the fixture
    * gate has three SFs of evidence.
    *
    * Shape at 100 TB: map-only priority + one bounded-heap aggregate
    * ([[graft.functions.BoundedTopK]], O(k) state per stratum per
    * partition, map-side combined) — the q120 pattern; no window, no
    * whole-stratum sort, nothing driver-side. Rows with NULL, NaN, or
    * non-positive weight cannot be drawn (P ∝ w ≤ 0) and are filtered —
    * NaN explicitly, because in Spark SQL NaN compares GREATER than any
    * numeric, so `w > 0.0` alone would admit a NaN weight whose NaN
    * priority could be drawn when a stratum has fewer than k
    * positive-weight rows.
    * Returns (stratum, rk, id, weight): rk is the draw order (1 = first
    * pick, the A-ES ↔ sequential-draw correspondence).
    */
  def weightedKPerStratum(df: DataFrame, idCol: String, stratumCol: String,
                          weight: Column, k: Int, seed: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val m = conv(substring(md5(concat(lit(s"$seed:"),
      col(idCol).cast("string"))), 1, 13), 16, 10).cast("long")
    val u = (m + lit(1L)).cast("double") / lit(4503599627370496.0) // 2^52
    val w = weight.cast("double")
    df.filter(w.isNotNull && !isnan(w) && w > 0.0)
      .select(col(stratumCol), col(idCol), w.as("weight"),
        (-log(u) / w).as("__pri"))
      .groupBy(stratumCol)
      .agg(graft.functions.BoundedTopK.topK(
        struct(col("__pri"), col(idCol), col("weight")), k,
        desc = Seq(false, false, false)).as("top"))
      .select(col(stratumCol), posexplode(col("top")))
      .select(col(stratumCol), (col("pos") + 1).cast("int").as("rk"),
        col(s"col.$idCol"), col("col.weight"))
  }

  /** Repetition-based UPsampling to a target mixture — the half of mixture
    * application [[resampleToMixture]] cannot do: a stratum with
    * weight_ppm > 1e6 must appear weight/1e6 times per epoch of the
    * corpus. Each row emits `weight_ppm DIV 1e6` full copies plus one
    * more iff its ppm bucket falls under `weight_ppm % 1e6` — so expected
    * copies = weight_ppm/1e6 exactly, per-row deterministic, and a
    * weight ≤ 1e6 degenerates to resampleToMixture's keep rule with
    * every survivor at epoch 0. The `epoch` column (0-based copy index)
    * is what a downstream shuffler salts on so repeated copies don't
    * co-locate.
    *
    * Shape at 100 TB: broadcast weights join + explode(sequence) of an
    * INTEGER range — map-only, output exactly sized to the mixture, no
    * shuffle, no RNG. The explode multiplies ROWS, not bytes-per-row,
    * and never exceeds ceil(max weight) copies; same inner-join
    * missing-stratum contract as resampleToMixture.
    */
  def upsampleToMixture(df: DataFrame, idCol: String, stratumCol: String,
                        weights: DataFrame): DataFrame =
    df.join(broadcast(weights), stratumCol)
      .withColumn("__copies",
        expr("weight_ppm DIV 1000000") +
          when(ppmBucket(col(idCol)) < expr("weight_ppm % 1000000"), 1L)
            .otherwise(0L))
      .filter(col("__copies") > 0L)
      .withColumn("epoch", explode(sequence(lit(0L), col("__copies") - 1L)))
      .drop("weight_ppm", "__copies")
}
