package graft.sources

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Crash-consistent EPOCH ledger for the persisted index families (BM25,
  * IVF, gram, bigram-stats, exact/minhash rolling admission) — the
  * Upsert.completeVersions `_SUCCESS` convention extended to
  * MULTI-TABLE bucketed-append lifecycles (round-15 verdict ask #3).
  *
  * The hazard: an admission appends into two or three tables in sequence
  * (postings, doc-lengths, stats; result + index), and a crash between
  * the writes leaves a PROBE-VISIBLE inconsistent index — e.g. BM25
  * postings that their stats row doesn't count, or admitted result rows
  * whose fingerprints never reached the screen.
  *
  * The protocol (classic write-ahead commit, all public-knowledge):
  *  - every appended row carries the admission's `epoch` (a bigint
  *    column on each table);
  *  - [[begin]] allocates the next epoch by CREATING marker directory
  *    `<warehouse>/<base>_commits/v<epoch>` (no `_SUCCESS` yet) — the
  *    allocation record survives a crash, so a retry can never reuse a
  *    dead epoch and merge orphan rows into live data;
  *  - the lifecycle appends its tables, tagging rows with the epoch;
  *  - [[commit]] drops `_SUCCESS` into the marker dir LAST — the single
  *    atomic-enough point (one small file create) that flips the whole
  *    multi-table admission visible;
  *  - probes read through [[committedFilter]]: rows whose epoch carries
  *    no `_SUCCESS` are invisible, so a reader sees the pre-append state
  *    or the fully-admitted state, NEVER between (the kill-point specs
  *    pin each lifecycle's windows).
  *
  * Orphan rows from a crashed epoch stay in the table files but are
  * filtered by every probe; compaction routines that fold rows rewrite
  * committed epochs only, garbage-collecting orphans as a side effect.
  * The committed-epoch list is one driver-side directory listing
  * (O(#admissions) names + one marker probe each — the same cost
  * Upsert.completeVersions pays), read at PLAN time.
  */
object IndexCommits {

  /** The epoch column every gated index table carries. */
  val EpochCol = "epoch"

  private def dirPath(s: SparkSession, base: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), s"${base}_commits")

  private def fsOf(s: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** DECOMMIT the ledger — the fresh-BUILD reset (the build overwrites
    * the tables, so previously-committed epochs must stop resolving).
    * Removes every epoch's `_SUCCESS` but KEEPS the marker dirs: they
    * are the allocation high-water mark the no-epoch-reuse guarantee
    * depends on. Deleting them would let a rebuild that crashes
    * MID-OVERWRITE (table A rewritten, table B still holding the old
    * lifecycle's epoch-k rows) hand epoch k to a later append — whose
    * commit would flip the dead lifecycle's stale rows visible alongside
    * the new batch (round-16 review catch). With the dirs kept, every
    * later begin() allocates above ALL epochs that ever existed, so
    * stale rows can never match a newly-committed epoch.
    */
  def reset(s: SparkSession, base: String): Unit = {
    val dir = dirPath(s, base)
    val fs = fsOf(s, dir)
    if (fs.exists(dir))
      fs.listStatus(dir).foreach { st =>
        val m = new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")
        if (fs.exists(m)) fs.delete(m, false)
      }
  }

  /** Allocate the next epoch: max over ALL marker dirs — committed or
    * crashed — plus one, recorded as a new (uncommitted) marker dir.
    */
  def begin(s: SparkSession, base: String): Long = {
    val dir = dirPath(s, base)
    val fs = fsOf(s, dir)
    val existing =
      if (!fs.exists(dir)) Seq.empty[Long]
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .collect { case nm if nm.matches("v\\d+") => nm.drop(1).toLong }
    val e = if (existing.isEmpty) 0L else existing.max + 1
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, s"v$e"))
    e
  }

  /** Flip epoch `e` visible: one `_SUCCESS` create, the commit point. */
  def commit(s: SparkSession, base: String, e: Long): Unit = {
    val dir = dirPath(s, base)
    fsOf(s, dir).create(
      new org.apache.hadoop.fs.Path(dir, s"v$e/_SUCCESS"), true).close()
  }

  /** Committed epochs, sorted — driver-side listing only. */
  def committed(s: SparkSession, base: String): Seq[Long] = {
    val dir = dirPath(s, base)
    val fs = fsOf(s, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case nm if nm.matches("v\\d+") => nm.drop(1).toLong }
      .filter(e => fs.exists(
        new org.apache.hadoop.fs.Path(dir, s"v$e/_SUCCESS")))
      .sorted
  }

  /** The probe-side visibility predicate over the `epoch` column. An
    * index with NO committed epoch reads as empty, loudly distinguishable
    * from crashed-mid-build garbage.
    */
  def committedFilter(s: SparkSession, base: String): Column = {
    val eps = committed(s, base)
    if (eps.isEmpty) lit(false) else col(EpochCol).isin(eps: _*)
  }
}
