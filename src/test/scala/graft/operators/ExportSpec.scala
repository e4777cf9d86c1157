package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Gates the physical export path (Export.writeShards) against the
  * declared-manifest semantics (Exports.q135, hash-gated by the oracle):
  * the files on disk must agree with the manifest frame in shard
  * membership, per-shard counts/sums, intra-file ordering, and file
  * count — and a re-export must be byte-deterministic.
  */
class ExportSpec extends SparkSpecBase {

  private def docs = Tables.documents(spark, Sf0001)
    .filter(col("text").isNotNull)
    .select("doc_id", "source", "text")

  test("shardOf is uniform-ish, in-range, and deterministic") {
    val n = 16
    val assigned = Export.assignShards(docs, "doc_id", n)
    val byShard = assigned.groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byShard.keys.forall(s => s >= 0 && s < n), "shard out of range")
    val total = byShard.values.sum
    // Uniformity: no shard beyond 3x the fair share on the tiny fixture.
    assert(byShard.values.max <= 3 * math.max(1L, total / n),
      s"skewed shards: $byShard")
    val again = Export.assignShards(docs, "doc_id", n)
      .groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again === byShard, "shard assignment must be deterministic")
  }

  test("writeShards writes one sorted file per shard, matching the manifest") {
    val n = 8
    val assigned = Export.assignShards(docs, "doc_id", n)
    val man = Export.manifest(assigned).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

    val out = java.nio.file.Files.createTempDirectory("graft-export").toString
    try {
      Export.writeShards(assigned, out, n)

      // Directory layout: one shard=N dir per non-empty shard, ONE data
      // file inside each (the one-task-per-shard contract).
      val shardDirs = new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      assert(shardDirs.map(_.getName).sorted.toSeq ===
        man.keys.toSeq.sorted.map(s => s"shard=$s"),
        "shard directories must match manifest shards")
      shardDirs.foreach { d =>
        val dataFiles = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(dataFiles.length === 1,
          s"${d.getName}: expected exactly one file, got ${dataFiles.length}")
      }

      // Read-back parity: per-shard counts and token sums equal the
      // manifest, and every file is internally ordered by shuffle_key.
      val back = spark.read.parquet(out)
      val backMan = back
        .select(col("shard"), col("shuffle_key"),
          graft.functions.TextFunctions.tokenCount(col("text"))
            .cast("long").as("t"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n"), sum("t").as("ts"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(backMan === man, "files on disk must reproduce the manifest")

      shardDirs.foreach { d =>
        val keys = spark.read.parquet(d.toString)
          .select("shuffle_key").collect().map(_.getString(0)).toSeq
        assert(keys === keys.sorted,
          s"${d.getName}: file not ordered by shuffle_key")
      }

      // Determinism: a second export yields byte-identical shard files.
      val out2 = java.nio.file.Files.createTempDirectory("graft-export2").toString
      try {
        Export.writeShards(assigned, out2, n)
        def digest(dir: String): Map[String, String] =
          new java.io.File(dir).listFiles()
            .filter(f => f.isDirectory && f.getName.startsWith("shard="))
            .map { d =>
              val f = d.listFiles().filter(_.getName.endsWith(".parquet")).head
              val bytes = java.nio.file.Files.readAllBytes(f.toPath)
              val md = java.security.MessageDigest.getInstance("MD5")
              d.getName -> md.digest(bytes).map("%02x".format(_)).mkString
            }.toMap
        assert(digest(out2) === digest(out),
          "re-export must be byte-identical (deterministic global shuffle)")
      } finally deleteRec(new java.io.File(out2))
    } finally deleteRec(new java.io.File(out))
  }

  test("manifestStream over 3 microbatches equals the one-shot batch manifest") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val n = 8
    val rows = docs.collect().map(r =>
      ExportDoc(r.getLong(0), r.getString(1), r.getString(2)))
    // include a null-text row: manifestStream must drop it like manifest's
    // callers do (q135's isNotNull fence)
    val withNull = rows :+ ExportDoc(999999999L, rows.head.source, null)
    val batches = withNull.groupBy(d => (d.doc_id % 3).toInt)

    val dir = java.nio.file.Files.createTempDirectory("graft-manstream").toString
    val input = MemoryStream[ExportDoc]
    val q = Export.manifestStream(input.toDF(), "doc_id", n,
      s"$dir/state", s"$dir/_chk")
    try {
      (0 to 2).foreach { i =>
        input.addData(batches(i): _*); q.processAllAvailable()
      }
    } finally q.stop()

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6),
        r.getString(7))).toSet
    val streamed = canon(Export.manifestFromPartials(
      Upsert.latestSnapshot(spark, s"$dir/state")))
    val oneShot = canon(Export.manifest(Export.assignShards(docs, "doc_id", n)))
    assert(streamed === oneShot,
      "incrementally merged manifest must equal the batch manifest")

    // Replay idempotence: re-delivering the LAST micro-batch under its own
    // id (the foreachBatch at-least-once case) must overwrite, not
    // double-count.
    Export.mergeBatchIntoState(batches(2).toSeq.toDF("doc_id", "source", "text"),
      batchId = 2L, "doc_id", n, s"$dir/state", "text")
    val replayed = canon(Export.manifestFromPartials(
      Upsert.latestSnapshot(spark, s"$dir/state")))
    assert(replayed === oneShot, "batch replay must be idempotent")
    deleteRec(new java.io.File(dir))
  }

  test("manifest counts NULL-source docs but not a NULL 'source'") {
    import spark.implicits._
    val df = Seq((1L, "s1", "hello world"), (2L, null.asInstanceOf[String], "foo bar"),
      (3L, "s2", "baz qux")).toDF("doc_id", "source", "text")
    val m = Export.manifest(Export.assignShards(df, "doc_id", 1)).collect()
    assert(m.length === 1)
    assert(m.head.getAs[Long]("n_docs") === 3L, "null-source doc still a doc")
    assert(m.head.getAs[Long]("n_sources") === 2L,
      "COUNT(DISTINCT source) skips nulls on both engines; the partials " +
        "rollup must too")
  }

  test("mergePartials is order-insensitive (commutative merge)") {
    val n = 8
    val assigned = Export.assignShards(docs, "doc_id", n)
    val pa = Export.partialManifest(assigned.filter(col("doc_id") % 2 === 0))
    val pb = Export.partialManifest(assigned.filter(col("doc_id") % 2 =!= 0))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(canon(Export.mergePartials(pa, pb)) ===
      canon(Export.mergePartials(pb, pa)))
    assert(canon(Export.manifestFromPartials(Export.mergePartials(pa, pb))) ===
      canon(Export.manifest(assigned)))
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete(); ()
  }
}

/** MemoryStream row type for the manifestStream spec. */
final case class ExportDoc(doc_id: Long, source: String, text: String)
