package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Container/blob CRUD over the Hadoop FileSystem API (SURVEY.md §2.1 S10;
  * ref utils/datsetup.py:35-96 — access/delete container, upload blob from
  * a local file or inline text, list, download, delete, read-CSV-as-frame).
  *
  * A "container" is a directory under `baseUri`, a "blob" a file inside it.
  * Everything goes through `Path.getFileSystem`, so the SAME calls run
  * against file://, hdfs://, s3a://, or abfs:// — the Spark-native shape of
  * the reference's BlobServiceClient: at 100 TB the store is an object
  * store and the executors stream blob bytes directly (readCsv below),
  * never through this driver-side helper.
  */
final class BlobStore(baseUri: String, conf: Configuration) {

  def this(baseUri: String, spark: SparkSession) =
    this(baseUri, spark.sessionState.newHadoopConf())

  private val base = new Path(baseUri)
  private val fs: FileSystem = base.getFileSystem(conf)

  private def containerPath(container: String) = new Path(base, container)
  private def blobPath(container: String, blob: String) =
    new Path(containerPath(container), blob)

  /** Create-if-absent and return the container path (ref access_container). */
  def accessContainer(container: String): Path = {
    val p = containerPath(container)
    fs.mkdirs(p) // no-op when it already exists
    p
  }

  /** Drop the container and everything in it (ref delete_container). */
  def deleteContainer(container: String): Boolean =
    fs.delete(containerPath(container), true)

  /** Upload inline bytes as a blob (ref upload_blob's blob_data branch). */
  def uploadBlob(container: String, blob: String, data: Array[Byte]): Unit = {
    accessContainer(container)
    val out = fs.create(blobPath(container, blob), true)
    try out.write(data) finally out.close()
  }

  def uploadBlobText(container: String, blob: String, text: String): Unit =
    uploadBlob(container, blob, text.getBytes(StandardCharsets.UTF_8))

  /** Upload a local file as a blob (ref upload_blob's file branch). */
  def uploadBlobFromFile(container: String, blob: String, localFile: String): Unit = {
    accessContainer(container)
    fs.copyFromLocalFile(false, true, new Path(localFile), blobPath(container, blob))
  }

  /** Blob names in the container, sorted (ref list_blobs). */
  def listBlobs(container: String): Seq[String] = {
    val p = containerPath(container)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath.getName).toSeq.sorted
  }

  /** Download a blob's bytes (ref download_blob's readall). Driver-sized
    * payloads only — distributed reads go through readCsv/spark.read. The
    * size contract is enforced, not advisory: the file length is checked
    * BEFORE buffering so an unexpectedly large blob fails fast instead of
    * OOMing the driver mid-read (default cap 256 MiB).
    */
  def downloadBlob(container: String, blob: String,
                   maxBytes: Long = 256L * 1024 * 1024): Array[Byte] = {
    val p = blobPath(container, blob)
    val len = fs.getFileStatus(p).getLen
    // the JVM array ceiling is the hard bound even if a caller raises
    // maxBytes past it — without this, len.toInt below would wrap
    require(len <= maxBytes && len <= Int.MaxValue - 8,
      s"blob $container/$blob is $len bytes, over the driver-download cap " +
        s"${math.min(maxBytes, Int.MaxValue - 8)}; use readCsv/spark.read " +
        "for a distributed read or raise maxBytes")
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream(len.toInt.max(64))
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  def downloadBlobToFile(container: String, blob: String, localFile: String): Unit =
    fs.copyToLocalFile(false, blobPath(container, blob), new Path(localFile), true)

  def deleteBlob(container: String, blob: String): Boolean =
    fs.delete(blobPath(container, blob), false)

  def blobExists(container: String, blob: String): Boolean =
    fs.exists(blobPath(container, blob))

  /** Read a CSV blob as a DataFrame (ref access_blob_csv) — the kwargs
    * surface maps onto CsvSource's options; the read itself is Spark's
    * distributed CSV scan straight off the store, not a driver download.
    */
  def readCsv(spark: SparkSession, container: String, blob: String,
              sep: String = ",", headerLine: Int = 0,
              headerMode: HeaderMode = HeaderMode.Trim): DataFrame =
    CsvSource(blobPath(container, blob).toString, sep, headerLine, headerMode)
      .read(spark)
}
