package graft.sources

import java.nio.file.Files

/** S10 CRUD cycle over a temp directory through the Hadoop FileSystem API —
  * the same code path an object-store URI would take.
  */
class BlobStoreSpec extends graft.SparkSpecBase {

  private lazy val baseDir = Files.createTempDirectory("blobstore").toString
  private lazy val store = new BlobStore(s"file://$baseDir", spark)

  test("container create / blob upload / list / download / delete cycle") {
    store.accessContainer("raw")
    assert(store.listBlobs("raw").isEmpty)

    store.uploadBlobText("raw", "a.txt", "hello blob")
    store.uploadBlob("raw", "b.bin", Array[Byte](1, 2, 3))
    assert(store.listBlobs("raw") == Seq("a.txt", "b.bin"))

    assert(new String(store.downloadBlob("raw", "a.txt"), "UTF-8") == "hello blob")
    assert(store.downloadBlob("raw", "b.bin").toSeq == Seq[Byte](1, 2, 3))

    assert(store.deleteBlob("raw", "a.txt"))
    assert(!store.blobExists("raw", "a.txt"))
    assert(store.listBlobs("raw") == Seq("b.bin"))

    assert(store.deleteContainer("raw"))
    assert(store.listBlobs("raw").isEmpty)
  }

  test("upload from / download to local files round-trips") {
    val src = Files.createTempFile("blob-src", ".csv")
    Files.writeString(src, "X;Y\n1;2\n")
    store.uploadBlobFromFile("files", "data.csv", src.toString)
    assert(store.blobExists("files", "data.csv"))

    val dst = Files.createTempDirectory("blob-dst").resolve("out.csv")
    store.downloadBlobToFile("files", "data.csv", dst.toString)
    assert(Files.readString(dst) == "X;Y\n1;2\n")
  }

  test("downloadBlob fails fast past the maxBytes cap, before buffering") {
    store.uploadBlobText("caps", "big.txt", "x" * 1024)
    val e = intercept[IllegalArgumentException] {
      store.downloadBlob("caps", "big.txt", maxBytes = 100)
    }
    assert(e.getMessage.contains("driver-download cap"))
    // at or under the cap still reads fine
    assert(store.downloadBlob("caps", "big.txt", maxBytes = 1024).length == 1024)
  }

  test("csv blob reads back as a DataFrame through CsvSource") {
    store.uploadBlobText("csv", "t.csv", "A;B\n1;x\n2;y\n")
    val df = store.readCsv(spark, "csv", "t.csv", sep = ";")
    assert(df.columns.toSeq == Seq("A", "B"))
    assert(df.count() == 2)
  }
}
