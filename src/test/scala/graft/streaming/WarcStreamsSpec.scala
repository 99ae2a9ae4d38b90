package graft.streaming

import graft.io.WarcIO
import graft.sql.SparkTestBase

/** Streaming WARC ingest: file-per-archive micro-batches, exactly-once
  * per archive across checkpointed restarts, late-landing archives picked
  * up incrementally — the crawl-tailing contract. */
class WarcStreamsSpec extends SparkTestBase {

  private def writeArchive(dir: java.io.File, name: String, ids: Range): Unit =
    WarcIO.writeLocal(ids.map(i =>
      ("response", s"<urn:s:$i>", s"https://example.org/d/$i",
        "2024-03-01T12:00:00Z", "application/http; msgtype=response",
        s"body $i".getBytes("UTF-8"))).iterator,
      new java.io.File(dir, name))

  test("availableNow drains the drop dir; restart is exactly-once; late archives append") {
    val root = java.nio.file.Files.createTempDirectory("warcstream").toFile
    val drop = new java.io.File(root, "drop"); drop.mkdirs()
    val out = new java.io.File(root, "out").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath

    writeArchive(drop, "a.warc.gz", 0 until 4)
    writeArchive(drop, "b.warc.gz", 10 until 13)
    WarcStreams.ingestAvailableNow(spark, drop.getAbsolutePath, out, ckpt)
      .awaitTermination()
    val first = spark.read.parquet(out)
    assert(first.count() == 7)
    assert(first.select("url").collect().map(_.getString(0)).toSet ==
      ((0 until 4) ++ (10 until 13)).map(i => s"https://example.org/d/$i").toSet)
    // epoch parsed from the WARC-Date header
    assert(first.select("warc_epoch").collect()
      .forall(_.getLong(0) == 1709294400L))

    // restart on the same checkpoint with NO new input: nothing re-ingested
    WarcStreams.ingestAvailableNow(spark, drop.getAbsolutePath, out, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(out).count() == 7, "replay must be exactly-once")

    // a late-landing archive flows — and ONLY it
    writeArchive(drop, "c.warc.gz", 20 until 22)
    WarcStreams.ingestAvailableNow(spark, drop.getAbsolutePath, out, ckpt)
      .awaitTermination()
    val all = spark.read.parquet(out)
    assert(all.count() == 9)
    val urls = all.select("url").collect().map(_.getString(0))
    assert(urls.length == urls.distinct.length, "no archive ingested twice")
  }

  test("streaming ingest never materializes archive bytes through binaryFile (content pruned)") {
    // Cap binaryFile's content materialization at 64 bytes: any path that
    // still read the `content` column would throw SparkException("exceeds
    // the max length allowed") on these multi-KB archives. The ledger-only
    // use (path column) must be immune, because each task re-opens the
    // archive and parses off the stream.
    val root = java.nio.file.Files.createTempDirectory("warcprune").toFile
    val drop = new java.io.File(root, "drop"); drop.mkdirs()
    writeArchive(drop, "a.warc.gz", 0 until 50)
    assert(drop.listFiles().head.length() > 64)
    val key = "spark.sql.sources.binaryFile.maxLength"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, 64L)
    try {
      WarcStreams.ingestAvailableNow(spark, drop.getAbsolutePath,
        new java.io.File(root, "out").getAbsolutePath,
        new java.io.File(root, "ckpt").getAbsolutePath).awaitTermination()
      assert(spark.read.parquet(
        new java.io.File(root, "out").getAbsolutePath).count() == 50)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("a malformed archive fails the micro-batch loudly, never silently skips") {
    val root = java.nio.file.Files.createTempDirectory("warcbad").toFile
    val drop = new java.io.File(root, "drop"); drop.mkdirs()
    writeArchive(drop, "good.warc.gz", 0 until 2)
    // a truncated record written as a plain (non-gz) .warc: headers
    // promise 64 payload bytes, the file ends early
    val cut = WarcIO.recordBytes("response", "<urn:bad:0>", "u", "d", "ct",
      Array.fill[Byte](64)(7)).dropRight(30)
    java.nio.file.Files.write(
      new java.io.File(drop, "bad.warc").toPath, cut)
    val q = WarcStreams.ingestAvailableNow(spark, drop.getAbsolutePath,
      new java.io.File(root, "out").getAbsolutePath,
      new java.io.File(root, "ckpt").getAbsolutePath)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    // the file+offset coordinates surface through the streaming failure —
    // a crawl operator sees WHICH archive is corrupt, and nothing commits
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    val msgs = chain(e).mkString(" | ")
    assert(msgs.contains("malformed WARC") || msgs.contains("truncated"),
      s"expected the codec's loud error in: $msgs")
  }
}
