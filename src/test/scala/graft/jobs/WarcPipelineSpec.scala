package graft.jobs

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.GraftCheckpoints.TrackedDataFrame
import org.apache.spark.sql.functions._

/** Crawl-dump-to-training-store integration: WARC parse → text extraction
  * identity per url → the full resumable pipeline → sharded store on
  * disk; a rerun resumes without rewriting the store. */
class WarcPipelineSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("WARC dump flows to a sharded training store; rerun resumes") {
    val warcDir = graft.queries.TextQueries.warcFixture(spark, sf)
    val ingested = WarcPipeline.ingest(spark, warcDir.getAbsolutePath)
      .trackedCheckpoint

    // extraction identity per url (the input_hint per-row invariant):
    // parse + extract reproduces the stored text byte-for-byte
    val orig = spark.read.parquet(s"$sf/documents.parquet")
      .select(concat(lit("https://example.org/d/"),
        col("doc_id").cast("string")).as("url"), col("text").as("t0"))
    val joined = ingested.join(orig, "url")
    assert(joined.count() == orig.count())
    assert(joined.where(col("text") =!= col("t0")).count() == 0,
      "extracted text must be byte-identical per url")
    // url-hash identity: no collisions over this corpus
    assert(ingested.select("doc_id").distinct().count() == orig.count())

    val root = java.nio.file.Files.createTempDirectory("warcpipe").toFile
    val lakeRoot = new java.io.File(root, "lake").getAbsolutePath
    val storeDir = new java.io.File(root, "store").getAbsolutePath
    val sharded = WarcPipeline.runFromDump(spark, warcDir.getAbsolutePath,
      lakeRoot, storeDir)
    val n1 = sharded.count()
    assert(n1 > 0, "pipeline must keep survivors")
    assert(new java.io.File(storeDir, "_SUCCESS").exists())
    val store = spark.read.parquet(storeDir)
    assert(store.count() == n1)
    assert(store.columns.contains("split") && store.columns.contains("shard"))
    // eval slice never reaches the store (it decontaminates against itself)
    assert(store.where(pmod(col("doc_id"),
      lit(graft.queries.QualityQueries.EvalMod)) === 0).count() == 0,
      "eval-slice docs must be decontaminated out of the training store")

    // resume: the store is not rewritten, the result is identical
    val before = new java.io.File(storeDir, "_SUCCESS").lastModified()
    val n2 = WarcPipeline.runFromDump(spark, warcDir.getAbsolutePath,
      lakeRoot, storeDir).count()
    assert(n2 == n1)
    assert(new java.io.File(storeDir, "_SUCCESS").lastModified() == before,
      "a resumed rerun must not rewrite the store")
    GraftCheckpoints.releaseAll()
  }

  test("wide (128-bit) identity: wall, dedup and idempotence contracts hold with string doc ids") {
    val warcDir = graft.queries.TextQueries.warcFixture(spark, sf)
    // ingest under the wide identity: doc_id is the 32-hex md5(url) digest,
    // injective over the corpus (no 63-bit aliasing possible)
    val ing = WarcPipeline.ingest(spark, warcDir.getAbsolutePath,
      wideIdentity = true).trackedCheckpoint
    assert(ing.schema("doc_id").dataType ==
      org.apache.spark.sql.types.StringType)
    val ids = ing.select("doc_id").collect().map(_.getString(0))
    assert(ids.forall(id => id.length == 32 && id.matches("[0-9a-f]+")))
    assert(ids.distinct.length == ids.length, "wide ids must be collision-free")
    GraftCheckpoints.releaseAll()

    val root = java.nio.file.Files.createTempDirectory("warcwide").toFile
    val lakeRoot = new java.io.File(root, "lake").getAbsolutePath
    val storeDir = new java.io.File(root, "store").getAbsolutePath
    val sharded = WarcPipeline.runFromDump(spark, warcDir.getAbsolutePath,
      lakeRoot, storeDir, wideIdentity = true)
    val n1 = sharded.count()
    assert(n1 > 0, "wide-identity pipeline must keep survivors")
    val store = spark.read.parquet(storeDir)
    assert(store.schema("doc_id").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(store.count() == n1)
    // WALL: the eval slice (wallBucket == 0 — the wide-id wall rule, a
    // pure function of the url digest) never reaches the training store
    assert(store.where(WarcPipeline.wallBucket(store) === 0).count() == 0,
      "eval-slice docs must be decontaminated out under wide ids too")
    // shard/split assignment is well-formed from the string identity
    assert(store.where(col("shard") < 0 ||
      col("shard") >= graft.queries.QualityQueries.NumShards).count() == 0)
    assert(store.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val", "test")))

    // IDEMPOTENCE: a rerun resumes; the store is not rewritten
    val before = new java.io.File(storeDir, "_SUCCESS").lastModified()
    val n2 = WarcPipeline.runFromDump(spark, warcDir.getAbsolutePath,
      lakeRoot, storeDir, wideIdentity = true).count()
    assert(n2 == n1)
    assert(new java.io.File(storeDir, "_SUCCESS").lastModified() == before)
    GraftCheckpoints.releaseAll()
  }

  test("wide identity daily face: append + replay idempotence with string ids") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
    val fmt = "2024-03-01T12:00:00Z"
    def dump(dir: java.io.File, rows: Seq[(Long, String)]): Unit = {
      dir.mkdirs()
      graft.io.WarcIO.writeLocal(rows.map { case (id, t) =>
        ("response", s"<urn:d:$id>", s"https://example.org/d/$id", fmt,
          "text/html", s"<html>$t</html>".getBytes("UTF-8"))
      }.iterator, new java.io.File(dir, "part-00000.warc.gz"))
    }
    val root = java.nio.file.Files.createTempDirectory("warcwided").toFile
    val a = new java.io.File(root, "dumpA"); val b = new java.io.File(root, "dumpB")
    val rows = docs.map(r => r.getLong(0) -> r.getString(1)).toSeq
    dump(a, rows.filter(_._1 < 250)); dump(b, rows.filter(_._1 >= 250))
    val lakeRoot = new java.io.File(root, "lake").getAbsolutePath
    val storeDir = new java.io.File(root, "store").getAbsolutePath

    WarcPipeline.initFromDump(spark, a.getAbsolutePath, lakeRoot, storeDir,
      wideIdentity = true)
    val n0 = spark.read.parquet(storeDir).count()
    assert(n0 > 0)
    WarcPipeline.appendDump(spark, b.getAbsolutePath, lakeRoot, storeDir,
      batchId = Some(7L), wideIdentity = true)
    val st1 = spark.read.parquet(storeDir)
    val n1 = st1.count()
    assert(n1 > n0, "the second dump must contribute survivors")
    WarcPipeline.appendDump(spark, b.getAbsolutePath, lakeRoot, storeDir,
      batchId = Some(7L), wideIdentity = true)
    assert(spark.read.parquet(storeDir).count() == n1,
      "a replayed dump must append nothing under wide ids")
    assert(st1.where(WarcPipeline.wallBucket(st1) === 0).count() == 0,
      "the id-hash wall holds across wide-id batches")
    GraftCheckpoints.releaseAll()
  }

  test("httpBody: application/http payloads split at the first blank line; bare content passes through") {
    import spark.implicits._
    val body = "<html><p>keep: A&amp;B</p></html>"
    val http = s"HTTP/1.1 200 OK\r\nServer: s\r\nSet-Cookie: secret=1\r\n\r\n$body"
    val rows = Seq(
      ("application/http; msgtype=response", http.getBytes("UTF-8")),
      // conformant-but-headerless: no blank line → whole payload survives
      ("application/http; msgtype=response", "no blank line".getBytes("UTF-8")),
      ("text/html", body.getBytes("UTF-8")),
      // a bare-html record whose BODY contains \r\n\r\n must NOT be split
      ("text/html", s"<html>a\r\n\r\nb</html>".getBytes("UTF-8")))
      .toDF("content_type", "payload")
    val got = rows.select(
      WarcPipeline.httpBody(col("payload"), col("content_type")).as("b"))
      .as[String].collect()
    assert(got(0) == body, "headers must be stripped from application/http")
    assert(!got(0).contains("Set-Cookie"))
    assert(got(1) == "no blank line")
    assert(got(2) == body)
    assert(got(3) == "<html>a\r\n\r\nb</html>")
  }

  test("daily-crawl face: init from dump A, append dump B, replay appends nothing") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
    val fmt = "2024-03-01T12:00:00Z"
    // real Common-Crawl response framing: the payload is a full HTTP
    // message (status line + headers + blank line + body), so this spec
    // also proves ingest's header split end-to-end — header bytes must
    // never reach text extraction or dedup identity
    def dump(dir: java.io.File, rows: Seq[(Long, String)]): Unit = {
      dir.mkdirs()
      graft.io.WarcIO.writeLocal(rows.map { case (id, t) =>
        ("response", s"<urn:d:$id>", s"https://example.org/d/$id", fmt,
          "application/http; msgtype=response",
          ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n" +
            s"Server: synthetic/1.0\r\nX-Doc: $id\r\n\r\n<html>$t</html>")
            .getBytes("UTF-8"))
      }.iterator, new java.io.File(dir, "part-00000.warc.gz"))
    }
    val root = java.nio.file.Files.createTempDirectory("warcdaily").toFile
    val a = new java.io.File(root, "dumpA"); val b = new java.io.File(root, "dumpB")
    val rows = docs.map(r => r.getLong(0) -> r.getString(1)).toSeq
    dump(a, rows.filter(_._1 < 250)); dump(b, rows.filter(_._1 >= 250))
    val lakeRoot = new java.io.File(root, "lake").getAbsolutePath
    val storeDir = new java.io.File(root, "store").getAbsolutePath

    WarcPipeline.initFromDump(spark, a.getAbsolutePath, lakeRoot, storeDir)
    val n0 = spark.read.parquet(storeDir).count()
    assert(n0 > 0)
    WarcPipeline.appendDump(spark, b.getAbsolutePath, lakeRoot, storeDir,
      batchId = Some(7L))
    val n1 = spark.read.parquet(storeDir).count()
    assert(n1 > n0, "the second dump must contribute survivors")
    // redelivered dump with the same batch id: nothing lands twice
    WarcPipeline.appendDump(spark, b.getAbsolutePath, lakeRoot, storeDir,
      batchId = Some(7L))
    assert(spark.read.parquet(storeDir).count() == n1,
      "a replayed dump must append nothing")
    // the id-hash eval wall holds across batches
    assert(spark.read.parquet(storeDir).where(
      pmod(col("doc_id"), lit(graft.queries.QualityQueries.EvalMod)) === 0)
      .count() == 0)
    GraftCheckpoints.releaseAll()
  }
}
