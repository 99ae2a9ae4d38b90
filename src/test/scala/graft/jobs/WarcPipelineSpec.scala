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
}
