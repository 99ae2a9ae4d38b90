package graft.jobs

import java.nio.file.Files

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._

/** Incremental crawl-novelty store: append ≡ recompute (the census after
  * init+appends equals q108's first-seen column over the full corpus),
  * late batches migrate first-seen down, replays commit nothing. */
class IncrementalNoveltySpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def docs() = graft.model.Pages.documentsPages(spark, sf)

  private def censusOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    rows
  }

  test("init + append ≡ full recompute, and ≡ q108's n_new column") {
    val root = Files.createTempDirectory("incnov").toString
    val a = docs().where(pmod(col("doc_id"), lit(2)) === 0)
    val b = docs().where(pmod(col("doc_id"), lit(2)) === 1)
    IncrementalNovelty.init(spark, a, root)
    val appended = censusOf(IncrementalNovelty.append(spark, b, root))
    val stored = censusOf(IncrementalNovelty.census(spark, root))
    assert(appended === stored)
    // cross-derivation: q108 over the full corpus reports the same
    // first-seen counts per bucket
    val q108 = graft.queries.QualityQueries.crawlNovelty(spark, sf)
      .select(col("eb"), col("n_new")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(stored === q108.filter(_._2 > 0L))
  }

  test("late batch migrates first-seen down; replay commits nothing") {
    val root = Files.createTempDirectory("incnov2").toString
    import spark.implicits._
    // two docs sharing one block; the late batch's copy sits in an
    // EARLIER bucket (smaller warc_epoch)
    val blk = (1 to 16).map(i => s"m$i").mkString(" ")
    val early = Seq((1L, 1704067200L + 100L, blk))
      .toDF("doc_id", "warc_epoch", "text")
    val late = Seq((2L, 1704067200L + 20000000L, blk))
      .toDF("doc_id", "warc_epoch", "text")
    IncrementalNovelty.init(spark, late, root)
    assert(censusOf(IncrementalNovelty.census(spark, root))
      === Seq((20000000L / graft.queries.QualityQueries.NoveltyBucketS, 1L)))
    censusOf(IncrementalNovelty.append(spark, early, root, Some(1L)))
    // the block's first-seen migrated to bucket 0 — no row rewrite needed
    assert(censusOf(IncrementalNovelty.census(spark, root)) === Seq((0L, 1L)))

    val lake = new graft.lake.LakeTable(root)
    val vBefore = lake.currentVersion(IncrementalNovelty.Stage)
    // replay of batch 1: same census, no new version
    val replay = censusOf(IncrementalNovelty.append(spark, early, root, Some(1L)))
    assert(replay === Seq((0L, 1L)))
    assert(lake.currentVersion(IncrementalNovelty.Stage) === vBefore)
    // a batch of pure re-observations also commits nothing
    censusOf(IncrementalNovelty.append(spark, early, root, Some(2L)))
    assert(lake.currentVersion(IncrementalNovelty.Stage) === vBefore)
  }

  test("streaming face: per-cycle census series, append ≡ recompute each cycle") {
    val root = Files.createTempDirectory("incnov_s").toString
    val in = Files.createTempDirectory("incnov_in").toString
    val out = Files.createTempDirectory("incnov_out").toString + "/census"
    val ck = Files.createTempDirectory("incnov_ck").toString
    val a = docs().where(pmod(col("doc_id"), lit(3)) === 0)
    val b = docs().where(pmod(col("doc_id"), lit(3)) === 1)
    IncrementalNovelty.init(spark, a, root)

    def runAvailable(): Unit = {
      val schema = spark.read.parquet(in).schema
      val q = IncrementalNovelty.appendStream(
        spark.readStream.schema(schema).parquet(in), root, out, ck)
      q.awaitTermination()
      org.apache.spark.sql.GraftCheckpoints.releaseAll()
    }

    b.select(col("doc_id"), col("warc_epoch"), col("text"))
      .write.mode("append").parquet(in)
    runAvailable()
    // the streamed cycle census equals the committed store's census
    val streamed = spark.read.parquet(out)
      .select(col("eb"), col("n_new")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val stored = censusOf(IncrementalNovelty.census(spark, root)).toSet
    assert(streamed === stored)
    // and ≡ a from-scratch recompute over everything observed so far
    val freshRoot = Files.createTempDirectory("incnov_r").toString
    IncrementalNovelty.init(spark, a.unionByName(b), freshRoot)
    val recompute = censusOf(
      IncrementalNovelty.census(spark, freshRoot)).toSet
    assert(stored === recompute)
  }
}
