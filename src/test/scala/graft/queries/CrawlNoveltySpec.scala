package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.execution.{FileSourceScanExec, GenerateExec}
import org.apache.spark.sql.functions._

/** q108 crawl novelty curve: the per-epoch first-seen census must agree
  * with a driver-side recomputation of the block/bucket algebra, conserve
  * distinct-block mass (Σ n_new = corpus-wide distinct blocks), and keep
  * the single-explode plan shape. */
class CrawlNoveltySpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"
  private val W = QualityQueries.BlockW

  private def driverCurve(): Seq[(Long, Long, Long, Long, Long)] = {
    val rows = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def ebOf(id: Long): Long =
      ((id * graft.model.Pages.DocEpochMul) % graft.model.Pages.DocEpochMod) /
        QualityQueries.NoveltyBucketS
    val pairs = rows.flatMap { case (id, text) =>
      val eb = ebOf(id)
      text.split(" ", -1).grouped(W).map(g => (g.mkString(" "), eb)).toSeq
    }.distinct
    val firstSeen = pairs.groupBy(_._1).map { case (blk, xs) =>
      blk -> xs.map(_._2).min
    }
    val nd = rows.groupBy(r => ebOf(r._1)).map { case (eb, xs) =>
      eb -> xs.length.toLong
    }
    nd.keys.toSeq.sorted.map { eb =>
      val nBlocks = pairs.count(_._2 == eb).toLong
      val nNew = firstSeen.values.count(_ == eb).toLong
      (eb, nd(eb), nBlocks, nNew,
        nNew * 10000L / math.max(nBlocks, 1L))
    }
  }

  private def curve(): Seq[(Long, Long, Long, Long, Long)] = {
    val rows = QualityQueries.crawlNovelty(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }.toSeq
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    rows
  }

  test("q108 ≡ driver recomputation of the first-seen census") {
    assert(curve() === driverCurve())
  }

  test("block-mass conservation and first-bucket totality") {
    val got = curve()
    val rows = graft.model.Pages.documentsPages(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val allBlocks = rows.flatMap(
      _.split(" ", -1).grouped(W).map(_.mkString(" "))).distinct.length.toLong
    // every distinct block is new in exactly one bucket
    assert(got.map(_._4).sum === allBlocks)
    got.foreach { case (_, _, nBlocks, nNew, bp) =>
      assert(nNew <= nBlocks)
      assert(bp >= 0L && bp <= 10000L)
    }
    // the earliest populated bucket has nothing to carry over
    assert(got.head._5 === 10000L)
  }

  test("q108 plan: one block explode in the pair pass, none after it") {
    val withEb = QualityQueries.withEpochBucket(
      graft.model.Pages.documentsPages(spark, sf))
    val pre = QualityQueries.noveltyPairsOf(withEb)
    val preNodes = allPlanNodes(pre.queryExecution.executedPlan)
    assert(preNodes.count(_.isInstanceOf[GenerateExec]) === 1,
      "the block stream must explode exactly once")
    assert(preNodes.count {
      case f: FileSourceScanExec =>
        f.relation.location.inputFiles.exists(_.contains("documents.parquet"))
      case _ => false
    } === 1, "one corpus scan")

    val q = QualityQueries.crawlNovelty(spark, sf)
    val nodes = allPlanNodes(q.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[GenerateExec]) === 0,
      "consumers must read the materialized pair table, never re-explode")
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
  }
}
