package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.execution.GenerateExec
import org.apache.spark.sql.functions._

/** q114 host churn: the per-bucket coverage census must agree with a
  * driver-side recomputation, conserve host mass through both the
  * first-seen and last-seen rollups, and keep the zero-explode plan. */
class HostChurnSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def hostOf(id: Long): String =
    s"h${id % 97}.example." + (id % 3 match {
      case 0 => "com"; case 1 => "org"; case _ => "net" })
  private def ebOf(id: Long): Long =
    ((id * graft.model.Pages.DocEpochMul) % graft.model.Pages.DocEpochMod) /
      QualityQueries.NoveltyBucketS

  private def driverCensus(): Seq[(Long, Long, Long, Long, Long)] = {
    val ids = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val pairs = ids.map(id => (hostOf(id), ebOf(id))).distinct
    val span = pairs.groupBy(_._1).map { case (h, xs) =>
      h -> (xs.map(_._2).min, xs.map(_._2).max)
    }
    pairs.map(_._2).distinct.sorted.map { eb =>
      val nHosts = pairs.count(_._2 == eb).toLong
      val nNew = span.values.count(_._1 == eb).toLong
      val nLast = span.values.count(_._2 == eb).toLong
      (eb, nHosts, nNew, nLast, nNew * 10000L / nHosts)
    }
  }

  private def census(): Seq[(Long, Long, Long, Long, Long)] = {
    val rows = QualityQueries.hostChurn(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }.toSeq
    GraftCheckpoints.releaseAll()
    rows
  }

  test("q114 ≡ driver recomputation of the coverage census") {
    assert(census() === driverCensus())
  }

  test("host-mass conservation and the zero-explode plan") {
    val got = census()
    val ids = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val nHostsTotal = ids.map(hostOf).distinct.length.toLong
    // every host is first-seen exactly once and last-seen exactly once
    assert(got.map(_._3).sum === nHostsTotal)
    assert(got.map(_._4).sum === nHostsTotal)
    got.foreach { case (_, nh, nn, nl, bp) =>
      assert(nn <= nh && nl <= nh)
      assert(bp >= 0L && bp <= 10000L)
    }
    // the earliest bucket is all-new
    assert(got.head._5 === 10000L)

    // assert on the PRE-checkpoint pair pass (eager checkpoints hide
    // plans — the CLAUDE.md rule; the hook is the plan the corpus runs)
    val pre = QualityQueries.churnPairsOf(QualityQueries.withEpochBucket(
      graft.model.Pages.documentsPages(spark, sf)))
    val nodes = allPlanNodes(pre.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[GenerateExec]) === 0,
      "host and bucket derive map-side — nothing explodes")
    assert(nodes.count {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.exists(_.contains("documents.parquet"))
      case _ => false
    } === 1, "one corpus scan")
    GraftCheckpoints.releaseAll()
  }
}
