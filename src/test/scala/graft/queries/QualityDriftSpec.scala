package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.execution.GenerateExec
import org.apache.spark.sql.functions._

/** q116 quality drift: the per-bucket rollup must agree with a driver
  * recomputation of the q73 score + q108 bucket algebra, conserve doc
  * mass, and keep the explode-free map-side plan. */
class QualityDriftSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def driverScore(text: String): Long = {
    val a = text.split(" ", -1)
    val nWords = a.length.toLong
    a.count(QualityQueries.StopWords.contains).toLong * 10000L / nWords * 2L +
      a.distinct.length.toLong * 10000L / nWords * 3L -
      text.count(_.isDigit).toLong * 10000L /
        math.max(text.length.toLong, 1L) * 5L
  }
  private def ebOf(id: Long): Long =
    ((id * graft.model.Pages.DocEpochMul) % graft.model.Pages.DocEpochMod) /
      QualityQueries.NoveltyBucketS

  test("q116 ≡ driver recomputation of the drift rollup") {
    val rows = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (ebOf(r.getLong(0)), driverScore(r.getString(1))))
    val exp = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (eb, xs) =>
      val s = xs.map(_._2)
      (eb, xs.length.toLong,
        s.count(_ >= QualityQueries.KeepThresholdBp).toLong * 10000L / xs.length,
        s.sum, s.min, s.max)
    }
    val got = QualityQueries.qualityDrift(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
    }.toSeq
    assert(got === exp)
    // doc-mass conservation across buckets
    assert(got.map(_._2).sum === rows.length.toLong)
  }

  test("q116 plan: map-side scoring, zero Generate") {
    val nodes = allPlanNodes(
      QualityQueries.qualityDrift(spark, sf).queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[GenerateExec]) === 0,
      "scoring and bucketing are projections — nothing explodes")
  }
}
