package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.execution.GenerateExec
import org.apache.spark.sql.functions._

/** q110 per-language quality calibration: the per-lang percentile /
  * keep-share table must agree with a driver-side recomputation of the
  * q73 score arithmetic and the discrete-percentile definition, and the
  * percentile columns must be ordered and keep-consistent. */
class LangCalibrationSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def driverScore(text: String): Long = {
    val a = text.split(" ", -1)
    val nWords = a.length.toLong
    val nStop = a.count(QualityQueries.StopWords.contains).toLong
    val nDistinct = a.distinct.length.toLong
    val nDigit = text.count(_.isDigit).toLong
    nStop * 10000L / nWords * 2L + nDistinct * 10000L / nWords * 3L -
      nDigit * 10000L / math.max(text.length.toLong, 1L) * 5L
  }

  private def driverTable(): Seq[(String, Long, Long, Long, Long, Long)] = {
    val rows = graft.model.Pages.documentsPages(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), driverScore(r.getString(1))))
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, xs) =>
      val scores = xs.map(_._2).sorted
      val n = scores.length.toLong
      def pct(k: Long) = scores((k - 1).toInt) // k-th smallest, 1-based
      val nKeep = scores.count(_ >= QualityQueries.KeepThresholdBp).toLong
      (lang, n, nKeep * 10000L / n,
        pct((n + 3) / 4), pct((n + 1) / 2), pct((3 * n + 3) / 4))
    }
  }

  private def table(): Seq[(String, Long, Long, Long, Long, Long)] = {
    val rows = QualityQueries.langCalibration(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    }.toSeq
    GraftCheckpoints.releaseAll()
    rows
  }

  test("q110 ≡ driver recomputation of score percentiles and keep share") {
    assert(table() === driverTable())
  }

  test("percentile ordering and keep consistency") {
    table().foreach { case (lang, n, keepBp, p25, p50, p75) =>
      assert(n > 0L, lang)
      assert(p25 <= p50 && p50 <= p75, lang)
      assert(keepBp >= 0L && keepBp <= 10000L, lang)
      // the global threshold sits between the per-lang quartiles at this
      // corpus (each lang keeps some but not most docs) — the bias the
      // report exists to expose
      assert(p25 < QualityQueries.KeepThresholdBp, lang)
      assert(p75 > QualityQueries.KeepThresholdBp, lang)
    }
  }

  test("q110 plan: map-side scoring, no explode, no corpus percentile") {
    val q = QualityQueries.langCalibration(spark, sf)
    val nodes = allPlanNodes(q.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[GenerateExec]) === 0,
      "scoring is a projection — the corpus never explodes")
    GraftCheckpoints.releaseAll()
  }
}
