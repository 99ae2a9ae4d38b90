package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.execution.GenerateExec
import org.apache.spark.sql.functions._

/** q109 URL parameter census: the (domain, param) cardinality table must
  * agree with a driver-side recomputation of the synthesized params, the
  * injective sessionid must be flagged strip=1 on every domain, and the
  * content/campaign params (id, utm_source) must survive. */
class ParamCensusSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def driverCensus(): Seq[(String, String, Long, Long, Long, Long)] = {
    val ids = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val rows = ids.flatMap { id =>
      val domain = "example." + (id % 3 match {
        case 0 => "com"; case 1 => "org"; case _ => "net" })
      Seq((domain, "id", (id % 13).toString)) ++
        (if (id % 4 == 0) Seq((domain, "utm_source", s"s${id % 3}")) else Nil) ++
        (if (id % 5 == 0) Seq((domain, "sessionid",
          ((id % QualityQueries.ParamSessionMod) *
            QualityQueries.ParamSessionMul %
            QualityQueries.ParamSessionMod).toString)) else Nil)
    }
    rows.groupBy(r => (r._1, r._2)).toSeq
      .sortBy { case ((d, p), _) => (d, p) }
      .map { case ((d, p), xs) =>
        val nUrls = xs.length.toLong
        val nVals = xs.map(_._3).distinct.length.toLong
        (d, p, nUrls, nVals, nVals * 10000L / nUrls,
          if (nVals * 2 >= nUrls) 1L else 0L)
      }
  }

  private def census(): Seq[(String, String, Long, Long, Long, Long)] =
    QualityQueries.paramCensus(spark, sf).collect().map { r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    }.toSeq

  test("q109 ≡ driver recomputation of the param cardinality table") {
    assert(census() === driverCensus())
  }

  test("sessionid strips, content params survive") {
    val got = census()
    val byParam = got.groupBy(_._2)
    // injective session values: cardinality 100%, flagged on every domain
    byParam("sessionid").foreach { r =>
      assert(r._4 === r._3, r)   // n_vals == n_urls
      assert(r._6 === 1L, r)
    }
    // bounded-value content/campaign params never flag
    byParam("id").foreach { r => assert(r._4 <= 13L && r._6 === 0L, r) }
    byParam("utm_source").foreach { r => assert(r._4 <= 3L && r._6 === 0L, r) }
    // all three params present on all three domains
    assert(got.map(_._1).distinct.sorted ===
      Seq("example.com", "example.net", "example.org"))
    assert(byParam.keySet === Set("id", "utm_source", "sessionid"))
  }

  test("q109 plan: bounded param explode, no Expand, no join") {
    val q = QualityQueries.paramCensus(spark, sf)
    val nodes = allPlanNodes(q.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[GenerateExec]) === 1,
      "one bounded param explode")
    // the single-distinct group must plan Expand-free (the CLAUDE.md rule)
    assert(!nodes.exists(_.getClass.getSimpleName.contains("Expand")),
      "count + single countDistinct must not plan via Expand")
    assert(!nodes.exists(_.getClass.getSimpleName.contains("Join")),
      "the census is join-free")
  }
}
