package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.execution.{FileSourceScanExec, GenerateExec}
import org.apache.spark.sql.functions._

/** q107 per-doc keywords: the tf·10⁶ div df ranking must agree with a
  * driver-side recomputation from the raw text (including the
  * (score desc, term asc) tie-break and the zero-fill pivot), and the
  * plan must explode the token stream exactly once in the tf pass with
  * the per-doc top-K planned as a WindowGroupLimit partial. */
class DocKeywordsSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("q107 ≡ driver recomputation from the raw text") {
    val raw = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tf = raw.flatMap { case (id, text) =>
      text.split(" ", -1).groupBy(identity).map { case (w, xs) =>
        (id, w, xs.length.toLong)
      }
    }
    val df = tf.groupBy(_._2).map { case (w, xs) => w -> xs.length.toLong }
    def utf8Lt(a: String, b: String): Boolean =
      java.util.Arrays.compareUnsigned(
        a.getBytes("UTF-8"), b.getBytes("UTF-8")) < 0
    val expected = raw.map(_._1).sorted.map { id =>
      val scored = tf.filter(_._1 == id).map { case (_, w, t) =>
        (w, t * TextQueries.LiftScale / df(w))
      }.toSeq.sortWith { case ((w1, s1), (w2, s2)) =>
        if (s1 != s2) s1 > s2 else utf8Lt(w1, w2)
      }
      def kw(i: Int) = if (scored.isDefinedAt(i)) scored(i) else ("", 0L)
      (id, kw(0)._1, kw(0)._2, kw(1)._1, kw(1)._2, kw(2)._1, kw(2)._2)
    }.toSeq
    val got = TextQueries.docKeywords(spark, sf).collect().map { r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getString(5), r.getLong(6))
    }.toSeq
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(got === expected)
  }

  test("q107 plan: one token explode in the tf pass, none after it") {
    val pre = TextQueries.docTfOf(
      graft.model.Pages.documentsPages(spark, sf))
    val preNodes = allPlanNodes(pre.queryExecution.executedPlan)
    assert(preNodes.count(_.isInstanceOf[GenerateExec]) === 1,
      "the token stream must explode exactly once")
    assert(preNodes.count {
      case f: FileSourceScanExec =>
        f.relation.location.inputFiles.exists(_.contains("documents.parquet"))
      case _ => false
    } === 1, "one corpus scan")

    val q = TextQueries.docKeywords(spark, sf)
    val nodes = allPlanNodes(q.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[GenerateExec]) === 0,
      "consumers must read the materialized tf table, never re-explode")
    assert(nodes.exists(_.getClass.getSimpleName.contains("WindowGroupLimit")),
      "per-doc top-K must plan as a WindowGroupLimit partial")
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
  }
}
