package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.execution.{FileSourceScanExec, GenerateExec}
import org.apache.spark.sql.functions._

/** q101 distinctive terms per language: the lift ranking must agree with
  * a driver-side recomputation from the raw text (dedup-first df counts,
  * integer lift, the (lift desc, df desc, term) tie-break), and the plan
  * must explode the token stream exactly once with the per-lang top-K
  * planned as a WindowGroupLimit partial (never 5 languages → 5 full
  * reducers). */
class DistinctiveTermsSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("q101 ≡ driver recomputation from the raw text") {
    val raw = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val pairs = raw.flatMap { case (id, lang, text) =>
      text.split(" ", -1).distinct.map(w => (lang, w, id))
    }.distinct
    val dfLang = pairs.groupBy(p => (p._1, p._2)).map { case (k, xs) =>
      k -> xs.length.toLong
    }
    val dfGlobal = dfLang.groupBy(_._1._2).map { case (w, xs) =>
      w -> xs.values.sum
    }
    val expected = dfLang.toSeq
      .filter(_._2 >= TextQueries.TermMinDf)
      .map { case ((lang, w), dl) =>
        (lang, w, dl, dfGlobal(w), dl * TextQueries.LiftScale / dfGlobal(w))
      }
      .groupBy(_._1)
      .flatMap { case (lang, xs) =>
        // tie-break terms in UTF-8 BYTE order (what Spark and DuckDB
        // compare), not Java's UTF-16 code-unit order — they diverge for
        // supplementary-plane characters
        def utf8Lt(a: String, b: String): Boolean = {
          val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
          val c = java.util.Arrays.compareUnsigned(x, y)
          c < 0
        }
        xs.sortWith { case ((_, w1, dl1, _, l1), (_, w2, dl2, _, l2)) =>
            if (l1 != l2) l1 > l2
            else if (dl1 != dl2) dl1 > dl2
            else utf8Lt(w1, w2)
          }
          .take(TextQueries.TermTopK).zipWithIndex
          .map { case ((_, w, dl, dg, lift), i) => (lang, i + 1, w, dl, dg, lift) }
      }.toSet

    val got = TextQueries.distinctiveTerms(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(got === expected)
    // lift is a ≤10⁶ ppm share, ranks are contiguous 1..K per language
    assert(got.forall(r => r._6 >= 1 && r._6 <= TextQueries.LiftScale))
    got.groupBy(_._1).foreach { case (lang, xs) =>
      assert(xs.map(_._2).toSeq.sorted === (1 to xs.size).toSeq, lang)
    }
  }

  test("q101 plan: one token explode in the df pass, none after it") {
    // the expensive pass (pre-checkpoint hook): exactly one Generate and
    // one corpus scan feed the pair-dedup + df rollup
    val pre = TextQueries.termDfOf(
      graft.model.Pages.documentsPages(spark, sf))
    val preNodes = allPlanNodes(pre.queryExecution.executedPlan)
    assert(preNodes.count(_.isInstanceOf[GenerateExec]) === 1,
      "the token stream must explode exactly once")
    assert(preNodes.count {
      case f: FileSourceScanExec =>
        f.relation.location.inputFiles.exists(_.contains("documents.parquet"))
      case _ => false
    } === 1, "one corpus scan")

    // the full query: the materialized df table is the only token source —
    // no re-explode, and the per-lang top-K plans as a WindowGroupLimit
    // partial (never 5 languages → 5 full reducers)
    val df = TextQueries.distinctiveTerms(spark, sf)
    val nodes = allPlanNodes(df.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[GenerateExec]) === 0,
      "consumers must read the materialized df table, never re-explode")
    assert(nodes.exists(_.getClass.getSimpleName.contains("WindowGroupLimit")),
      "per-lang top-K must plan as a WindowGroupLimit partial")
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
  }
}
