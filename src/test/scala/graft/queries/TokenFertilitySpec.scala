package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.execution.GenerateExec
import org.apache.spark.sql.functions._

/** q112 tokenizer fertility by language: the per-lang rollup must agree
  * with a driver-side java.util.regex recomputation of the q43 token
  * pair, and the fertility algebra must hold (≥ 1 token per word on this
  * corpus, chars-per-token positive). */
class TokenFertilitySpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def driverTable(): Seq[(String, Long, Long, Long, Long, Long, Long)] = {
    val pat = java.util.regex.Pattern.compile(TextQueries.BpePattern)
    val rows = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map { r =>
        val t = r.getString(2) + " it's v" + r.getLong(0) + ".0, (beta)!"
        val m = pat.matcher(t)
        var nBpe = 0L
        while (m.find()) nBpe += 1
        (r.getString(1), nBpe, t.trim.split("\\s+").length.toLong,
          t.length.toLong)
      }
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, xs) =>
      val (tok, words, chars) =
        (xs.map(_._2).sum, xs.map(_._3).sum, xs.map(_._4).sum)
      (lang, xs.length.toLong, tok, words, chars,
        tok * 100L / words, chars * 100L / tok)
    }
  }

  test("q112 ≡ driver java.util.regex recomputation") {
    val got = TextQueries.tokenFertility(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    }.toSeq
    assert(got === driverTable())
  }

  test("fertility algebra and map-side plan") {
    val got = TextQueries.tokenFertility(spark, sf).collect()
    got.foreach { r =>
      assert(r.getLong(5) >= 100L, r.getString(0)) // ≥ 1 token per word
      assert(r.getLong(6) >= 1L, r.getString(0))
      assert(r.getLong(2) >= r.getLong(3), r.getString(0))
    }
    val nodes = allPlanNodes(
      TextQueries.tokenFertility(spark, sf).queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[GenerateExec]) === 0,
      "token counting is regexp_count — the token array never explodes")
  }
}
