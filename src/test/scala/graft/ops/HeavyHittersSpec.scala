package graft.ops

import graft.model.Pages
import graft.queries.TextQueries
import graft.sql.SparkTestBase

/** q72 evidence: the exact top-K trigram census must (a) equal a
  * from-scratch driver recomputation, and (b) plan as a distributed
  * top-k (TakeOrderedAndProject) — no global sort of the vocabulary,
  * and the rank window runs only after the K-row limit. */
class HeavyHittersSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q72: top-K trigrams equal a from-scratch recomputation") {
    val texts = Pages.documentsPages(spark, sf)
      .select("text").collect().map(_.getString(0))
    val counts = new scala.collection.mutable.HashMap[String, Long]
    texts.foreach { t =>
      val a = t.split(" ", -1)
      var i = 0
      while (i + 2 < a.length) {
        val g = s"${a(i)} ${a(i + 1)} ${a(i + 2)}"
        counts(g) = counts.getOrElse(g, 0L) + 1L
        i += 1
      }
    }
    val expected = counts.toSeq.sortBy { case (g, c) => (-c, g) }
      .take(TextQueries.HeavyK).zipWithIndex
      .map { case ((g, c), i) => (i + 1, g, c) }
    val got = TextQueries.heavyHitters(spark, sf).collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got === expected.toSeq)
  }

  test("q72: plan is a distributed top-k, not a global vocabulary sort") {
    val df = TextQueries.heavyHitters(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(900))
    assert(!plan.contains("CartesianProduct"), plan.take(900))
  }
}
