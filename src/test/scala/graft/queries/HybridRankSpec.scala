package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints

/** q85 hybrid retrieval: integer-RRF algebra, leg consistency, and the
  * driver-bounded plan shape (both legs end in a top-k — no global sort
  * exchange anywhere). */
class HybridRankSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("q85 fused ranking: integer RRF recomputes from the leg ranks") {
    val out = TextQueries.hybridRank(spark, sf).collect()
    assert(out.length == TextQueries.HybridTop)
    // rank is 1..top in row order
    assert(out.map(_.getInt(0)).toSeq == (1 to TextQueries.HybridTop))
    def rrf(r: Int): Long = if (r > 0) 1000000000L / (TextQueries.RrfK0 + r) else 0L
    out.foreach { row =>
      val (lex, sem, score) = (row.getInt(2), row.getInt(3), row.getLong(4))
      assert(lex >= 0 && lex <= TextQueries.HybridK)
      assert(sem >= 0 && sem <= TextQueries.HybridK)
      assert(lex > 0 || sem > 0, "every fused doc must come from a leg")
      assert(score == rrf(lex) + rrf(sem), s"rrf mismatch at doc ${row.getLong(1)}")
    }
    // fused order is (rrf desc, doc_id asc)
    val pairs = out.map(r => (r.getLong(4), r.getLong(1))).toSeq
    assert(pairs == pairs.sortBy { case (s, d) => (-s, d) })
    // the fused ranks agree with the leg frames they were built from
    val lexRanks = TextQueries.bm25Rank(spark, sf)
      .collect().map(r => r.getLong(1) -> r.getInt(0)).toMap
    out.foreach { row =>
      assert(lexRanks.getOrElse(row.getLong(1), 0) == row.getInt(2),
        s"lex_rank drifted for doc ${row.getLong(1)}")
    }
    GraftCheckpoints.releaseAll()
  }

  test("q85 plan: top-k legs, no global-sort range exchange") {
    val df = TextQueries.hybridRank(spark, sf)
    val plan = allPlanNodes(df.queryExecution.executedPlan)
    // every sort-for-order is either a TakeOrdered top-k or a single-
    // partition window over already-limited rows — a range-partitioned
    // global sort would mean a leg sorts the corpus
    val ranged = plan.exists(_.toString.startsWith("Exchange rangepartitioning"))
    assert(!ranged, "no corpus-wide range sort in the hybrid plan")
    assert(plan.count(p =>
      p.getClass.getSimpleName.contains("TakeOrderedAndProject")) >= 2,
      "both retrieval legs must end in a driver-bounded top-k")
    GraftCheckpoints.releaseAll()
  }
}
