package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints

/** q87 ANN recall eval: the metric recomputes from the two legs it
  * claims to compare, every probe retrieves at least itself, and the
  * rollup is integer-exact. */
class AnnRecallSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("q87 recall@K recomputes from the leg result sets") {
    val out = EmbQueries.annRecall(spark, sf).collect()
    assert(out.length == EmbQueries.NumProbes)
    val truth = EmbQueries.knnCosine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = EmbQueries.ivfAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    out.foreach { r =>
      val (qid, hits, bp) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val expect = truth.count { case (q, v) => q == qid && approx.contains((q, v)) }
      assert(hits == expect.toLong, s"probe $qid hits")
      assert(bp == hits * 10000L / EmbQueries.K, s"probe $qid recall_bp")
      // a probe's best cell is its assigned cell → it always finds itself
      assert(hits >= 1L, s"probe $qid must retrieve itself")
      assert(bp >= 0L && bp <= 10000L)
    }
    GraftCheckpoints.releaseAll()
  }

  test("q96 footrule recomputes from the two rankings; self-hit anchors rank 1") {
    val out = EmbQueries.annRankDrift(spark, sf).collect()
    assert(out.length == EmbQueries.NumProbes)
    val truth = EmbQueries.knnCosine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val approx = EmbQueries.ivfAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    out.foreach { r =>
      val qid = r.getLong(0)
      val shared = truth.keySet.filter(_._1 == qid).intersect(approx.keySet)
      assert(r.getLong(1) == shared.size.toLong, s"probe $qid n_shared")
      val foot = shared.toSeq.map(k => math.abs(truth(k) - approx(k)).toLong).sum
      assert(r.getLong(2) == foot, s"probe $qid footrule")
      // the probe itself is rank 1 in BOTH rankings (cosine exactly 1),
      // so the footrule can never be the worst case over all shared hits
      assert(truth((qid, qid)) == 1 && approx((qid, qid)) == 1)
    }
    GraftCheckpoints.releaseAll()
  }
}
