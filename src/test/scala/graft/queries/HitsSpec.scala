package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.functions._

/** q105 HITS: the distributed mutual-reinforcement rounds must agree with
  * a driver-side recomputation from the closed-form edge arithmetic, and
  * the unnormalized-long construction must respect its own overflow
  * budget (max degree 3 ⇒ ≤9×/round growth). */
class HitsSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def driverHits(): Seq[(Long, Long, Long)] = {
    val ids = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val n = ids.length.toLong
    val edges = ids.flatMap { src =>
      GraphQueries.Offsets.take(1 + (src % 3).toInt).map(o => (src, (src + o) % n))
    }
    var hub = ids.map(_ -> 1000000L).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to GraphQueries.HitsIters) {
      auth = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => hub(e._1)).sum
      }
      hub = edges.groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => auth(e._2)).sum
      }
    }
    ids.map(v => (v, auth(v), hub(v)))
      .sortBy { case (v, a, _) => (-a, v) }
      .take(GraphQueries.HitsTopK).toSeq
  }

  test("q105 ≡ driver recomputation of unnormalized HITS") {
    val exp = driverHits()
    val got = GraphQueries.hits(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    GraftCheckpoints.releaseAll()
    assert(got === exp)
  }

  test("overflow budget and positivity of the long iterate") {
    val got = GraphQueries.hits(spark, sf).collect()
    GraftCheckpoints.releaseAll()
    assert(got.length === GraphQueries.HitsTopK)
    // ≤9× growth per round from max degree 3, starting at 10^6: the
    // 6-round iterate stays far below Long.Max (no silent wraparound).
    val bound = math.pow(9, GraphQueries.HitsIters).toLong * 1000000L
    got.foreach { r =>
      assert(r.getLong(1) > 0L && r.getLong(1) <= bound)
      assert(r.getLong(2) > 0L && r.getLong(2) <= bound)
    }
  }
}
