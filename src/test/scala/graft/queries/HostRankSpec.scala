package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.functions._

/** q113 host-level PageRank: the weighted damped iteration over the host
  * quotient matrix must agree with a driver-side recomputation (same
  * integer operation order), stay positive, and conserve the host set
  * across rounds on this corpus. */
class HostRankSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def hostOf(id: Long): String =
    s"h${id % 97}.example." + (id % 3 match {
      case 0 => "com"; case 1 => "org"; case _ => "net" })

  private def driverRanks(): Seq[(String, Long)] = {
    val ids = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val n = ids.length.toLong
    val m = ids.flatMap { src =>
      GraphQueries.Offsets.take(1 + (src % 3).toInt)
        .map(o => (hostOf(src), hostOf((src + o) % n)))
    }.filter { case (a, b) => a != b }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val wOut = m.toSeq.groupBy(_._1._1).map { case (h, xs) =>
      h -> xs.map(_._2).sum
    }
    var r: Map[String, Long] = wOut.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to GraphQueries.HostRankIters) {
      r = m.toSeq.flatMap { case ((h, d), w) =>
        r.get(h).map(rh => d -> rh * w / wOut(h))
      }.groupBy(_._1).map { case (d, xs) =>
        d -> (150000L + xs.map(_._2).sum * 85L / 100L)
      }
    }
    r.toSeq.sortBy { case (h, rv) => (-rv, h) }
  }

  test("q113 ≡ driver recomputation of the weighted damped iteration") {
    val got = GraphQueries.hostRank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    GraftCheckpoints.releaseAll()
    assert(got === driverRanks())
  }

  test("positivity and host-set conservation") {
    val got = GraphQueries.hostRank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    GraftCheckpoints.releaseAll()
    // every (queue, tld) host class exists and survives the iteration
    assert(got.length === 97 * 3)
    got.foreach { case (h, r) => assert(r >= 150000L, h) }
  }
}
