package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.functions._

/** q100 degree census: the histogram must agree with a driver-side
  * recomputation from the closed-form edge arithmetic, conserve node and
  * edge mass on both sides, and keep the out side at its analytic values
  * (out-degree is exactly 1 + src % 3 by construction). */
class DegreeCensusSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def census() = {
    val rows = GraphQueries.degreeCensus(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    GraftCheckpoints.releaseAll()
    rows
  }

  test("q100 ≡ driver recomputation from the edge arithmetic") {
    val ids = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val n = ids.length.toLong
    val edges = ids.flatMap { src =>
      GraphQueries.Offsets.take(1 + (src % 3).toInt).map(o => (src, (src + o) % n))
    }
    def hist(deg: Map[Long, Int]) =
      deg.groupBy(_._2).map { case (d, xs) =>
        (d.toLong, (xs.size.toLong, xs.keys.min))
      }
    val expIn = hist(edges.groupBy(_._2).map { case (k, v) => k -> v.length })
    val expOut = hist(edges.groupBy(_._1).map { case (k, v) => k -> v.length })

    val got = census()
    val gotIn = got.collect { case ("in", d, c, m) => d -> ((c, m)) }.toMap
    val gotOut = got.collect { case ("out", d, c, m) => d -> ((c, m)) }.toMap
    assert(gotIn === expIn)
    assert(gotOut === expOut)
  }

  test("mass conservation and the analytic out side") {
    val n = graft.model.Pages.documentsPages(spark, sf).count()
    val got = census()
    val (in, out) = got.partition(_._1 == "in")
    // every node appears on both sides (ring link ⇒ no zero-degree nodes)
    assert(in.map(_._3).sum === n)
    assert(out.map(_._3).sum === n)
    // edge mass: Σ degree·n_nodes is the same count on both sides
    assert(in.map(r => r._2 * r._3).sum === out.map(r => r._2 * r._3).sum)
    // out-degree is exactly 1 + src%3: three buckets, ~n/3 nodes each
    assert(out.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L))
  }
}
