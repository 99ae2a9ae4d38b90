package graft.ops

import graft.queries.GraphQueries
import graft.sql.SparkTestBase

/** q74 evidence: integer PageRank must equal a from-scratch driver
  * recomputation (same // and ×85//100 rounding at every step), conserve
  * the rank ordering intuition (higher in-degree ⇒ higher rank), and the
  * derived graph must be exactly the declared 1+i%3-regular-out shape. */
class GraphQueriesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q74: ranks equal a from-scratch integer recomputation") {
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    // driver-side graph + 10 rounds with IDENTICAL integer rounding
    val out = Array.tabulate(n.toInt)(i => 1 + i % 3)
    val offs = GraphQueries.Offsets.map(_.toInt)
    var r = Array.fill(n.toInt)(1000000L)
    for (_ <- 1 to GraphQueries.Iters) {
      val acc = Array.fill(n.toInt)(0L)
      var i = 0
      while (i < n.toInt) {
        val c = r(i) / out(i)
        offs.take(out(i)).foreach(o => acc((i + o) % n.toInt) += c)
        i += 1
      }
      r = acc.map(s => 150000L + s * 85L / 100L)
    }
    val expected = r.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .sortBy { case (node, v) => (-v, node) }.take(GraphQueries.TopK).toSeq
    val got = GraphQueries.pageRank(spark, sf).collect().toSeq
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(got === expected)
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
  }

  test("q74: derived edge table is the declared 1+i%3 out-regular graph") {
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    val e = GraphQueries.edges(spark, sf, n).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(e.length == (0 until n.toInt).map(i => 1 + i % 3).sum)
    e.groupBy(_._1).foreach { case (src, links) =>
      assert(links.length == 1 + (src % 3).toInt &&
        links.forall(_._3 == links.length))
    }
    // the +1 ring: every node has an in-edge, so rank state never shrinks
    assert(e.map(_._2).distinct.length == n.toInt)
  }
}
