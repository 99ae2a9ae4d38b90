package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.functions._

/** q111 host quotient graph: the weighted host→host rollup must agree
  * with a driver-side recomputation from the closed-form edge arithmetic
  * (including the reciprocity column and the top-K tie-break), drop all
  * self-loops, and keep n_back consistent with the reversed matrix. */
class HostGraphSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def hostOf(id: Long): String =
    s"h${id % 97}.example." + (id % 3 match {
      case 0 => "com"; case 1 => "org"; case _ => "net" })

  private def driverMatrix(): Map[(String, String), Long] = {
    val ids = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val n = ids.length.toLong
    ids.flatMap { src =>
      GraphQueries.Offsets.take(1 + (src % 3).toInt)
        .map(o => (hostOf(src), hostOf((src + o) % n)))
    }.filter { case (a, b) => a != b }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
  }

  private def got(): Seq[(String, String, Long, Long, Long)] = {
    val rows = GraphQueries.hostGraph(spark, sf).collect().map { r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
    }.toSeq
    GraftCheckpoints.releaseAll()
    rows
  }

  test("q111 ≡ driver recomputation of the weighted host matrix") {
    val m = driverMatrix()
    val exp = m.toSeq.map { case ((a, b), w) =>
      val back = m.getOrElse((b, a), 0L)
      (a, b, w, back, if (back > 0L) 1L else 0L)
    }.sortBy { case (a, b, w, _, _) => (-w, a, b) }
      .take(GraphQueries.HostGraphTopK)
    assert(got() === exp)
  }

  test("no self-loops, reciprocity consistency, mass bound") {
    val m = driverMatrix()
    val rows = got()
    rows.foreach { case (a, b, w, back, recip) =>
      assert(a !== b)
      assert(w >= 1L)
      assert(back === m.getOrElse((b, a), 0L), (a, b))
      assert(recip === (if (back > 0L) 1L else 0L))
    }
    // the matrix never exceeds the cross-host edge mass
    assert(rows.map(_._3).sum <= m.values.sum)
  }
}
