package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.functions._

/** q106 per-host boilerplate census: the distributed df census must agree
  * with a driver-side recomputation of the same block/threshold algebra,
  * and the synthesized boilerplate header must behave as the known
  * positive (df = n_pages on every multi-page host) while single-page
  * hosts stay boilerplate-free (df ≥ 2 is required). */
class BoilerplateSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"
  private val W = QualityQueries.BlockW

  private def hostOf(id: Long): String =
    s"h${id % 97}.example." + (id % 3 match {
      case 0 => "com"; case 1 => "org"; case _ => "net" })

  private def driverCensus(): Seq[(String, Long, Long, Long, Long, String)] = {
    val rows = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val blocks = rows.flatMap { case (id, text) =>
      val host = hostOf(id)
      val words = (host + QualityQueries.BoilerTail + " " + text).split(" ", -1)
      words.grouped(W).map(g => (host, id, g.mkString(" "))).toSeq.distinct
    }
    blocks.groupBy(_._1).toSeq.sortBy(_._1).map { case (host, bs) =>
      val nPages = rows.count(r => hostOf(r._1) == host).toLong
      val df = bs.groupBy(_._3).map { case (blk, xs) => blk -> xs.length.toLong }
      val boiler = df.filter { case (_, d) => d >= 2 && d * 2 >= nPages }
      val top = if (boiler.isEmpty) ""
        else boiler.toSeq.minBy { case (blk, d) => (-d, blk) }._1
      (host, nPages, df.size.toLong, boiler.size.toLong,
        boiler.values.sum, top)
    }
  }

  private def census(): Seq[(String, Long, Long, Long, Long, String)] = {
    val rows = QualityQueries.boilerplateCensus(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5))
    }.toSeq
    GraftCheckpoints.releaseAll()
    rows
  }

  test("q106 ≡ driver recomputation of the block df census") {
    assert(census() === driverCensus())
  }

  test("the injected header is the known positive; singletons are clean") {
    // the header block is exactly one host token + 15 boilerplate words
    assert(QualityQueries.BoilerTail.trim.split(" ").length === W - 1)
    census().foreach { case (host, nPages, _, nBoiler, mass, top) =>
      if (nPages >= 2) {
        // header block df = n_pages ⇒ it passes the ≥50% threshold and,
        // having maximal df, pins the top slot (modulo blk-asc ties).
        assert(nBoiler >= 1L, host)
        assert(mass >= nPages, host)
        assert(top.nonEmpty, host)
      } else {
        // df ≥ 2 is unreachable on a single-page host
        assert(nBoiler === 0L, host)
        assert(top === "", host)
      }
    }
  }
}
