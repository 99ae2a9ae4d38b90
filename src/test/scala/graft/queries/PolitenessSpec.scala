package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.functions._

/** q104 per-host politeness schedule: the dispatcher report must agree
  * with a driver-side FIFO recomputation (slots by (warc_epoch, doc_id)
  * within host), conserve page mass, and keep the makespan algebra. */
class PolitenessSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private val EpochBase = graft.model.Pages.DocEpochBase
  private def epochOf(id: Long) =
    EpochBase + (id * graft.model.Pages.DocEpochMul) % graft.model.Pages.DocEpochMod
  private def hostOf(id: Long) =
    s"h${id % QualityQueries.PoliteQueues}.example." + (id % 3 match {
      case 0 => "com"; case 1 => "org"; case _ => "net" })

  test("q104 ≡ driver FIFO recomputation") {
    val ids = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val exp = ids.groupBy(hostOf).toSeq.sortBy(_._1).map { case (h, ds) =>
      val q = ds.sortBy(id => (epochOf(id), id))
      val delay = 1 + (ds.head % QualityQueries.PoliteQueues) %
        QualityQueries.PoliteDelayMod
      val schedSum = q.zipWithIndex.map { case (id, s) => s * (id % 1000003L) }.sum
      (h, q.length.toLong, delay, (q.length - 1) * delay,
        q.head, q.last, schedSum)
    }
    val got = QualityQueries.politenessSchedule(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))
    }
    GraftCheckpoints.releaseAll()
    assert(got.toSeq === exp)
  }

  test("page mass conservation and makespan algebra") {
    val n = graft.model.Pages.documentsPages(spark, sf).count()
    val got = QualityQueries.politenessSchedule(spark, sf).collect()
    GraftCheckpoints.releaseAll()
    assert(got.map(_.getLong(1)).sum === n)
    got.foreach { r =>
      assert(r.getLong(3) === (r.getLong(1) - 1) * r.getLong(2))
      assert(r.getLong(2) >= 1 && r.getLong(2) <= QualityQueries.PoliteDelayMod)
    }
    // every (queue, tld) host class is populated at this SF
    assert(got.length === (QualityQueries.PoliteQueues * 3).toInt)
  }
}
