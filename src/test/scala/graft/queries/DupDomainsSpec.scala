package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.functions._

/** q102 duplicate-mass-by-domain: the report must agree with a driver-side
  * recomputation from the staged label table + host arithmetic, and
  * conserve doc/dup mass across domains. */
class DupDomainsSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def hostOf(id: Long) =
    s"h${id % 97}.example." + (id % 3 match {
      case 0 => "com"; case 1 => "org"; case _ => "net" })
  private def domainOf(id: Long) =
    "example." + (id % 3 match { case 0 => "com"; case 1 => "org"; case _ => "net" })

  test("q102 ≡ driver recomputation from the staged labels") {
    val labels = TextQueries.minhashLabels(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap // u -> label
    val ids = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))

    val got = TextQueries.dupDomains(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        Option(r.get(5)).map(_.asInstanceOf[Long]),
        Option(r.getString(6)), Option(r.get(7)).map(_.asInstanceOf[Long]))
    }
    GraftCheckpoints.releaseAll()

    val byDomain = ids.groupBy(domainOf)
    val exp = byDomain.toSeq.sortBy(_._1).map { case (dom, ds) =>
      val dup = ds.filter(labels.contains)
      val nDup = dup.length.toLong
      val groups = dup.map(labels).distinct.length.toLong
      val minDup = if (dup.isEmpty) None else Some(dup.min)
      val hostDup = dup.groupBy(hostOf).map { case (h, xs) => h -> xs.length.toLong }
      val top = if (dup.isEmpty) None
        else Some(hostDup.toSeq.minBy { case (h, c) => (-c, h) })
      (dom, ds.length.toLong, nDup, nDup * 10000 / ds.length, groups,
        minDup, top.map(_._1), top.map(_._2))
    }
    assert(got.toSeq === exp)
  }

  test("mass conservation and dup-share bounds") {
    val n = graft.model.Pages.documentsPages(spark, sf).count()
    val got = TextQueries.dupDomains(spark, sf).collect()
    GraftCheckpoints.releaseAll()
    assert(got.map(_.getLong(1)).sum === n)
    got.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))       // n_dup ≤ n_docs
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 10000) // dup_bp in range
      // every dup family has ≥2 members somewhere, so domains' group
      // count never exceeds their dup-doc count
      assert(r.getLong(4) <= r.getLong(2))
    }
  }
}
