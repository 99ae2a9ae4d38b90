package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._

/** q98 anchor-text aggregation: the per-target rollup must agree with a
  * full driver-side recomputation from the edge arithmetic (the anchors
  * are synthesized from [[GraphQueries.Offsets]], so the expected
  * (dst, text) multiset is closed-form), including the modal tie-break
  * (count desc, text asc) and the in-link mass. */
class AnchorTextSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("q98 ≡ driver recomputation from the edge arithmetic") {
    val docs = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val n = docs.length.toLong
    // expected (dst, anchor) pairs straight from the q88 synthesis rules
    val pairs = docs.flatMap { src =>
      val offs = GraphQueries.Offsets.take(1 + (src % 3).toInt)
      val text = s"t${src % GraphQueries.AnchorMod}"
      offs.map(o => ((src + o) % n, text))
    }
    val expected = pairs.groupBy(_._1).map { case (dst, ps) =>
      val counts = ps.groupBy(_._2).map { case (t, xs) => (t, xs.length.toLong) }
      val (topText, topCnt) = counts.toSeq
        .sortBy { case (t, c) => (-c, t) }.head
      dst -> ((ps.length.toLong, counts.size.toLong, topText, topCnt))
    }

    val got = GraphQueries.anchorText(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (dst, e) =>
      assert(got(dst) === e, s"dst=$dst")
    }
    // mass conservation: every synthesized anchor lands in exactly one rollup
    assert(got.values.map(_._1).sum === pairs.length.toLong)
    // tie-break sanity: the modal count never exceeds the in-link count
    assert(got.values.forall { case (inl, _, _, top) => top <= inl })
  }

  test("q98 extraction ≡ q88 edge set (href side unchanged by anchor text)") {
    val n = graft.model.Pages.documentsPages(spark, sf).count()
    val fromEdges = GraphQueries.edges(spark, sf, n)
      .groupBy(col("dst")).agg(count(lit(1)).as("indeg"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = GraphQueries.anchorText(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === fromEdges, "in_links must equal the q74 edge in-degree")
  }
}
