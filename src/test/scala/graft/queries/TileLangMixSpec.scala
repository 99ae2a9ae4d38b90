package graft.queries

import graft.sql.SparkTestBase

/** q94 geo-language census: tile mass conservation and floor-share
  * algebra per tile. */
class TileLangMixSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("q94 per-tile shares and mass conserve") {
    val out = graft.Queries.tileLangMix(spark, sf).collect()
    assert(out.nonEmpty)
    val total = out.map(_.getLong(3)).sum
    assert(total == graft.model.Pages.volumePages(spark, sf).count(),
      "every page lands in exactly one (tile, lang) row")
    out.groupBy(r => (r.getLong(0), r.getLong(1))).foreach { case (xy, rows) =>
      val n = rows.map(_.getLong(3)).sum
      rows.foreach(r => assert(r.getLong(4) == r.getLong(3) * 10000L / n,
        s"share at $xy/${r.getString(2)}"))
      val shareSum = rows.map(_.getLong(4)).sum
      assert(shareSum <= 10000L && shareSum > 10000L - rows.length,
        s"floor shares at $xy sum to $shareSum")
    }
  }
}
