package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints

/** q95 cross-modal agreement: the one-row report recomputes from the two
  * leg frames it joins. */
class ModalAgreementSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("q95 recomputes from the pair and cell frames") {
    val Array(row) = TextQueries.modalAgreement(spark, sf).collect()
    val pairs = TextQueries.minhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cells = EmbQueries.seedAssigned(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    val same = pairs.count { case (a, b) => cells(a) == cells(b) }.toLong
    assert(row.getLong(0) == pairs.length.toLong, "n_pairs")
    assert(row.getLong(1) == same, "n_same_cell")
    assert(row.getLong(2) == same * 10000L / pairs.length, "agree_bp")
    assert(row.getLong(0) > 0, "gate must be non-vacuous")
    GraftCheckpoints.releaseAll()
  }
}
