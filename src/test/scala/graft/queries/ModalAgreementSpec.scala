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

  test("q95 reads the staged cell assignment, not a corpus-wide recompute (plan-gated)") {
    val df = TextQueries.modalAgreement(spark, sf)
    // the cell frames must scan the staged hive-partitioned store…
    val locs = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.mkString(",")
          case _ => ""
        }
    }
    assert(locs.exists(_.contains("ivf_store")),
      s"cells must come from the staged store, scans: $locs")
    // …and nothing in the report recomputes the assignment window (the
    // band-explode Generate of the staged-signature pair leg is expected)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no assignment-window recompute:\n$plan")
    GraftCheckpoints.releaseAll()
  }
}
