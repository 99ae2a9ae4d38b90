package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints

/** q93 cluster balance: the census covers every vector exactly once, the
  * equalization algebra recomputes, and applying the keep rates flattens
  * the mixture (expected post-sample mass per cell ≤ the equal target). */
class ClusterBalanceSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("q93 census + equalization algebra") {
    val out = EmbQueries.clusterBalance(spark, sf).collect()
    assert(out.nonEmpty)
    val nTotal = out.map(_.getLong(1)).sum
    assert(nTotal == spark.read.parquet(s"$sf/embeddings.parquet").count(),
      "every vector lands in exactly one cell")
    val nCells = out.length.toLong
    val target = (nTotal + nCells - 1) / nCells
    out.foreach { r =>
      val (n, share, keep) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(share == n * 10000L / nTotal)
      assert(keep == math.min(10000L, target * 10000L / n))
      // expected kept mass per cell never exceeds the equal target
      // (integer floor: n·keep/10⁴ ≤ target)
      assert(n * keep / 10000L <= target, s"cell ${r.getInt(0)} over target")
      // and cells at-or-under target keep everything
      if (n <= target) assert(keep == 10000L, s"cell ${r.getInt(0)} must keep all")
    }
    GraftCheckpoints.releaseAll()
  }

  test("q93 census reads the staged store — no window/generate recompute (plan-gated)") {
    // the pre-checkpoint builder hook (the eager checkpoint hides the
    // census plan from the final frame): its scan must be the staged
    // hive-partitioned ivf_store parquet, never a seedAssigned recompute
    val plan = EmbQueries.clusterCensusOf(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"census must not recompute the assignment window:\n$plan")
    assert(!plan.contains("Generate"), s"census must not re-explode seed dots:\n$plan")
    assert(plan.contains("ivf_store"), s"census must scan the staged store:\n$plan")
  }
}
