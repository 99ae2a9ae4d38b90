package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.functions._

/** q99 Johnson–Lindenstrauss projection (64 float dims → 16 BIGINT dims):
  * planted-twin preservation, the BIGINT overflow audit the scaladoc
  * claims, partitioning invariance of the integer chain, and the
  * broadcast-only join shape. */
class JlProjectSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  /** corpus + an exact twin (id+10M) for every vec_id % 50 == 0. */
  private def withTwins = {
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    base.unionAll(base.where(pmod(col("vec_id"), lit(50L)) === 0)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding")))
  }

  test("planted exact twins rank top-1 in projected space") {
    val probe = pmod(col("vec_id"), lit(50L)) === 0 && col("vec_id") < 10000000L
    val top = EmbQueries.jlTopK(withTwins, probe).collect()
    val rank1 = top.filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rank1.nonEmpty, "fixture must contain probes")
    rank1.foreach { case (qid, top1) =>
      assert(top1 === qid + 10000000L,
        s"identical embeddings project identically — twin of $qid must rank 1")
    }
    GraftCheckpoints.releaseAll()
  }

  test("integer chain stays in the audited BIGINT envelope") {
    val maxAbsY = 64L * 63L * 1000L           // |code| ≤ 63, |w| ≤ 1000, 64 terms
    val maxNorm2 = 16L * maxAbsY * maxAbsY    // < 2^53: the double cast is exact
    assert(maxNorm2 < (1L << 53))
    val proj = EmbQueries.jlProjected(withTwins)
    val seen = proj.select(
      max(aggregate(col("proj"), lit(0L),
        (a, y) => greatest(a, abs(y)))).as("my"),
      max(col("norm2")).as("mn")).collect()(0)
    assert(seen.getLong(0) <= maxAbsY)
    assert(seen.getLong(1) <= maxNorm2)
    GraftCheckpoints.releaseAll()
  }

  test("projection is partitioning-invariant (associative BIGINT sums)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = EmbQueries.jlTopK(emb, col("vec_id") < 3)
      .orderBy(col("qid"), col("rank")).collect()
    val b = EmbQueries.jlTopK(emb.repartition(7), col("vec_id") < 3)
      .orderBy(col("qid"), col("rank")).collect()
    assert(a.toSeq === b.toSeq)
    GraftCheckpoints.releaseAll()
  }

  test("q99 plan: probes broadcast, no cartesian corpus product") {
    val df = EmbQueries.jlProject(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "the only nested loop allowed is against the ≤NumProbes-row broadcast")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "probe side must broadcast")
    GraftCheckpoints.releaseAll()
  }
}
