package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.functions._

/** q115 dedup refine-agreement eval: the one-row report must equal a
  * driver-side recomputation from the two LEG query results (the q87
  * cross-derivation discipline), with the agreement algebra holding. */
class DedupEvalSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val s = df.select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    GraftCheckpoints.releaseAll()
    s
  }

  test("q115 ≡ recomputation from the q18 and q46 leg results") {
    val lsh = pairSet(TextQueries.minhashPairs(spark, sf))
    val ex = pairSet(TextQueries.ngramJaccard(spark, sf))
    val both = lsh.intersect(ex)
    val got = TextQueries.dedupEval(spark, sf).collect()(0)
    GraftCheckpoints.releaseAll()
    assert(got.getLong(0) === lsh.size.toLong)
    assert(got.getLong(1) === ex.size.toLong)
    assert(got.getLong(2) === both.size.toLong)
    assert(got.getLong(3) === both.size.toLong * 10000L / lsh.size)
    assert(got.getLong(4) === both.size.toLong * 10000L / ex.size)
    // agreement algebra
    assert(got.getLong(2) <= math.min(got.getLong(0), got.getLong(1)))
    assert(got.getLong(3) <= 10000L && got.getLong(4) <= 10000L)
    // the corpus actually produces near-dup pairs to evaluate over
    assert(got.getLong(0) > 0L && got.getLong(1) > 0L)
  }
}
