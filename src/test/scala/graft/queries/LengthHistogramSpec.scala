package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._

/** q90 length histogram: bucket algebra, cumulative consistency, and the
  * broadcast bucket-join plan (no corpus-wide range shuffle). */
class LengthHistogramSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("q90 buckets partition the corpus; cumulatives are consistent") {
    val out = QualityQueries.lengthHistogram(spark, sf).collect()
    assert(out.nonEmpty)
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(_.getLong(0))
    // every doc lands in exactly one bucket
    assert(out.map(_.getLong(2)).sum == lens.length.toLong)
    assert(out.map(_.getLong(3)).sum == lens.sum)
    var cum = 0L
    out.foreach { r =>
      val (k, hi, nDocs, nTok) = (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val lo = if (k == 0) 0L else hi / 2
      val inBucket = lens.filter(n => n > lo && n <= hi)
      assert(nDocs == inBucket.length.toLong, s"bucket $k docs")
      assert(nTok == inBucket.sum, s"bucket $k tokens")
      cum += nTok
      assert(r.getLong(4) == cum, s"bucket $k cum_tokens")
      assert(r.getLong(5) == cum * 10000L / lens.sum, s"bucket $k cum_bp")
    }
    // last bucket's cumulative share is the whole corpus
    assert(out.last.getLong(5) == 10000L)
  }

  test("q90 catch-all: docs beyond the last power of two still count") {
    import spark.implicits._
    val lens = Seq(10L, 40000L, 1000000L).toDF("n_words")
    val out = QualityQueries.lengthHistogramOf(spark, lens).collect()
    assert(out.map(_.getLong(3)).sum == 1040010L, "no token mass may vanish")
    val last = out.last
    assert(last.getInt(0) == QualityQueries.LenBuckets - 1)
    assert(last.getLong(2) == 2L, "both over-long docs land in the catch-all")
    assert(last.getLong(5) == 10000L)
  }

  test("q90 plan: bucket table broadcasts; corpus never range-shuffles") {
    val df = QualityQueries.lengthHistogram(spark, sf)
    val nodes = allPlanNodes(df.queryExecution.executedPlan).map(_.nodeName)
    assert(nodes.exists(_.contains("BroadcastNestedLoopJoin")),
      s"16-row bucket table must broadcast, got $nodes")
    assert(!nodes.exists(_.contains("SortMergeJoin")),
      "the corpus side must never shuffle for the bucket join")
  }
}
