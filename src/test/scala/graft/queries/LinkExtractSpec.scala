package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._

/** q88 outlink extraction: the regex-extracted graph must equal the
  * arithmetic edge table q74 ranks (non-circular cross-validation — the
  * two derivations share no code path), both resolution branches fire,
  * and the plan stays join/aggregate-free. */
class LinkExtractSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("q88 extracted graph ≡ the arithmetic edge table; both URL forms resolve") {
    val out = GraphQueries.linkExtract(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    val expected = GraphQueries.edges(spark, sf, n)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, "extracted edges must equal the edge arithmetic")
    assert(out.length == expected.size, "no duplicate extractions")
    // every dst_url is absolute after resolution, for both injected forms
    assert(out.forall(_.getString(2).startsWith("https://example.org/d/")))
  }

  test("q88 plan: pure map-side extract — no join, no aggregate") {
    val df = GraphQueries.linkExtract(spark, sf)
    val nodes = allPlanNodes(df.queryExecution.executedPlan).map(_.nodeName)
    assert(!nodes.exists(n => n.contains("Join") || n.contains("HashAggregate")),
      s"link extraction must stay embarrassingly parallel, got: $nodes")
  }
}
