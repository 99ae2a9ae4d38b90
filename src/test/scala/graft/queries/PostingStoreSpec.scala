package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.execution.FileSourceScanExec

/** q76 serving layout: the bucket-partitioned posting store must be read
  * with STATIC partition pruning (queried terms' buckets resolved
  * driver-side, literal partition filter at the store scan — unqueried
  * bucket directories never listed), and the layout must change NOTHING
  * about the per-term stats. */
class PostingStoreSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("term lookup reads only the queried buckets (partition pruning in-plan)") {
    val df = TextQueries.postingLookup(spark, sf)
    df.collect()
    val scan = allPlanNodes(df.queryExecution.executedPlan).collectFirst {
      case f: FileSourceScanExec if f.metadata.get("Location")
        .exists(_.contains("posting_store")) => f
    }.getOrElse(fail("no posting_store scan in plan: " +
      df.queryExecution.executedPlan.toString.take(1200)))
    assert(scan.partitionFilters.exists(_.toString.toLowerCase.contains("bkt")),
      s"expected a bkt partition filter, got: ${scan.partitionFilters}")
    val totalBkts = TextQueries.postingStore(spark, sf)
      .select("bkt").distinct().count()
    val readDirs = scan.metrics("numPartitions").value
    assert(readDirs < totalBkts,
      s"pruning must skip buckets: read $readDirs of $totalBkts")
    assert(readDirs <= TextQueries.Bm25Terms.length.toLong)
  }

  test("pruned-store stats identical to a direct recomputation from the corpus") {
    val fromStore = TextQueries.postingLookup(spark, sf).collect().toSeq
    val direct = TextQueries.termStatsOver(
      TextQueries.postingsOf(graft.model.Pages.documentsPages(spark, sf)),
      TextQueries.Bm25Terms).collect().toSeq
    assert(fromStore === direct)
    assert(fromStore.nonEmpty)
  }
}
