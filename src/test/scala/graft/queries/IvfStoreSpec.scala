package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.execution.FileSourceScanExec

/** The IVF serving layout: the cell-partitioned embeddings store must be
  * read with STATIC partition pruning (the probe batch's nprobe cells are
  * resolved driver-side and reach the store scan as a literal partition
  * filter — the inverted-list access pattern; unprobed directories are
  * never listed), and the layout must change NOTHING about the results. */
class IvfStoreSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def storeScan(plan: org.apache.spark.sql.execution.SparkPlan) =
    allPlanNodes(plan).collectFirst {
      case f: FileSourceScanExec if f.metadata.get("Location")
        .exists(_.contains("ivf_store")) => f
    }

  test("store search reads only the probed cells (partition pruning in-plan)") {
    val df = EmbQueries.ivfStoreSearch(spark, sf)
    df.collect()
    val scan = storeScan(df.queryExecution.executedPlan).getOrElse(
      fail("no ivf_store scan in plan: " +
        df.queryExecution.executedPlan.toString.take(1200)))
    assert(scan.partitionFilters.exists(_.toString.toLowerCase.contains("cell")),
      s"expected a cell partition filter, got: ${scan.partitionFilters}")
    val totalCells = EmbQueries.ivfStore(spark, sf)
      .select("cell").distinct().count()
    val readDirs = scan.metrics("numPartitions").value
    assert(readDirs < totalCells,
      s"pruning must skip cells: read $readDirs of $totalCells")
    // the probe set touches at most NumProbes * IvfNProbe distinct cells
    assert(readDirs <= EmbQueries.NumProbes.toLong * EmbQueries.IvfNProbe)
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
  }

  test("partitioned-store results identical to the unpartitioned path") {
    val fromStore = EmbQueries.ivfStoreSearch(spark, sf).collect().toSeq
    val direct = EmbQueries.ivfSearchOver(
      EmbQueries.seedAssigned(spark, sf),
      EmbQueries.probeCells(spark, sf)).collect().toSeq
    assert(fromStore === direct)
    assert(fromStore.nonEmpty)
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
  }
}
