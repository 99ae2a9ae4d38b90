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

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
  }

  test("trained quantizer stages once; warm replay and crash-resume are bit-exact") {
    val (aDir, cDir) = EmbQueries.ivfStageDirs(sf)
    rmTree(aDir); rmTree(cDir)
    // cold: trains, publishes BOTH tables (centroids before assignment)
    val cold = EmbQueries.ivfAnn(spark, sf).collect().toSeq
    assert(cold.nonEmpty)
    assert(StageCache.isPublished(aDir), "assignment not staged after cold run")
    assert(StageCache.isPublished(cDir), "centroids not staged after cold run")
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    // warm: must come from the staged bytes, value-identical (parquet
    // round-trips the integer-mean doubles exactly — the oracle contract)
    val warm = EmbQueries.ivfAnn(spark, sf).collect().toSeq
    assert(warm === cold)
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    // crash between the two publishes: centroids landed, assignment didn't
    // (the only state the publish ordering permits) — a rerun retrains and
    // republishes the assignment, same values
    rmTree(aDir)
    val resumed = EmbQueries.ivfAnn(spark, sf).collect().toSeq
    assert(StageCache.isPublished(aDir), "assignment not re-staged on resume")
    assert(resumed === cold)
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
  }
}
