package graft.sql

import graft.model.Pages
import graft.queries.{GeoQueries, TextQueries}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** q66/q67 evidence.
  *
  * q66: write-time spatial clustering (hive-partitioned by z4 tile) must
  * buy scan-time FILE pruning — the partition filters land in the scan
  * node and the scan reads strictly fewer partition directories than the
  * stage holds — while the ROW SET stays identical to an unclustered scan
  * (layout is plan-level only).
  *
  * q67: the rational-BM25 ranking must (a) equal a from-scratch driver
  * recomputation bit-for-bit (only BIGINT products + IEEE add/mul/div in a
  * fixed order), and (b) plan as a distributed top-k over a broadcast one-row
  * stats side — no cartesian, no global sort of the corpus. */
class ClusteredScanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q66: partition pruning fires and reads fewer directories") {
    val z = GeoQueries.ClusterZoom
    val x0 = graft.core.Mercator.tileAt(GeoQueries.ScanLonMin, 0.0, z).x
    val x1 = graft.core.Mercator.tileAt(GeoQueries.ScanLonMax, 0.0, z).x
    val y0 = graft.core.Mercator.tileAt(0.0, GeoQueries.ScanLatMax, z).y
    val y1 = graft.core.Mercator.tileAt(0.0, GeoQueries.ScanLatMin, z).y
    val pruned = GeoQueries.clusteredPages(spark, sf)
      .where(col("x4") >= x0 && col("x4") <= x1 &&
        col("y4") >= y0 && col("y4") <= y1)
    val got = pruned.count()
    assert(got > 0, "scan bbox must cover the hot cluster")

    val scans = pruned.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, pruned.queryExecution.executedPlan.toString.take(800))
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"partition filters must reach the scan: $scan")
    val totalDirs = GeoQueries.clusteredPages(spark, sf)
      .select(col("x4"), col("y4")).distinct().count()
    val readDirs = scan.metrics("numPartitions").value
    assert(readDirs < totalDirs,
      s"pruning must skip directories: read $readDirs of $totalDirs")
  }

  test("q66: clustered result row-identical to the unclustered scan") {
    val clustered = GeoQueries.clusteredScan(spark, sf).collect().toSeq
    val direct = Pages.volumePages(spark, sf)
      .where(col("lon") >= GeoQueries.ScanLonMin && col("lon") < GeoQueries.ScanLonMax &&
        col("lat") >= GeoQueries.ScanLatMin && col("lat") < GeoQueries.ScanLatMax)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), min(col("pid")).as("min_pid"),
        max(col("pid")).as("max_pid"), sum(col("pid")).as("sum_pid"),
        sum(when(col("is_hot"), 1L).otherwise(0L)).as("n_hot"),
        countDistinct(graft.sql.functions.tile_x(
            graft.sql.functions.st_tile(col("lon"), col("lat"), GeoQueries.ClusterZoom)) *
            lit(1L << GeoQueries.ClusterZoom) +
          graft.sql.functions.tile_y(
            graft.sql.functions.st_tile(col("lon"), col("lat"), GeoQueries.ClusterZoom))).as("n_cells"))
      .orderBy(col("lang"))
      .collect().toSeq
    assert(clustered === direct)
  }

  test("q67: BM25 ranking equals a from-scratch driver recomputation") {
    val rows = Pages.documentsPages(spark, sf)
      .select(col("doc_id"), col("text")).collect()
    val terms = TextQueries.Bm25Terms
    val docs = rows.map { r =>
      val toks = r.getString(1).split(" ", -1)
      (r.getLong(0), toks.length.toLong,
        terms.map(t => toks.count(_ == t).toLong))
    }
    val n = docs.length.toLong
    val sumDl = docs.map(_._2).sum
    val dfs = terms.indices.map(i => docs.count(_._3(i) > 0).toLong)
    val scored = docs.map { case (id, dl, tfs) =>
      val s = terms.indices.map { i =>
        val (tf, df) = (tfs(i), dfs(i))
        ((n * 2 - df * 2 + 1).toDouble / (df * 2 + 1).toDouble) *
          ((tf * sumDl * 20).toDouble /
            (tf * sumDl * 8 + sumDl * 3 + dl * n * 9).toDouble)
      }.reduceLeft(_ + _) // same left-assoc order as the plan
      (id, dl, tfs, s)
    }
    val expected = scored.sortBy { case (id, _, _, s) => (-s, id) }
      .take(TextQueries.Bm25TopK).zipWithIndex
      .map { case ((id, dl, tfs, s), i) =>
        (i + 1, id, dl, tfs(0), tfs(1), tfs(2), s) }

    val got = TextQueries.bm25Rank(spark, sf).collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(got === expected.toSeq) // doubles compared EXACTLY — no libm in the score
  }

  test("q67: plan is broadcast stats + distributed top-k, no cartesian") {
    val df = TextQueries.bm25Rank(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(900))
    assert(plan.contains("BroadcastExchange"), plan.take(900))
    assert(!plan.contains("CartesianProduct"), plan.take(900))
  }
}
