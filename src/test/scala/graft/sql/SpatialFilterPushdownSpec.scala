package graft.sql

import java.nio.file.Files

import graft.core.Geom
import graft.sql.{functions => G}
import org.apache.spark.sql.functions._

/** The SpatialFilterPushdown optimizer rule: `st_contains_xy(lit, lon,
  * lat)` filters gain bbox range conjuncts that reach the parquet scan as
  * PushedFilters (row-group data skipping), without changing the result
  * set, and without accumulating duplicates across optimizer fixpoint
  * iterations. */
class SpatialFilterPushdownSpec extends SparkTestBase {
  import spark.implicits._

  private val poly = Geom.polygon(
    (10.0, 10.0), (20.0, 10.0), (20.0, 20.0), (10.0, 20.0))
  private val wkb = Geom.toWkb(poly)

  private lazy val dir: String = {
    val d = Files.createTempDirectory("sfp").toString
    // 40×40 lattice spanning [0,40)² — 1/16 of it inside the polygon
    (0 until 1600).map(i => (i.toLong, (i % 40).toDouble + 0.5, (i / 40).toDouble + 0.5))
      .toDF("id", "lon", "lat").write.parquet(s"$d/pts.parquet")
    s"$d/pts.parquet"
  }

  test("filter results are unchanged and the bbox reaches the scan as PushedFilters") {
    val df = spark.read.parquet(dir)
      .where(G.st_contains_xy(lit(wkb), col("lon"), col("lat")))
    val ids = df.select(col("id")).collect().map(_.getLong(0)).toSet
    val expected = (0 until 1600).filter { i =>
      val (x, y) = ((i % 40).toDouble + 0.5, (i / 40).toDouble + 0.5)
      Geom.contains(x, y, poly)
    }.map(_.toLong).toSet
    assert(ids === expected && ids.size === 100)

    // the explain string truncates PushedFilters — read them off the scan
    val pushed = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.dataFilters
    }.flatten.map(_.sql)
    assert(pushed.exists(_.contains("lon >= 10.0")) &&
      pushed.exists(_.contains("lon <= 20.0")) &&
      pushed.exists(_.contains("lat >= 10.0")) &&
      pushed.exists(_.contains("lat <= 20.0")),
      s"bbox conjuncts must reach the scan, got: $pushed")
  }

  test("rule is idempotent across fixpoint iterations (no duplicate conjuncts)") {
    val df = spark.read.parquet(dir)
      .where(G.st_contains_xy(lit(wkb), col("lon"), col("lat")))
    val cond = df.queryExecution.optimizedPlan.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.get
    def split(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => split(l) ++ split(r)
      case x => Seq(x)
    }
    val parts = split(cond)
    // distinct-by-semantic-equality must not shrink the list
    val dedup = parts.foldLeft(Seq.empty[org.apache.spark.sql.catalyst.expressions.Expression]) {
      (acc, e) => if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
    }
    assert(parts.size === dedup.size, s"duplicated conjuncts in: $cond")
  }

  test("pushed bbox actually skips row groups on a lat-sorted table") {
    val d = Files.createTempDirectory("sfp_rg").toString
    // 120k rows sorted by lat over [0,60), written in many small row
    // groups so each group's lat min/max stats span ~0.5 degrees
    (0 until 120000).map(i => (i.toLong, (i % 360).toDouble - 180.0, i / 2000.0))
      .toDF("id", "lon", "lat").coalesce(1).sortWithinPartitions("lat")
      .write.option("parquet.block.size", 64 * 1024).parquet(s"$d/pts.parquet")
    val df = spark.read.parquet(s"$d/pts.parquet")
      .where(G.st_contains_xy(lit(wkb), col("lon"), col("lat")))
    df.collect()
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val emitted = scan.metrics("numOutputRows").value
    // polygon lat range [10,20] = 1/6 of the data; with stats-based
    // row-group skipping the scan must emit FAR fewer than 120k rows
    assert(emitted > 0 && emitted < 60000,
      s"row-group skipping should cut the scan's output, got $emitted")
  }

  test("packed-ring literal form gains the same pruning") {
    val xs = poly.shell.map(_.x)
    val ys = poly.shell.map(_.y)
    val df = spark.read.parquet(dir)
      .where(G.st_contains_ring(lit(xs), lit(ys), col("lon"), col("lat")))
    assert(df.count() === 100)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(lon,10.0)"), s"ring bbox pushdown:\n$scan")
  }
}
