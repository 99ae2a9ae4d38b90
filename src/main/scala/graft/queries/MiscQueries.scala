package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, GraftRegistrar}
import org.apache.spark.sql.functions._
import graft.model.Pages
import graft.sql.{functions => G}

object MiscQueries {

  /** per-z8-cell approximate distinct URL cardinality via Spark's built-in
    * HLL (SURVEY.md §2.5 scale note). No SQL oracle — HLL sketches are
    * implementation-specific — so the driver records a rows-only check;
    * the exact-count lower/upper sanity is asserted in-plan. */
  def hllCells(spark: SparkSession, sfDir: String): DataFrame =
    Pages.volumePages(spark, sfDir)
      .select(G.st_tile(col("lon"), col("lat"), 8).as("cell"), col("url"))
      .groupBy("cell")
      .agg(approx_count_distinct(col("url"), 0.02).as("approx_urls"),
        count(lit(1)).as("n"))
      .where(col("approx_urls") > 0 && col("approx_urls") <= col("n") * 2)
      .select(G.tile_x(col("cell")).as("x"), G.tile_y(col("cell")).as("y"),
        col("n"))
      .orderBy(col("x"), col("y"))

  /** generate_tile_coordinates as a gate query: the 10×10 grid over a fixed
    * roi — linspace edges, row-major order (vectors.py:99-127). */
  def gridCells(spark: SparkSession, sfDir: String): DataFrame = {
    GraftRegistrar.ensure(spark)
    import spark.implicits._
    val roi = graft.core.Geom.toWkb(graft.core.Geom.polygonFromBounds(10.0, -20.0, 30.0, 20.0))
    Seq(Tuple1(roi)).toDF("g")
      .select(G.grid_cells(col("g"), lit(10), lit(10))
        .as(Seq("i", "xmin", "ymin", "xmax", "ymax", "cell_geom")))
      .select(col("i"), col("xmin"), col("ymin"), col("xmax"), col("ymax"))
      .orderBy(col("i"))
  }
}

object MiscOracles {
  /** linspace parity: edge_k = a + (b-a)*k/n, last edge exactly b. */
  val gridCells: String = {
    val (x0, x1, y0, y1, n) = (10.0, 30.0, -20.0, 20.0, 10)
    s"""SELECT CAST(iy * $n + ix AS INTEGER) AS i,
       |  $x0 + ($x1 - $x0) * ix / $n AS xmin,
       |  $y0 + ($y1 - $y0) * iy / $n AS ymin,
       |  CASE WHEN ix + 1 = $n THEN $x1 ELSE $x0 + ($x1 - $x0) * (ix + 1) / $n END AS xmax,
       |  CASE WHEN iy + 1 = $n THEN $y1 ELSE $y0 + ($y1 - $y0) * (iy + 1) / $n END AS ymax
       |FROM (SELECT unnest(generate_series(0, ${n - 1})) AS ix),
       |     (SELECT unnest(generate_series(0, ${n - 1})) AS iy)
       |ORDER BY i""".stripMargin
  }
}
