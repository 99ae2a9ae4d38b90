package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Pages
import graft.raster.RasterRelation
import graft.sql.{functions => G}

/** Distributed raster-algebra queries over the sparse pixel relation built
  * by rasterizing the pages layers (SURVEY.md §2.5 merge semantics at
  * scale). */
object RasterQueries {

  /** two source layers: even pids (src 0) and odd pids (src 1), rasterized
    * to z10 count grids. */
  private def pixelLayers(spark: SparkSession, sfDir: String): DataFrame = {
    val pages = Pages.volumePages(spark, sfDir)
      .select(col("pid"), G.st_tile(col("lon"), col("lat"), 10).as("cell"))
      .withColumn("src", pmod(col("pid"), lit(2)).cast("int"))
    pages.groupBy(col("cell"), col("src")).agg(count(lit(1)).as("value"))
  }

  /** merge_two FIRST: per pixel the even layer wins where present
    * (ordered coalesce, georaster.py:220-235/322-365 at scale). */
  def mergeFirstWins(spark: SparkSession, sfDir: String): DataFrame =
    RasterRelation.mergeFirstWins(pixelLayers(spark, sfDir))
      .select(G.tile_x(col("cell")).as("x"), G.tile_y(col("cell")).as("y"),
        col("src"), col("value"))
      .orderBy(col("x"), col("y"))

  /** INDEX pixel strategy (georaster.py:187-208): first contributing source
    * ordinal per pixel. */
  def mergeIndex(spark: SparkSession, sfDir: String): DataFrame =
    RasterRelation.mergeIndex(pixelLayers(spark, sfDir))
      .select(G.tile_x(col("cell")).as("x"), G.tile_y(col("cell")).as("y"),
        col("idx"), col("n_sources"))
      .orderBy(col("x"), col("y"))

  /** Histogram of the merged count raster (georaster.py:1802-1815 at
    * scale): pixel value → frequency. */
  def histogram(spark: SparkSession, sfDir: String): DataFrame =
    RasterRelation.histogram(
        RasterRelation.mergeFirstWins(pixelLayers(spark, sfDir)))
      .orderBy(col("value"))
}

object RasterOracles {
  import Pages.PagesSql._

  private def layers: String =
    s"""WITH pages AS (${volumeCte("lineitem")}),
       |px AS (
       |  SELECT cell_x AS x, cell_y AS y, CAST(pid % 2 AS INTEGER) AS src, count(*) AS value
       |  FROM (SELECT pid, ${tileXSql("lon", 10)} AS cell_x, ${tileYSql("lat", 10)} AS cell_y
       |        FROM pages)
       |  GROUP BY 1, 2, 3
       |)""".stripMargin

  val mergeFirstWins: String =
    s"""$layers
       |SELECT x, y, CAST(arg_min(src, src) AS INTEGER) AS src,
       |       arg_min(value, src) AS value
       |FROM px GROUP BY x, y ORDER BY x, y""".stripMargin

  val mergeIndex: String =
    s"""$layers
       |SELECT x, y, CAST(min(src) AS INTEGER) AS idx, count(*) AS n_sources
       |FROM px GROUP BY x, y ORDER BY x, y""".stripMargin

  val histogram: String =
    s"""$layers
       |SELECT value, count(*) AS freq FROM (
       |  SELECT x, y, arg_min(value, src) AS value FROM px GROUP BY x, y
       |) GROUP BY value ORDER BY value""".stripMargin
}
