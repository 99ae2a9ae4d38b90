package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Pages, PolygonLayer}
import graft.sql.{functions => G}

/** Anti-join and range-join coverage (SURVEY.md §2.4 join taxonomy). */
object JoinQueries {

  /** pages NOT inside any polygon: broadcast LEFT ANTI with the PIP
    * predicate — the "outside all regions" filter. */
  def antiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val pages = Pages.volumePages(spark, sfDir)
    val polys = PolygonLayer.toDF(spark)
    pages.join(broadcast(polys),
        col("lon") >= col("xmin") && col("lon") <= col("xmax") &&
          col("lat") >= col("ymin") && col("lat") <= col("ymax") &&
          G.st_contains_xy(col("poly"), col("lon"), col("lat")),
        "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), min(col("pid")).as("min_pid"))
      .orderBy(col("lang"))
  }

  /** latitude bands (interval table) ⋈ pages on lat BETWEEN lo AND hi —
    * the non-equi range join; bands are half-open to keep it a partition. */
  val bands: Seq[(Int, Double, Double)] = Seq(
    (1, -90.0, -60.0), (2, -60.0, -30.0), (3, -30.0, 0.0),
    (4, 0.0, 30.0), (5, 30.0, 60.0), (6, 60.0, 90.0))

  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pages = Pages.volumePages(spark, sfDir)
    val bandDf = bands.toDF("band", "lo", "hi")
    pages.join(broadcast(bandDf),
        col("lat") >= col("lo") && col("lat") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), min(col("pid")).as("min_pid"),
        max(col("pid")).as("max_pid"))
      .orderBy(col("band"))
  }
}

object JoinOracles {
  import Pages.PagesSql._

  val antiJoin: String = {
    val anyContains = PolygonLayer.polys.map { case (id, _) =>
      PolygonLayer.containsSql(id, "lon", "lat")
    }.mkString("(", " OR ", ")")
    s"""WITH pages AS (${volumeCte("lineitem")})
       |SELECT lang, count(*) AS n, min(pid) AS min_pid
       |FROM pages WHERE NOT $anyContains
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  val rangeJoin: String = {
    val bandRows = JoinQueries.bands
      .map { case (b, lo, hi) => s"($b, $lo, $hi)" }.mkString(", ")
    s"""WITH pages AS (${volumeCte("lineitem")})
       |SELECT band, count(*) AS n, min(pid) AS min_pid, max(pid) AS max_pid
       |FROM pages JOIN (VALUES $bandRows) AS bands(band, lo, hi)
       |  ON lat >= lo AND lat < hi
       |GROUP BY band ORDER BY band""".stripMargin
  }
}
