package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, GraftRegistrar}
import org.apache.spark.sql.functions._
import graft.model.Pages
import graft.sql.{functions => G}

object MiscQueries {

  /** per-z8-cell approximate distinct cardinality via Spark's built-in HLL,
    * now ORACLE-GATED (VERDICT r2 "What's missing" #2): the sketch value
    * itself is engine-specific, so the gate outputs the EXACT distinct
    * count beside an in-plan assertion that the sketch landed within the
    * error envelope |approx−exact| ≤ max(exact/4, 4). Measured HLL++
    * (rsd 0.02) error on this data: ≤1 absolute at sf0.01, ≤3 at sf0.1
    * (sparse-mode hash collisions put ±1 even on 2-element sets, so a pure
    * relative bound cannot hold); the envelope is deterministic — same
    * hashes, same sketch — so the boolean is reproducibly TRUE on both
    * sides. The distinct key is a derived mirror host (pid % 5000) — the
    * raw url is unique per page, which would make exact ≡ n and the
    * distinct aggregation vacuous. */
  def hllCells(spark: SparkSession, sfDir: String): DataFrame =
    Pages.volumePages(spark, sfDir)
      .select(G.st_tile(col("lon"), col("lat"), 8).as("cell"),
        concat(lit("https://m.example.com/p/"),
          pmod(col("pid"), lit(5000L)).cast("string")).as("mirror_url"))
      .groupBy("cell")
      .agg(approx_count_distinct(col("mirror_url"), 0.02).as("approx_urls"),
        countDistinct(col("mirror_url")).as("n_urls"),
        count(lit(1)).as("n"))
      .select(G.tile_x(col("cell")).as("x"), G.tile_y(col("cell")).as("y"),
        col("n"), col("n_urls"),
        (abs(col("approx_urls") - col("n_urls")) * 4 <=
          greatest(col("n_urls"), lit(16L))).as("approx_ok"))
      .orderBy(col("x"), col("y"))

  /** exterior + coords accessors as a gate query (vectors.py:68-80): the
    * polygon pages' bbox shells, decomposed back to numbers the oracle
    * reproduces with the same fold order. */
  def exteriorCoords(spark: SparkSession, sfDir: String): DataFrame = {
    GraftRegistrar.ensure(spark)
    val polys = Pages.polygonPages(spark, sfDir)
      .select(col("pid"),
        G.st_coords(G.st_exterior(
          G.st_makebbox(col("xmin"), col("ymin"), col("xmax"), col("ymax")))).as("cs"))
    polys.select(col("pid"),
        size(col("cs")).as("n_pts"),
        element_at(element_at(col("cs"), 1), 1).as("x0"),
        element_at(element_at(col("cs"), 1), 2).as("y0"),
        aggregate(transform(col("cs"), c => element_at(c, 1)), lit(0.0), (a, x) => a + x).as("sx"),
        aggregate(transform(col("cs"), c => element_at(c, 2)), lit(0.0), (a, y) => a + y).as("sy"))
      .orderBy(col("pid"))
  }

  /** st_relate DE-9IM strings as a gate query: polygon pages vs the layer's
    * poly 1 box — for axis-aligned boxes with no shared coordinates the
    * matrix is one of disjoint/overlap/within, which the oracle classifies
    * by pure coordinate comparisons. */
  def relateClasses(spark: SparkSession, sfDir: String): DataFrame = {
    GraftRegistrar.ensure(spark)
    val probe = graft.model.PolygonLayer.wkb(1)
    Pages.polygonPages(spark, sfDir)
      .select(col("pid"),
        G.st_relate(G.st_makebbox(col("xmin"), col("ymin"), col("xmax"), col("ymax")),
          lit(probe)).as("de9im"))
      .groupBy(col("de9im"))
      .agg(count(lit(1)).as("n"), min(col("pid")).as("min_pid"))
      .orderBy(col("de9im"))
  }

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

  /** fiona-schema date coercion gate (features.py:22-44): feature records
    * carry STRING temporal properties (as a GeoJSON/shapefile read would);
    * SchemaRules.transformProperties coerces them per the declared fiona
    * schema, and the aggregation runs over the COERCED types (year() on
    * DateType, unix_micros on TimestampType, int ordering on seconds-of-
    * day) so the parse itself faces the oracle. */
  def fionaDates(spark: SparkSession, sfDir: String): DataFrame = {
    val recs = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("fid"), col("o_orderdate"))
      .withColumn("alarm_s", pmod(col("fid") * 7L, lit(86400L)))
      .select(col("fid"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        date_format(expr("timestampadd(SECOND, fid % 86400, o_orderdate)"),
          "yyyy-MM-dd'T'HH:mm:ss").as("pickup"),
        concat(
          lpad((col("alarm_s") / 3600).cast("long").cast("string"), 2, "0"), lit(":"),
          lpad(((col("alarm_s") / 60).cast("long") % 60).cast("string"), 2, "0"), lit(":"),
          lpad((col("alarm_s") % 60).cast("string"), 2, "0")).as("alarm"))
    val coerced = graft.ops.SchemaRules.transformProperties(recs,
      Seq("order_date" -> "date", "pickup" -> "datetime", "alarm" -> "time"))
    coerced.groupBy(year(col("order_date")).as("yr"))
      .agg(count(lit(1)).as("n"),
        min(unix_micros(col("pickup"))).as("min_pickup_us"),
        max(unix_micros(col("pickup"))).as("max_pickup_us"),
        min(col("alarm")).as("min_alarm_s"),
        max(col("alarm")).as("max_alarm_s"),
        max(date_format(col("order_date"), "yyyy-MM-dd")).as("max_ds"))
      .orderBy(col("yr"))
  }
}

object MiscOracles {

  /** exact distinct per cell; the HLL envelope boolean is the constant the
    * Spark side must also produce (the assertion runs in-plan there). */
  val hllCells: String = {
    import Pages.PagesSql._
    s"""WITH pages AS (${Pages.PagesSql.volumeCte("lineitem")})
       |SELECT ${tileXSql("lon", 8)} AS x, ${tileYSql("lat", 8)} AS y,
       |       count(*) AS n,
       |       count(DISTINCT 'https://m.example.com/p/' || CAST(pid % 5000 AS VARCHAR)) AS n_urls,
       |       TRUE AS approx_ok
       |FROM pages GROUP BY 1, 2 ORDER BY x, y""".stripMargin
  }

  private def withPolys(body: String): String =
    s"""WITH pages AS (${Pages.PagesSql.volumeCte("lineitem")}),
       |polys AS (${Pages.PagesSql.polygonCte("lineitem")})
       |$body""".stripMargin

  /** explicit parenthesization mirrors the Spark aggregate() left fold over
    * the bbox shell [(xmin,ymin),(xmin,ymax),(xmax,ymax),(xmax,ymin),
    * (xmin,ymin)] — float addition is not associative. */
  val exteriorCoords: String = withPolys(
    """SELECT pid, CAST(5 AS INTEGER) AS n_pts, xmin AS x0, ymin AS y0,
      |  ((((0.0 + xmin) + xmin) + xmax) + xmax) + xmin AS sx,
      |  ((((0.0 + ymin) + ymax) + ymax) + ymin) + ymin AS sy
      |FROM polys ORDER BY pid""".stripMargin)

  /** DE-9IM classification of two axis-aligned boxes that share no
    * coordinate (page coords sit on the 1e-6 lattice ± w; the layer's
    * vertices are offset by 5e-7): only disjoint / strictly-within /
    * proper-overlap can occur, each with a fixed matrix. */
  val relateClasses: String = {
    val vs = graft.model.PolygonLayer.polys.find(_._1 == 1).get._2
    val (pxmin, pxmax) = (vs.map(_._1).min, vs.map(_._1).max)
    val (pymin, pymax) = (vs.map(_._2).min, vs.map(_._2).max)
    withPolys(
      s"""SELECT de9im, count(*) AS n, min(pid) AS min_pid FROM (
         |  SELECT pid,
         |    CASE WHEN xmax < $pxmin OR xmin > $pxmax OR ymax < $pymin OR ymin > $pymax
         |           THEN 'FF2FF1212'
         |         WHEN xmin > $pxmin AND xmax < $pxmax AND ymin > $pymin AND ymax < $pymax
         |           THEN '2FF1FF212'
         |         ELSE '212101212' END AS de9im
         |  FROM polys
         |) GROUP BY de9im ORDER BY de9im""".stripMargin)
  }

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

  /** both sides build the same strings from the same integers, then parse:
    * the round-trip IS the check. epoch of a DuckDB TIME is seconds-of-day
    * — the same ordinal transformProperties produces. */
  val fionaDates: String =
    """WITH recs AS (
      |  SELECT o_orderkey AS fid,
      |    strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |    strftime(o_orderdate + ((o_orderkey % 86400) * INTERVAL 1 SECOND), '%Y-%m-%dT%H:%M:%S') AS pickup,
      |    lpad(CAST(((o_orderkey * 7) % 86400) // 3600 AS VARCHAR), 2, '0') || ':' ||
      |    lpad(CAST((((o_orderkey * 7) % 86400) // 60) % 60 AS VARCHAR), 2, '0') || ':' ||
      |    lpad(CAST(((o_orderkey * 7) % 86400) % 60 AS VARCHAR), 2, '0') AS alarm
      |  FROM orders),
      |coerced AS (
      |  SELECT fid, CAST(order_date AS DATE) AS order_date,
      |    CAST(pickup AS TIMESTAMP) AS pickup,
      |    CAST(EXTRACT(epoch FROM CAST(alarm AS TIME)) AS INTEGER) AS alarm
      |  FROM recs)
      |SELECT CAST(EXTRACT(year FROM order_date) AS INTEGER) AS yr, count(*) AS n,
      |  CAST(min(epoch_us(pickup)) AS BIGINT) AS min_pickup_us,
      |  CAST(max(epoch_us(pickup)) AS BIGINT) AS max_pickup_us,
      |  min(alarm) AS min_alarm_s, max(alarm) AS max_alarm_s,
      |  max(strftime(order_date, '%Y-%m-%d')) AS max_ds
      |FROM coerced GROUP BY yr ORDER BY yr""".stripMargin
}
