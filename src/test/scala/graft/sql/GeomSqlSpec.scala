package graft.sql

import graft.core.Geom
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.sql.{functions => G}

/** End-to-end Catalyst expression tests, mirroring the reference's
  * delegated-op sweeps (tests/test_geovector.py:254-309) and tile goldens
  * (tests/test_geovector.py:551-566) through Spark plans. */
class GeomSqlSpec extends SparkTestBase {
  import spark.implicits._

  private def wkb(g: Geom.Geometry): Array[Byte] = Geom.toWkb(g)

  test("st_point / st_x / st_y round-trip through a plan") {
    val df = Seq((1.5, -2.25), (109.6153, 40.8655)).toDF("lon", "lat")
      .select(G.st_point($"lon", $"lat").as("g"))
      .select(G.st_x($"g").as("x"), G.st_y($"g").as("y"))
    assert(df.collect().toSeq.map(r => (r.getDouble(0), r.getDouble(1))) ===
      Seq((1.5, -2.25), (109.6153, 40.8655)))
  }

  test("binary ops on overlapping squares (test_geovector.py:284-309)") {
    val a = wkb(Geom.polygonFromBounds(0, 0, 1, 1))
    val b = wkb(Geom.polygonFromBounds(0.5, 0, 1.5, 1))
    val df = Seq((a, b)).toDF("a", "b").select(
      G.st_area(G.st_intersection($"a", $"b")).as("inter"),
      G.st_area(G.st_union($"a", $"b")).as("uni"),
      G.st_area(G.st_difference($"a", $"b")).as("diff"),
      G.st_area(G.st_symdifference($"a", $"b")).as("sym"),
      G.st_intersects($"a", $"b").as("ints"),
      G.st_overlaps($"a", $"b").as("ovl"),
      G.st_touches($"a", $"b").as("tch"),
      G.st_contains($"a", $"b").as("cnt"))
    val r = df.collect().head
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.5) < 1e-12)
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
    assert(r.getBoolean(4) && r.getBoolean(5) && !r.getBoolean(6) && !r.getBoolean(7))
  }

  test("st_contains ray-cast vs points — hot path") {
    val poly = wkb(Geom.polygon((0, 0), (2, -1), (4, 0), (3, 3), (1, 3)))
    val pts = Seq((2.0, 1.0, true), (3.9, 2.9, false), (0.5, -0.5, false), (2.0, 2.9, true))
    val df = pts.toDF("x", "y", "expected")
      .select($"expected", G.st_contains(lit(poly), G.st_point($"x", $"y")).as("got"))
    assert(df.collect().forall(r => r.getBoolean(0) == r.getBoolean(1)))
  }

  test("tiles_for generator reproduces the baotou golden (test_geovector.py:551-566)") {
    val aoi = wkb(Geom.polygon(
      (109.612458654485849, 40.867336965196827),
      (109.619116438865731, 40.867336965196827),
      (109.61872894876953, 40.864459877761597),
      (109.612599559975365, 40.864326676241866)))
    val rows = Seq(Tuple1(aoi)).toDF("g")
      .select(G.tiles_for($"g", array(lit(15), lit(16))).as(Seq("cell","x","y","z")))
      .select("x", "y", "z")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows === Seq((26361L, 12301L, 15), (52722L, 24603L, 16), (52723L, 24603L, 16)))
  }

  test("st_tile + accessors match tilesFor on points") {
    val df = Seq((109.6153, 40.8655)).toDF("lon", "lat")
      .select(G.st_tile($"lon", $"lat", 15).as("cell"))
      .select(G.tile_x($"cell"), G.tile_y($"cell"), G.tile_z($"cell"))
    assert(df.collect().head === Row(26361L, 12301L, 15))
  }

  test("grid_cells golden order (test_geovector.py:312-325)") {
    val roi = wkb(Geom.polygonFromBounds(0, 0, 1, 2))
    val rows = Seq(Tuple1(roi)).toDF("g")
      .select(G.grid_cells($"g", lit(10), lit(10)).as(Seq("i","xmin","ymin","xmax","ymax","cell_geom")))
      .select("i", "xmin", "ymin")
      .collect()
    assert(rows.length === 100)
    rows.foreach { r =>
      val i = r.getInt(0)
      assert(math.abs(r.getDouble(1) - (i % 10) * 0.1) < 1e-9)
      assert(math.abs(r.getDouble(2) - (i / 10) * 0.2) < 1e-9)
    }
  }

  test("envelope agg and union agg (cascaded_union/dissolve semantics)") {
    val polys = Seq(
      wkb(Geom.polygonFromBounds(0, 0, 1, 1)),
      wkb(Geom.polygonFromBounds(2, 0, 3, 1)),
      wkb(Geom.polygonFromBounds(0.5, 0, 1.5, 1)))
    val df = polys.toDF("g")
    val env = df.agg(G.st_envelope_agg($"g").as("e"))
      .select(G.st_xmin($"e"), G.st_ymin($"e"), G.st_xmax($"e"), G.st_ymax($"e"))
      .collect().head
    assert(env === Row(0.0, 0.0, 3.0, 1.0))
    val uniArea = df.agg(G.st_area(G.st_union_agg($"g")).as("a")).collect().head.getDouble(0)
    assert(math.abs(uniArea - 2.5) < 1e-9) // 1.5 merged strip + 1.0 island
  }

  test("union agg drops invalid geometries silently (vectors.py:390-403)") {
    // bowtie = self-intersecting, invalid
    val bowtie = wkb(Geom.polygon((0, 0), (1, 1), (1, 0), (0, 1)))
    val ok = wkb(Geom.polygonFromBounds(5, 5, 6, 6))
    val area = Seq(bowtie, ok).toDF("g")
      .agg(G.st_area(G.st_union_agg($"g"))).collect().head.getDouble(0)
    assert(math.abs(area - 1.0) < 1e-9)
  }

  test("st_transform closed form matches Mercator anchors") {
    val p = wkb(Geom.GPoint(180.0, 0.0))
    val r = Seq(Tuple1(p)).toDF("g")
      .select(G.st_transform($"g", lit(4326), lit(3857)).as("m"))
      .select(G.st_x($"m"), G.st_y($"m")).collect().head
    assert(math.abs(r.getDouble(0) - 20037508.342789244) < 1e-6)
    assert(math.abs(r.getDouble(1)) < 1e-9)
  }

  test("SQL-string surface works via extensions") {
    val n = spark.sql(
      """SELECT tile_x(st_tile(109.6153d, 40.8655d, 15)) AS x""").collect().head.getLong(0)
    assert(n === 26361L)
  }

  test("buffer/polygonize semantics: point→round cap area ≈ πr² (vectors.py:506-520)") {
    val pt = wkb(Geom.GPoint(0, 0))
    val area = Seq(Tuple1(pt)).toDF("g")
      .select(G.st_area(G.st_buffer($"g", lit(0.5), lit(1)))).collect().head.getDouble(0)
    assert(math.abs(area - math.Pi * 0.25) < 0.01)
  }

  test("st_area_eck4 equal-area behavior through a plan") {
    val eq = wkb(Geom.polygonFromBounds(0, 0, 1, 1))
    val hi = wkb(Geom.polygonFromBounds(0, 59.5, 1, 60.5))
    val r = Seq((eq, hi)).toDF("a", "b")
      .select(G.st_area_eck4($"a"), G.st_area_eck4($"b")).collect().head
    val ratio = r.getDouble(1) / r.getDouble(0)
    assert(ratio > 0.45 && ratio < 0.55)
  }

  test("geojson round-trip expressions (vectors.py:295-309)") {
    val js = """{"type":"Point","coordinates":[1.25,-3.5]}"""
    val out = Seq(Tuple1(js)).toDF("j")
      .select(G.st_asgeojson(G.st_geomfromgeojson($"j"))).collect().head.getString(0)
    assert(out === js)
  }

  test("wkt round-trip via JTS") {
    val out = Seq(Tuple1("POINT (1 2)")).toDF("t")
      .select(G.st_astext(G.st_geomfromtext($"t"))).collect().head.getString(0)
    assert(out === "POINT (1 2)")
  }

  test("st_relate DE-9IM goldens (vectors.py:53-67 head of predicate list)") {
    val a = wkb(Geom.polygonFromBounds(0, 0, 2, 2))
    def relate(b: Array[Byte]): String =
      Seq((a, b)).toDF("a", "b").select(G.st_relate($"a", $"b"))
        .collect().head.getString(0)
    assert(relate(wkb(Geom.polygonFromBounds(0, 0, 2, 2))) === "2FFF1FFF2")   // equal
    assert(relate(wkb(Geom.polygonFromBounds(5, 5, 6, 6))) === "FF2FF1212")   // disjoint
    assert(relate(wkb(Geom.polygonFromBounds(1, 1, 3, 3))) === "212101212")   // overlap
    assert(relate(wkb(Geom.polygonFromBounds(0.5, 0.5, 1.5, 1.5))) === "212FF1FF2") // contains
    assert(relate(wkb(Geom.polygonFromBounds(2, 0, 4, 2))) === "FF2F11212")   // edge touch
  }

  test("unary predicates has_z / is_closed / is_ring (vectors.py:45-52)") {
    val poly = wkb(Geom.polygonFromBounds(0, 0, 1, 1))
    val openLine = wkb(Geom.GLineString(Array(Geom.Pt(0, 0), Geom.Pt(1, 1), Geom.Pt(2, 0))))
    val r = Seq((poly, openLine)).toDF("poly", "line").select(
      G.st_has_z($"poly"), G.st_is_closed($"line"), G.st_is_ring($"line"),
      G.st_is_closed(G.st_exterior($"poly")), G.st_is_ring(G.st_exterior($"poly")),
      G.st_is_closed($"poly") // non-lineal → false, matching shapely
    ).collect().head
    assert(!r.getBoolean(0)); assert(!r.getBoolean(1)); assert(!r.getBoolean(2))
    assert(r.getBoolean(3)); assert(r.getBoolean(4)); assert(!r.getBoolean(5))
  }

  test("exterior / interiors / coords / xy accessors (vectors.py:68-80)") {
    // polygon with one hole
    val shell = Array(Geom.Pt(0, 0), Geom.Pt(0, 4), Geom.Pt(4, 4), Geom.Pt(4, 0), Geom.Pt(0, 0))
    val hole = Array(Geom.Pt(1, 1), Geom.Pt(1, 2), Geom.Pt(2, 2), Geom.Pt(2, 1), Geom.Pt(1, 1))
    val poly = wkb(Geom.GPolygon(Array(shell, hole)))
    val row = Seq(Tuple1(poly)).toDF("g").select(
      G.st_coords(G.st_exterior($"g")).as("ext_cs"),
      size(G.st_interiors($"g")).as("n_holes"),
      G.st_coords(element_at(G.st_interiors($"g"), 1)).as("hole_cs"))
      .collect().head
    val extCs = row.getSeq[scala.collection.Seq[Double]](0).map(s => (s(0), s(1)))
    assert(extCs === shell.map(p => (p.x, p.y)).toSeq)
    assert(row.getInt(1) === 1)
    val holeCs = row.getSeq[scala.collection.Seq[Double]](2).map(s => (s(0), s(1)))
    assert(holeCs === hole.map(p => (p.x, p.y)).toSeq)
    // xy on a linestring: parallel coordinate arrays
    val line = wkb(Geom.GLineString(Array(Geom.Pt(1, 10), Geom.Pt(2, 20))))
    val xy = Seq(Tuple1(line)).toDF("g").select(G.st_xy($"g")).collect().head.getStruct(0)
    assert(xy.getSeq[Double](0) === Seq(1.0, 2.0))
    assert(xy.getSeq[Double](1) === Seq(10.0, 20.0))
    // coords on a polygon raises (shapely NotImplementedError parity)
    val err = intercept[Exception] {
      Seq(Tuple1(poly)).toDF("g").select(G.st_coords($"g")).collect()
    }
    assert(err.getMessage != null)
  }

  test("st_almost_equals tolerance ladder (vectors.py:500-504)") {
    val a = wkb(Geom.GPoint(1.0, 1.0))
    val b = wkb(Geom.GPoint(1.0 + 1e-7, 1.0))
    val r = Seq((a, b)).toDF("a", "b").select(
      G.st_almost_equals($"a", $"b", lit(6)),  // tol 5e-7 > 1e-7 → true
      G.st_almost_equals($"a", $"b", lit(8))   // tol 5e-9 < 1e-7 → false
    ).collect().head
    assert(r.getBoolean(0))
    assert(!r.getBoolean(1))
  }
}
