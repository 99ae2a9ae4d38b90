package graft.ops

import graft.core.Geom
import graft.sql.SparkTestBase
import graft.sql.{functions => G}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Collection operator goldens ported from tests/test_collections.py
  * (sort :387-400, groupby :403-452, dissolve :455-467, group filter
  * :470-493, concat :502-515, property_names :496-499). */
class FeatureCollectionSpec extends SparkTestBase {
  import spark.implicits._

  private def pt(x: Double, y: Double) = Geom.toWkb(Geom.GPoint(x, y))
  private def box(xmin: Double, ymin: Double, xmax: Double, ymax: Double) =
    Geom.toWkb(Geom.polygonFromBounds(xmin, ymin, xmax, ymax))

  private def fcProps = {
    val df = Seq(
      (pt(3, 3), 3, 1),
      (pt(1, 1), 1, 2),
      (pt(2, 2), 2, 3)).toDF("geom", "prop1", "row_idx")
    new FeatureCollection(df)
  }

  test("sort by property is stable (test_collections.py:387-400)") {
    val sorted = fcProps.sortBy("prop1").df.select("prop1").collect().map(_.getInt(0))
    assert(sorted.toSeq === Seq(1, 2, 3))
  }

  test("groupby preserves first-seen order via min(row_idx) (test_collections.py:403-414)") {
    val df = Seq(
      (pt(3, 3), "a", 1), (pt(1, 1), "a", 2), (pt(2, 2), "b", 3))
      .toDF("geom", "prop1", "row_idx")
    val fc = new FeatureCollection(df)
    val groups = fc.groupbyAgg("prop1", "n" -> count(lit(1)))
      .orderBy("first_seen").collect()
    assert(groups.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(groups.map(_.getLong(1)).toSeq === Seq(2L, 1L))
  }

  test("dissolve: union geometry + aggregated property (test_collections.py:455-467)") {
    val df = Seq(
      (box(0, 0, 2, 1), "a", 1L),
      (box(1, 0, 3, 1), "a", 2L),
      (box(0, 0, 2, 1), "b", 3L)).toDF("geom", "prop1", "b")
    val fc = new FeatureCollection(df)
    val out = fc.dissolve("prop1", "b" -> sum(col("b")))
      .orderBy("prop1")
      .select(col("prop1"), col("b"),
        G.st_xmin(col("geom")), G.st_ymin(col("geom")),
        G.st_xmax(col("geom")), G.st_ymax(col("geom")))
      .collect()
    // group a: union of (0,0,2,1) and (1,0,3,1) → bounds (0,0,3,1), b=3
    assert(out(0) === Row("a", 3L, 0.0, 0.0, 3.0, 1.0))
    // group b: single box (0,0,2,1), b=3
    assert(out(1) === Row("b", 3L, 0.0, 0.0, 2.0, 1.0))
  }

  test("groupbyFilter keeps whole passing groups (test_collections.py:470-493)") {
    val df = Seq(
      (pt(3, 3), "a", 1), (pt(1, 1), "a", 2),
      (pt(3, 3), "b", 3), (pt(1, 1), "b", 1), (pt(2, 2), "b", 2))
      .toDF("geom", "prop1", "b")
    val fc = new FeatureCollection(df)
    val kept = fc.groupbyFilter("prop1", col("__n") === 3)
    assert(kept.df.select("prop1").distinct().collect().map(_.getString(0)).toSeq === Seq("b"))
    assert(kept.df.count() === 3)
  }

  test("concat does schema union with null fill (test_collections.py:502-515, :489-496)") {
    val a = new FeatureCollection(Seq((pt(0, 0), 1)).toDF("geom", "p1"))
    val b = new FeatureCollection(Seq((pt(1, 1), "x")).toDF("geom", "p2"))
    val c = a.concat(b)
    assert(c.df.columns.toSet === Set("geom", "p1", "p2"))
    assert(c.df.count() === 2)
    assert(c.df.where(col("p1").isNull).count() === 1)
    assert(c.df.where(col("p2").isNull).count() === 1)
  }

  test("slice via row_idx window (collections.py:405-408)") {
    val df = (1 to 10).map(i => (pt(i, i), i)).toDF("geom", "row_idx")
    val fc = new FeatureCollection(df)
    val got = fc.slice(2, 5).df.select("row_idx").collect().map(_.getInt(0))
    assert(got.toSeq === Seq(3, 4, 5))
  }

  test("filterIntersects: spatial selection semi-join (collections.py:138-156)") {
    val df = Seq((pt(0.5, 0.5), 1), (pt(5, 5), 2), (pt(0.9, 0.1), 3))
      .toDF("geom", "id")
    val fc = new FeatureCollection(df)
    val probe = Geom.toWkb(Geom.polygonFromBounds(0, 0, 1, 1))
    val got = fc.filterIntersects(probe).df.select("id").collect().map(_.getInt(0))
    assert(got.sorted.toSeq === Seq(1, 3))
    // empty probe region → empty collection
    val empty = fc.filterIntersects(Geom.toWkb(Geom.polygonFromBounds(10, 10, 11, 11)))
    assert(empty.isEmptyCollection)
  }

  test("collection accessors: envelope / cascadedUnion / convexHull (collections.py:87-116)") {
    val df = Seq(
      (box(0, 0, 1, 1), 1), (box(2, 0, 3, 1), 2)).toDF("geom", "id")
    val fc = new FeatureCollection(df)
    val env = Geom.fromWkb(fc.envelope).bbox
    assert(env === Geom.BBox(0, 0, 3, 1))
    val uniArea = Geom.planarArea(Geom.fromWkb(fc.cascadedUnion))
    assert(math.abs(uniArea - 2.0) < 1e-9)
    val hullArea = Geom.planarArea(Geom.fromWkb(fc.convexHull))
    assert(math.abs(hullArea - 3.0) < 1e-9) // hull of two unit boxes spanning x 0..3
  }

  test("applyProps appends derived properties (collections.py:342-364)") {
    val fc = fcProps.applyProps("double" -> (col("prop1") * 2),
      "label" -> concat(lit("p"), col("prop1")))
    assert(fc.df.columns.takeRight(2).toSeq === Seq("double", "label"))
    assert(fc.df.where(col("prop1") === 2).select("double").collect().head.getInt(0) === 4)
  }

  test("metamorphic: indexed filter ≡ plain filterIntersects (SURVEY.md §4 rewrite)") {
    val rnd = new scala.util.Random(7)
    // mixed geometry types: the indexed path must stay sound for polygons
    // whose bbox min-corner cell lies OUTSIDE the probe cover (ADVICE r1)
    val rows = (1 to 2000).map { i =>
      val x = rnd.nextDouble() * 340 - 170
      val y = rnd.nextDouble() * 150 - 75
      val g = if (i % 4 == 0) box(x, y, x + rnd.nextDouble() * 30, y + rnd.nextDouble() * 30)
              else pt(x, y)
      (g, i)
    }
    val fc = new FeatureCollection(rows.toDF("geom", "id"))
    val probe = Geom.toWkb(Geom.polygon((10.3, -20.7), (55.9, -18.2), (47.1, 24.5), (12.0, 18.8)))
    val plain = fc.filterIntersects(probe).df.select("id").collect().map(_.getInt(0)).sorted
    val indexed = fc.filterIntersectsIndexed(probe, zoom = 5)
      .df.select("id").collect().map(_.getInt(0)).sorted
    assert(indexed.toSeq === plain.toSeq)
    assert(plain.nonEmpty)
    assert(plain.exists(_ % 4 == 0)) // polygons are exercised
  }

  test("assets: attach + copy_with override merge (features.py:262-336)") {
    val fc = new FeatureCollection(Seq((pt(0, 0), 1)).toDF("geom", "id"))
      .withAsset("rgb", "s3://x/rgb.tif", Seq("red", "green", "blue"), "raster", "visual")
      .withAsset("nir", "s3://x/nir.tif", Seq("nir"), "raster", "nir")
      .withAsset("rgb", "s3://x/rgb_v2.tif", Seq("red", "green", "blue"), "raster", "visual")
    val row = fc.df.select(col("assets")).collect().head
    val m = row.getMap[String, org.apache.spark.sql.Row](0)
    assert(m.keys.toSet === Set("rgb", "nir"))
    assert(m("rgb").getAs[String]("href") === "s3://x/rgb_v2.tif") // override wins
    assert(m("nir").getAs[Seq[String]]("bands") === Seq("nir"))
  }

  test("property_names on empty collection (test_collections.py:496-499)") {
    val fc = new FeatureCollection(Seq.empty[(Array[Byte], Int)].toDF("geom", "p"))
    assert(fc.isEmptyCollection)
    assert(fc.df.columns.filterNot(_ == "geom").toSeq === Seq("p"))
  }
}
