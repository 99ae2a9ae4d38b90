package graft.io

import graft.core.Geom
import graft.core.Geom.GPoint
import graft.ops.SchemaRules.FeatureCollectionIOError
import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._

/** FileCollection.open/save extension dispatch (collections.py:25-29,
  * 524-543) and validate-by-trial-write (collections.py:387-397). */
class FileCollectionSpec extends SparkTestBase {
  import spark.implicits._

  test("open dispatches by extension: .shp via the shapefile codec") {
    val df = FileCollection.open(spark,
      "/root/reference/tests/data/vector/bsas_barrios/barrios.shp")
    assert(df.count() === 53)
    assert(df.columns.contains("BARRIO"))
  }

  test("open/save round-trip through each driver; unknown extension raises") {
    val dir = java.nio.file.Files.createTempDirectory("fc").toString
    val df = Seq((Geom.toWkb(GPoint(1.5, 2.5)), "a"), (Geom.toWkb(GPoint(-3.0, 4.0)), "b"))
      .toDF("geom", "name")
    // shapefile
    FileCollection.save(df, s"$dir/pts.shp")
    assert(FileCollection.open(spark, s"$dir/pts.shp").count() === 2)
    // geojson lines (needs a JSON properties column)
    val gj = df.select(col("geom"),
      concat(lit("""{"name": """"), col("name"), lit("\"}")).as("properties"))
    FileCollection.save(gj, s"$dir/pts.geojsonl")
    val back = FileCollection.open(spark, s"$dir/pts.geojsonl")
    assert(back.count() === 2)
    assert(back.select(get_json_object(col("properties"), "$.name")).as[String]
      .collect().toSet === Set("a", "b"))
    // parquet
    FileCollection.save(df, s"$dir/pts.parquet")
    assert(FileCollection.open(spark, s"$dir/pts.parquet").count() === 2)
    intercept[IllegalArgumentException](FileCollection.open(spark, s"$dir/x.gpkg"))
  }

  test("validate: trial-write semantics — unmappable property and mixed geometry raise") {
    val ok = Seq((Geom.toWkb(GPoint(0, 0)), "x", 1L, 2.0, true)).toDF("geom", "s", "n", "d", "b")
    FileCollection.validate(ok) // no throw

    val badProp = ok.withColumn("arr", array(lit(1), lit(2)))
    intercept[FeatureCollectionIOError](FileCollection.validate(badProp))

    val mixed = Seq(
      Tuple1(Geom.toWkb(GPoint(0, 0))),
      Tuple1(Geom.toWkb(Geom.polygonFromBounds(0, 0, 1, 1)))).toDF("geom")
    intercept[FeatureCollectionIOError](FileCollection.validate(mixed))

    intercept[FeatureCollectionIOError](
      FileCollection.validate(Seq(Tuple1("not-wkb")).toDF("geom")))
  }
}
