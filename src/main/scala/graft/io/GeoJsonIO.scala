package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession, GraftRegistrar}
import org.apache.spark.sql.functions._

/** GeoJSON feature IO (FileCollection.open / BaseCollection.save,
  * collections.py:312-335, 524-543).
  *
  * Scale format is newline-delimited GeoJSON features (GeoJSONSeq — the
  * splittable representation; a classic FeatureCollection document is
  * unsplittable by construction). `readFeatureCollection` accepts both: a
  * `.geojsonl`/ndjson file is read distributed; a standard
  * FeatureCollection object is exploded into features first.
  *
  * Output schema: `geom BINARY (WKB)` + `properties STRING (JSON object)` —
  * properties stay schema-free exactly like the reference's dict, and
  * concrete columns are pulled out with get_json_object at use sites. */
object GeoJsonIO {

  /** newline-delimited features → (geom, properties). */
  def readFeatureLines(spark: SparkSession, path: String): DataFrame = {
    GraftRegistrar.ensure(spark)
    spark.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .select(
        call_function("st_geomfromgeojson",
          get_json_object(col("value"), "$.geometry")).as("geom"),
        coalesce(get_json_object(col("value"), "$.properties"), lit("{}"))
          .as("properties"))
  }

  /** standard FeatureCollection document (whole file) → features. */
  def readFeatureCollection(spark: SparkSession, path: String): DataFrame = {
    GraftRegistrar.ensure(spark)
    val txt = spark.read.option("wholetext", "true").text(path)
    val first = txt.select(get_json_object(col("value"), "$.type")).collect()
      .headOption.map(_.getString(0))
    if (first.contains("FeatureCollection")) {
      // explode the features array via from_json into an array of strings
      txt.select(explode(from_json(
          get_json_object(col("value"), "$.features"),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))
          .as("value"))
        .select(
          call_function("st_geomfromgeojson",
            get_json_object(col("value"), "$.geometry")).as("geom"),
          coalesce(get_json_object(col("value"), "$.properties"), lit("{}"))
            .as("properties"))
    } else readFeatureLines(spark, path)
  }

  /** save as newline-delimited GeoJSON features (collections.py:312-335;
    * GeoJSON is forced to WGS84 there — callers reproject first). */
  def writeFeatureLines(df: DataFrame, path: String,
                        geomCol: String = "geom",
                        propsCol: String = "properties"): Unit = {
    GraftRegistrar.ensure(df.sparkSession)
    df.select(concat(
        lit("""{"type": "Feature", "geometry": """),
        call_function("st_asgeojson", col(geomCol)),
        lit(""", "properties": """), col(propsCol), lit("}")).as("value"))
      .write.mode("overwrite").text(path)
  }
}
