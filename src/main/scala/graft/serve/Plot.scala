package graft.serve

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftRegistrar

import graft.core.Geom
import graft.ops.FeatureCollection

/** Interactive-map HTML emission — the engine's counterpart of the
  * reference's plotting surface (plotting.py), with zero JVM deps: the
  * document references the Leaflet CDN and inlines the data.
  *
  *  - [[simplePlot]] ≙ simple_plot (plotting.py:37-67): CartoDB Positron
  *    base layer (folium's default there), the collection's features as an
  *    inline GeoJSON layer head-limited to [[SimplePlotMaxRows]]
  *    (plotting.py:35, 61), map fit to the collection envelope in Leaflet
  *    (lat, lon) order (plotting.py:63-65), and the reference's
  *    empty-geometry warning contract (plotting.py:55-57) as an HTML
  *    comment marker with no layer.
  *  - [[styleProperties]] ≙ style_element (plotting.py:96-106): a style
  *    computed from each feature's properties merged back in as the
  *    "style" property, which the GeoJSON layer picks up per feature.
  *  - [[rasterPlot]] ≙ plot-over-TileServer (plotting.py:110-150 +
  *    util/local_tile_server.py): an L.tileLayer pointed at the engine's
  *    own [[TileHttpServer]] URL scheme `/{id}/{x}/{y}/{z}.png`.
  *
  * Plot output is a DRIVER artifact by definition (the reference caps at
  * 200 features for the same reason) — the only collect here is that
  * bounded head. */
object Plot {

  val SimplePlotMaxRows = 200 // plotting.py:35

  /** A bounded head of the collection as a GeoJSON FeatureCollection
    * document string. When the collection carries the engine's `row_idx`
    * ordinal the head is its deterministic prefix (the reference's
    * fc[:200]); otherwise `limit` takes an arbitrary-but-bounded subset.
    * `styleFor` (properties JSON → style JSON object) merges a computed
    * "style" into each feature at emission — the style_element semantics
    * (plotting.py:96-106) without a fragile post-hoc string pass. */
  def featureCollectionJson(fc: FeatureCollection,
                            limit: Int = SimplePlotMaxRows,
                            styleFor: String => String = null): String = {
    val spark = fc.df.sparkSession
    GraftRegistrar.ensure(spark)
    val propsCol =
      if (fc.df.columns.contains("properties")) col("properties") else lit("{}")
    val ordered =
      if (fc.df.columns.contains(FeatureCollection.RowIdx))
        fc.df.orderBy(col(FeatureCollection.RowIdx))
      else fc.df
    val feats = ordered
      .select(call_function("st_asgeojson", col(fc.geomCol)).as("g"),
        coalesce(propsCol, lit("{}")).as("p"))
      .limit(limit)
      .collect()
      .map { r =>
        val raw = r.getString(1).trim
        // normalize non-object/blank properties to an empty object so the
        // style merge can never emit invalid JS ("", "null", "{ }", …)
        val props0 =
          if (raw.startsWith("{") && raw.endsWith("}")) raw else "{}"
        val props =
          if (styleFor == null) props0
          else {
            val style = styleFor(props0)
            val inner = props0.stripPrefix("{").stripSuffix("}").trim
            // a pre-existing "style" key is overridden: JS object literals
            // resolve duplicate keys last-wins, and ours is appended last
            if (inner.isEmpty) s"""{"style": $style}"""
            else s"""{$inner, "style": $style}"""
          }
        s"""{"type": "Feature", "geometry": ${r.getString(0)}, "properties": $props}"""
      }
    s"""{"type": "FeatureCollection", "features": [${feats.mkString(", ")}]}"""
  }

  private def document(body: String): String =
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"/>
       |<link rel="stylesheet" href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
       |<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
       |<style>#map { height: 100vh; }</style>
       |</head><body><div id="map"></div>
       |<script>
       |var map = L.map('map');
       |L.tileLayer('https://{s}.basemaps.cartocdn.com/light_all/{z}/{x}/{y}.png',
       |  {attribution: '&copy; OpenStreetMap contributors &copy; CARTO'}).addTo(map);
       |$body
       |</script></body></html>
       |""".stripMargin

  /** Folium-simple_plot-shaped document for a vector collection. */
  def simplePlot(fc: FeatureCollection): String = {
    // plotting.py:55-57 warns and leaves the bare map for empty GEOMETRY,
    // not just empty collections — st_envelope_agg returns null when every
    // geometry is empty/null, so probe it before dereferencing
    val env = if (fc.isEmptyCollection) null else fc.envelope
    if (env == null)
      document("/* <!-- empty geometry: no layer --> */ map.setView([0, 0], 2);")
    else {
      // plot.max_rows: context-overridable head cap (GraftContext parity
      // with the reference's thread-local option plumbing)
      // '</' must not appear verbatim inside the inline <script>: a crawled
      // property value containing '</script>' would terminate the script
      // element mid-string (ADVICE r2). '<\/' is the same string to the JS
      // parser but inert to the HTML tokenizer.
      val json = featureCollectionJson(fc,
        graft.core.GraftContext.getInt("plot.max_rows", SimplePlotMaxRows))
        .replace("</", "<\\/")
      val bb = Geom.fromWkb(env).bbox
      document(
        s"""var data = $json;
           |L.geoJSON(data, {style: function (f) { return (f.properties && f.properties.style) || {}; }}).addTo(map);
           |map.fitBounds([[${bb.ymin}, ${bb.xmin}], [${bb.ymax}, ${bb.xmax}]]);""".stripMargin)
    }
  }

  /** Raster plot: the tile-layer document a notebook embeds, pointed at
    * the engine's [[TileHttpServer]] (`/{id}/{x}/{y}/{z}.png`). */
  def rasterPlot(serverBase: String, rasterId: String,
                 bounds: (Double, Double, Double, Double)): String = {
    val (xmin, ymin, xmax, ymax) = bounds
    document(
      s"""L.tileLayer('$serverBase/$rasterId/{x}/{y}/{z}.png').addTo(map);
         |map.fitBounds([[$ymin, $xmin], [$ymax, $xmax]]);""".stripMargin)
  }
}
