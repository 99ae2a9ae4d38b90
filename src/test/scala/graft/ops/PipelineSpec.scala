package graft.ops

import graft.sql.SparkTestBase
import graft.core.Geom
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** GeoJSON IO round-trip, multimodal kernel plumbing, and the streaming
  * path (availableNow + checkpoint resume). */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("GeoJSON feature lines round-trip (collections.py:312-335, 524-543)") {
    val dir = Files.createTempDirectory("geojson").toString
    val df = Seq(
      (Geom.toWkb(Geom.GPoint(1.5, 2.5)), """{"name":"a","v":1}"""),
      (Geom.toWkb(Geom.polygonFromBounds(0, 0, 1, 1)), """{"name":"b","v":2}"""))
      .toDF("geom", "properties")
    graft.io.GeoJsonIO.writeFeatureLines(df, s"$dir/out")
    val back = graft.io.GeoJsonIO.readFeatureLines(spark, s"$dir/out")
    assert(back.count() === 2)
    val names = back.select(get_json_object(col("properties"), "$.name"))
      .collect().map(_.getString(0)).sorted
    assert(names.toSeq === Seq("a", "b"))
    // geometry survives byte-exactly through the JSON round trip
    val pts = back
      .select(call_function("st_x", col("geom")), call_function("st_y", col("geom")))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._1)
    assert(pts.head === ((0.0, 0.0))) // polygon bbox min
    assert(pts.last === ((1.5, 2.5)))
  }

  test("GeoJSON FeatureCollection document reader (vectors.py:483-487)") {
    val dir = Files.createTempDirectory("geojson_fc")
    val doc =
      """{"type": "FeatureCollection", "features": [
        |  {"type": "Feature", "geometry": {"type":"Point","coordinates":[3.5,4.5]}, "properties": {"id": 7}},
        |  {"type": "Feature", "geometry": {"type":"Point","coordinates":[5.5,6.5]}, "properties": {"id": 8}}
        |]}""".stripMargin
    Files.writeString(dir.resolve("fc.geojson"), doc)
    val back = graft.io.GeoJsonIO.readFeatureCollection(spark, dir.toString + "/fc.geojson")
    val rows = back.select(call_function("st_x", col("geom")),
        get_json_object(col("properties"), "$.id"))
      .collect().map(r => (r.getDouble(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq === Seq((3.5, "7"), (5.5, "8")))
  }

  test("multimodal decode stub: schema, determinism, null passthrough") {
    val df = Seq(
      (1L, "hello world".getBytes("UTF-8")),
      (2L, Array.emptyByteArray),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = MultimodalOps.decode(df).collect().sortBy(_.doc_id)
    assert(out.length === 3)
    assert(out(0).byte_len === 11)
    assert(out(0).features.sum === 11f) // histogram sums to byte count
    assert(out(2).byte_len === -1) // null payload marked, not dropped
    // deterministic across runs
    val again = MultimodalOps.decode(df).collect().sortBy(_.doc_id)
    assert(again(0).checksum === out(0).checksum)
  }

  test("multimodal frame sampling explodes payloads to frame rows") {
    val df = Seq((9L, (0 until 100).map(_.toByte).toArray)).toDF("doc_id", "payload")
    val frames = MultimodalOps.frameSample(df, stride = 32).collect()
    assert(frames.length === 4) // 32+32+32+4
    assert(frames.map(_.getInt(2)).toSeq === Seq(32, 32, 32, 4))
  }

  test("streaming windowed counts: availableNow run matches batch, restart resumes") {
    // the streaming file source needs a directory
    val inDir = Files.createTempDirectory("events_in")
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      inDir.resolve("events.parquet"))
    val events = spark.read.parquet(inDir.toString)
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val q = graft.streaming.EventStream.runAvailableNow(
      spark, inDir.toString, checkpoint, "evt_stream")
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT * FROM evt_stream")
    // batch reference: same transformation, completed windows only — with
    // availableNow + watermark the final windows may be withheld, so
    // compare on the windows the stream emitted.
    val batch = graft.streaming.EventStream.windowedCounts(events)
    val sCount = streamed.count()
    assert(sCount > 0)
    val joined = streamed.alias("s").join(batch.alias("b"),
      Seq("win_start", "event_type"))
    assert(joined.where(col("s.n") =!= col("b.n")).count() === 0)
    // restart-resume with a recoverable (parquet) sink: second run on the
    // same checkpoint emits nothing new
    val outDir = Files.createTempDirectory("evt_out").toString
    val ckpt2 = Files.createTempDirectory("ckpt2").toString
    val p1 = graft.streaming.EventStream.runAvailableNowToParquet(
      spark, inDir.toString, outDir, ckpt2)
    p1.awaitTermination(120000)
    val afterFirst = spark.read.parquet(outDir).count()
    val p2 = graft.streaming.EventStream.runAvailableNowToParquet(
      spark, inDir.toString, outDir, ckpt2)
    p2.awaitTermination(120000)
    assert(spark.read.parquet(outDir).count() === afterFirst)
  }
}
