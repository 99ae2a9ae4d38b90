package graft.streaming

import java.nio.file.Files

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming face of the stream-static spatial enrichment (q62's batch
  * face): the SAME GeoStreams.spatialEnrich call runs under readStream over
  * a growing parquet dir; hourly per-polygon windows emitted in append mode
  * across two AvailableNow batches must equal the batch run (for every
  * window the watermark has closed). */
class GeoStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private val H0 = 1704067200L // 2024-01-01 00:00 UTC

  // (pid, lon, lat, is_hot, epoch): polys 1 (box −120..−100 × 30..45) and
  // 6 (the Paris hot box) are hit; pid 5 lands in no polygon
  private val batch1 = Seq(
    (1L, -110.0, 35.0, false, H0 + 100L),
    (2L, -105.0, 40.0, true, H0 + 200L),
    (3L, 2.30, 48.85, true, H0 + 3600L + 10L), // poly 6, hour 1
    (5L, 0.0, 0.0, false, H0 + 300L))
  private val batch2 = Seq(
    (4L, -115.0, 31.0, false, H0 + 400L), // late row, still inside hour 0
    // sentinel far in the future: advances the watermark past every real
    // window so the run flushes them; its own window stays open
    (99L, -110.0, 35.0, false, H0 + 10L * 3600L))

  test("streamed hourly polygon windows across two batches ≡ batch run") {
    val in = Files.createTempDirectory("geo_in").toString
    val out = Files.createTempDirectory("geo_out").toString
    val ck = Files.createTempDirectory("geo_ck").toString
    val cols = Seq("pid", "lon", "lat", "is_hot", "epoch")
    val polys = graft.model.PolygonLayer.toDF(spark)

    def run(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = GeoStreams.spatialEnrich(stream, polys)
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    batch1.toDF(cols: _*).coalesce(1).write.mode("append").parquet(in)
    run()
    batch2.toDF(cols: _*).coalesce(1).write.mode("append").parquet(in)
    run()

    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val batchAll = GeoStreams.spatialEnrich(
        (batch1 ++ batch2).toDF(cols: _*), polys)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val sentinelWin = (H0 + 10L * 3600L) / 3600L * 3600L
    assert(streamed === batchAll.filter(_._1 < sentinelWin))
    // the late batch-2 row landed in the still-open hour-0 window, so the
    // hour-0 poly-1 count must include ALL THREE points incl. the resume
    assert(streamed.contains((H0 / 3600L * 3600L, 1, 3L, 1L)))
    assert(streamed.contains((H0 + 3600L, 6, 1L, 1L)))
    // no-polygon point contributes nowhere
    assert(!streamed.exists(_._3 > 3L))
  }

  test("streamed tile rollup across two batches ≡ batch run (live-map face)") {
    val in = Files.createTempDirectory("tile_in").toString
    val out = Files.createTempDirectory("tile_out").toString
    val ck = Files.createTempDirectory("tile_ck").toString
    val cols = Seq("pid", "lon", "lat", "is_hot", "epoch")

    def run(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = GeoStreams.tileCounts(stream)
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    batch1.toDF(cols: _*).coalesce(1).write.mode("append").parquet(in)
    run()
    batch2.toDF(cols: _*).coalesce(1).write.mode("append").parquet(in)
    run()

    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batchAll = GeoStreams.tileCounts((batch1 ++ batch2).toDF(cols: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val sentinelWin = (H0 + 10L * 3600L) / 3600L * 3600L
    assert(streamed === batchAll.filter(_._1 < sentinelWin),
      "streamed closed windows must equal the batch run")
    // the two co-located US points (−110,35)×2 across the batches share
    // hour 0 but sit in different z12 cells than the Paris point; every
    // count is per-(window, cell) — total mass equals the input rows
    assert(streamed.toSeq.map(_._3).sum == 5L, s"tile mass: $streamed")
    // the batch-side cell derivation matches the q01 expression
    val parisCell = graft.core.Mercator.tileAtPacked(2.30, 48.85, 12)
    assert(streamed.exists(t => t._2 == parisCell && t._3 == 1L && t._4 == 1L))
  }

  test("cross-query invariant: q62 windows sum to q02's per-polygon totals") {
    val sf = "/root/testdata/sf0.001"
    val enriched = graft.queries.StreamQueries.streamEnrich(spark, sf)
      .groupBy(col("poly_id"))
      .agg(sum(col("n")).as("n"), sum(col("n_hot")).as("n_hot"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pip = graft.Queries.pipJoin(spark, sf)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(enriched.keySet === pip.keySet)
    pip.foreach { case (id, (n, hot)) =>
      assert(enriched(id) === ((n, hot)), s"poly $id windowed totals")
    }
  }
}
