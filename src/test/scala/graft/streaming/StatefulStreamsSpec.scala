package graft.streaming

import java.nio.file.Files

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** flatMapGroupsWithState sessionization + watermarked streaming dedup:
  * incremental (AvailableNow) runs over a growing parquet directory with a
  * shared checkpoint — closed sessions emitted exactly once, in-horizon
  * duplicates suppressed, and restarts resume instead of reprocessing. */
class StatefulStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  private def runSessionize(inDir: String, outDir: String, ckDir: String): Unit = {
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema).parquet(inDir)
    val q = StatefulStreams.sessionize(stream)
      .writeStream.format("parquet").option("path", outDir)
      .outputMode("append").option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
  }

  test("streaming sessionize: in-batch gap closes, watermark timeout closes the tail, resume is incremental") {
    val in = Files.createTempDirectory("sess_in").toString
    val out = Files.createTempDirectory("sess_out").toString
    val ck = Files.createTempDirectory("sess_ck").toString

    // batch 1: user 1 has a 85-min gap inside the batch (10:05→11:30) →
    // first session closes immediately; tails stay open. user 99's 13:00
    // event pushes the watermark to 12:59 (1-min delay) on the NEXT run.
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:05:00"), 1L),
      (3L, ts("2024-01-01 11:30:00"), 1L),
      (4L, ts("2024-01-01 10:00:00"), 2L),
      (5L, ts("2024-01-01 13:00:00"), 99L))
      .toDF("event_id", "ts", "user_id")
      .coalesce(1).write.mode("append").parquet(in)
    runSessionize(in, out, ck)

    // run 1 already fires the event-time timeouts: after the data batch the
    // watermark advances to 12:59 (13:00 − 1 min) and AvailableNow runs a
    // closing no-data micro-batch, so users 1 and 2 (horizons ≤ 12:00) close.
    // user 99's tail (horizon 13:30) stays open.
    val after1 = spark.read.parquet(out).collect()
    assert(after1.map(r => (r.getLong(0), r.getLong(3))).toSet ===
      Set((1L, 2L), (1L, 1L), (2L, 1L)))
    assert(after1.length === 3)

    // batch 2: a 14:00 event advances the watermark past 13:30 → user 99's
    // tail closes via timeout on the resumed checkpoint; nothing re-emits.
    Seq((6L, ts("2024-01-01 14:00:00"), 98L))
      .toDF("event_id", "ts", "user_id")
      .coalesce(1).write.mode("append").parquet(in)
    runSessionize(in, out, ck)

    val rows = spark.read.parquet(out)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"), col("min_event"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    def us(s: String): Long = ts(s).getTime * 1000L
    assert(rows.contains((1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:05:00"), 2L, 1L)))
    assert(rows.contains((1L, us("2024-01-01 11:30:00"), us("2024-01-01 11:30:00"), 1L, 3L)))
    assert(rows.contains((2L, us("2024-01-01 10:00:00"), us("2024-01-01 10:00:00"), 1L, 4L)))
    assert(rows.contains((99L, us("2024-01-01 13:00:00"), us("2024-01-01 13:00:00"), 1L, 5L)))
    assert(rows.size === 4) // nothing double-emitted across the resume
  }

  test("streaming dedup: duplicates within the watermark horizon drop across batches") {
    val in = Files.createTempDirectory("dd_in").toString
    val out = Files.createTempDirectory("dd_out").toString
    val ck = Files.createTempDirectory("dd_ck").toString

    def run(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = StatefulStreams.dedupStream(stream, "key")
        .select("key", "doc_id")
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    Seq((1L, ts("2024-01-01 10:00:00"), "A"), (2L, ts("2024-01-01 10:01:00"), "B"))
      .toDF("doc_id", "ts", "key").coalesce(1).write.mode("append").parquet(in)
    run()
    // batch 2: B is a duplicate inside the 1-hour horizon → dropped; C new
    Seq((3L, ts("2024-01-01 10:10:00"), "B"), (4L, ts("2024-01-01 10:11:00"), "C"))
      .toDF("doc_id", "ts", "key").coalesce(1).write.mode("append").parquet(in)
    run()

    val keys = spark.read.parquet(out).select("key", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(keys === Set(("A", 1L), ("B", 2L), ("C", 4L))) // first-wins, B once
  }

  test("streaming canonical-URL dedup collapses recrawl variants across batches") {
    val in = Files.createTempDirectory("cd_in").toString
    val out = Files.createTempDirectory("cd_out").toString
    val ck = Files.createTempDirectory("cd_ck").toString

    def run(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = StatefulStreams.canonicalDedupStream(stream)
        .select("canon_url", "doc_id")
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    // batch 1: docs 1 and 2 are the SAME page under recrawl variants
    Seq((1L, ts("2024-01-01 10:00:00"),
          "https://WWW.Example.COM:443/page/7/?utm_source=feed&id=3#frag"),
        (2L, ts("2024-01-01 10:01:00"),
          "https://www.example.com/page/7?id=3&utm_campaign=x"))
      .toDF("doc_id", "ts", "url").coalesce(1).write.mode("append").parquet(in)
    run()
    // batch 2: doc 3 is ANOTHER variant of the same page (dropped), doc 4 new
    Seq((3L, ts("2024-01-01 10:10:00"),
          "https://www.example.com:443/page/7/?id=3"),
        (4L, ts("2024-01-01 10:11:00"), "https://www.example.com/page/8?id=1"))
      .toDF("doc_id", "ts", "url").coalesce(1).write.mode("append").parquet(in)
    run()

    val keys = spark.read.parquet(out).select("canon_url", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(keys === Set(
      ("https://www.example.com/page/7?id=3", 1L),   // first variant wins
      ("https://www.example.com/page/8?id=1", 4L)))
  }

  test("stream-stream interval join emits exactly the batch-face pairs across two batches") {
    val in = Files.createTempDirectory("ij_in").toString
    val out = Files.createTempDirectory("ij_out").toString
    val ck = Files.createTempDirectory("ij_ck").toString

    def events(rows: Seq[(Long, java.sql.Timestamp, Long, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type")
        .coalesce(1).write.mode("append").parquet(in)

    // user 7: two views then a click inside the window, a later click
    // beyond it; user 9: view AFTER the click only (no match)
    events(Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "view"),
      (2L, ts("2024-01-01 10:05:00"), 7L, "view"),
      (3L, ts("2024-01-01 10:08:00"), 7L, "click"),
      (4L, ts("2024-01-01 10:30:00"), 9L, "click"),
      (5L, ts("2024-01-01 10:31:00"), 9L, "view")))

    def run(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = StatefulStreams.intervalJoin(
          stream.where(col("event_type") === "click"),
          stream.where(col("event_type") === "view"))
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run()
    // batch 2: a later click catches view 5 (within 10 min), plus a view
    // matching it at the same instant
    events(Seq(
      (6L, ts("2024-01-01 10:35:00"), 9L, "click"),
      (7L, ts("2024-01-01 10:35:00"), 9L, "view")))
    run()

    val streamed = spark.read.parquet(out)
      .select("click_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === Set((3L, 1L), (3L, 2L), (6L, 5L), (6L, 7L)))
    // and ≡ the batch face of the same function over the full directory
    val all = spark.read.parquet(in)
    val batch = StatefulStreams.intervalJoin(
        all.where(col("event_type") === "click"),
        all.where(col("event_type") === "view"))
      .select("click_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
  }
}
