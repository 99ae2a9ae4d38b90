package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.io.WarcIO

/** Streaming face of the WARC source: tail a crawl drop directory — each
  * newly-landed `.warc.gz` archive becomes ONE parse task in the next
  * micro-batch (the same file-per-task unit as the batch reader, now with
  * the file-source ledger giving exactly-once per archive across
  * restarts). This is how a continuously-arriving crawl feeds the pages
  * table: no shuffle in ingest, checkpoint-recoverable, append-only.
  *
  * LANDING CONVENTION (required of the producer): archives must land
  * ATOMICALLY — write to a temp name the glob does not match (e.g.
  * `crawl-000123.tmp`, or a dotted `.crawl-000123.warc.gz`, which Spark's
  * file source additionally treats as hidden — note `*.warc*` has a
  * trailing wildcard, so a `.warc.gz.tmp` suffix would STILL match), then
  * rename into place. The default `*.warc*` glob will otherwise pick up a
  * partially-written file mid-copy; the parser then fails loudly on the
  * truncated tail AND the file-source ledger may already have marked that
  * path consumed — the archive would need a manual re-land under a new
  * name. This is the same publish choreography the lake's StageCache uses
  * (write → fsync → atomic rename): a name matching the glob must only
  * ever appear with its complete content. */
object WarcStreams {

  /** binaryFile's fixed schema — the streaming file source requires it
    * up front (no inference on an initially-empty drop directory). */
  private val BinarySchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Streaming DataFrame of parsed [[graft.io.WarcRecord]]s from archives
    * landing under `dropDir`. The file source is used for its ledger
    * (exactly-once per path across restarts) but only `path` is projected
    * — binaryFile prunes the `content` column, so the archive bytes are
    * never materialized as a row; each task re-opens its archive's stream
    * and parses records off it in O(record) memory, same as the batch
    * reader (and binaryFile's Int.MaxValue content cap never applies). */
  def records(spark: SparkSession, dropDir: String,
              globFilter: String = "*.warc*"): DataFrame = {
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.SerializableWritable(
        spark.sparkContext.hadoopConfiguration))
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", globFilter)
      .schema(BinarySchema)
      .load(dropDir)
      .select(col("path"))
      .as[String]
      .flatMap { path =>
        val hp = new org.apache.hadoop.fs.Path(path)
        val in = hp.getFileSystem(confBc.value.value).open(hp)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        WarcIO.parseStream(path, in)
      }
      .toDF()
  }

  /** Response records projected to the pages-table shape (url, fetch
    * epoch, html payload) — the map-side column derivation a downstream
    * quality/dedup stage consumes. */
  def pages(records: DataFrame): DataFrame =
    records.where(col("warc_type") === "response")
      .select(
        col("target_uri").as("url"),
        unix_timestamp(col("warc_date"), "yyyy-MM-dd'T'HH:mm:ssX")
          .as("warc_epoch"),
        col("content_length"),
        col("payload").as("html"),
        col("source_file"), col("record_offset"))

  /** Drain everything currently in the drop directory into an append-only
    * parquet pages store, exactly-once per archive: a restart on the same
    * checkpoint re-ingests nothing; newly-landed archives (and only they)
    * flow on the next run — the streaming sibling of the lake's
    * batch-append resume. */
  def ingestAvailableNow(spark: SparkSession, dropDir: String,
                         outDir: String, checkpointDir: String): StreamingQuery =
    pages(records(spark, dropDir))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
