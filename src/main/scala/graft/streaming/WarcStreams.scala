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
  * table: no shuffle in ingest, checkpoint-recoverable, append-only. */
object WarcStreams {

  /** binaryFile's fixed schema — the streaming file source requires it
    * up front (no inference on an initially-empty drop directory). */
  private val BinarySchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Streaming DataFrame of parsed [[graft.io.WarcRecord]]s from archives
    * landing under `dropDir`. */
  def records(spark: SparkSession, dropDir: String,
              globFilter: String = "*.warc*"): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", globFilter)
      .schema(BinarySchema)
      .load(dropDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => WarcIO.parseAll(path, bytes) }
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
