package graft.streaming

import java.nio.file.Files

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._

/** The frozen-weight DSIR scorer: trained batch-side, applied to a stream
  * as a stateless map-side projection — streamed scores must reproduce the
  * batch q80 query's exactly on the training corpus. */
class DsirStreamsSpec extends SparkTestBase {

  test("frozen-weight streaming scorer reproduces the batch q80 scores, stateless") {
    val sf = "/root/testdata/sf0.001"
    val corpus = graft.model.Pages.documentsPages(spark, sf)
      .select(col("doc_id"), col("text"), col("source"))
    val frozen = DsirStreams.trainWeights(corpus)
    assert(frozen.length === graft.queries.QualityQueries.DsirBuckets)

    // batch reference: the q80 selection (top-K scored raw docs)
    val batch = graft.queries.QualityQueries.dsirSelect(spark, sf)
      .select(col("doc_id"), col("score"), col("n_tokens"), col("score_per_kt"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    // stream the raw pool through the frozen scorer
    val in = Files.createTempDirectory("dsir_in").toString
    val raw = corpus.where(!col("source").isin(
      graft.queries.QualityQueries.DsirTargetSources: _*))
    raw.write.mode("append").parquet(in)
    val out = Files.createTempDirectory("dsir_out").toString + "/scored"
    val ck = Files.createTempDirectory("dsir_ck").toString
    val schema = spark.read.parquet(in).schema
    val q = DsirStreams.scored(
        spark.readStream.schema(schema).parquet(in), frozen)
      .select(col("doc_id"), col("score"), col("n_tokens"), col("score_per_kt"))
      .writeStream.option("checkpointLocation", ck).option("path", out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").start()
    q.awaitTermination()
    assert(q.recentProgress.flatMap(_.stateOperators).isEmpty,
      "scorer must hold zero streaming state")

    val streamed = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // every batch-selected doc scores IDENTICALLY through the stream
    batch.foreach { case (id, v) =>
      assert(streamed(id) === v, s"doc $id diverged: ${streamed(id)} vs $v")
    }
    // and the stream's own top-K set equals the batch selection
    val topStream = streamed.toSeq
      .sortBy { case (id, (_, _, spk)) => (-spk, id) }
      .take(batch.size).map(_._1).toSet
    assert(topStream === batch.keySet,
      "streamed top-K diverges from the batch selection")
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
  }

  test("frozen table keeps target-only buckets at their true smoothed weight") {
    // the review finding: dsirWeightsOf's batch-only cr>0 probe filter
    // must NOT leak into the frozen apply table — a bucket seen only in
    // the curated target (ct>0, cr=0) is the highest-signal feature a
    // future stream can probe, (ct+1)·scale, never the neutral weight
    import spark.implicits._
    val Q = graft.queries.QualityQueries
    val corpus = Seq(
      (0L, "t1 t1 t1", Q.DsirTargetSources.head), // target-only bucket
      (1L, "r1 r1", "srcRaw"))                    // raw-only bucket
      .toDF("doc_id", "text", "source")
    val frozen = DsirStreams.trainWeights(corpus)
    val Seq(bT, bR) = spark.range(1)
      .select(Q.dsirBucket(org.apache.spark.sql.functions.lit("t1")),
        Q.dsirBucket(org.apache.spark.sql.functions.lit("r1")))
      .collect()(0).toSeq.map(_.asInstanceOf[Long].toInt)
    assert(bT != bR, "fixture tokens must hash to distinct buckets")
    assert(frozen(bT) === (3L + 1) * Q.DsirScale,
      "target-only bucket must carry (ct+1)*scale, not the neutral weight")
    assert(frozen(bR) === (0L + 1) * Q.DsirScale / (2L + 1))
    (0 until Q.DsirBuckets).filterNot(b => b == bT || b == bR)
      .foreach(b => assert(frozen(b) === Q.DsirScale))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
  }
}
