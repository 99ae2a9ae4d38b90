package graft.streaming

import graft.sql.{CmSketch, SparkTestBase}
import org.apache.spark.sql.GraftRegistrar
import org.apache.spark.sql.functions._

/** Streaming CM sketch: the streamed running grid is byte-equal to the
  * batch sketch over the same corpus regardless of the batch split,
  * restarts merge nothing twice, and estimates never undercount. */
class SketchStreamsSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("streamed sketch ≡ batch sketch; replay-idempotent; never undercounts") {
    GraftRegistrar.ensure(spark)
    val root = java.nio.file.Files.createTempDirectory("sketchstream").toFile
    val in = new java.io.File(root, "in").getAbsolutePath
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    // two input files → maxFilesPerTrigger=1 forces a genuine 2-batch split
    docs.where(col("doc_id") % 2 === 0).coalesce(1).write.parquet(in)
    docs.where(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(in)

    val store = new SketchStreams.SketchStore(new java.io.File(root, "store"))
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    SketchStreams.wordSketchSink(stream, store, ckpt).awaitTermination()

    val (lastId, streamed) = store.load()
    assert(lastId >= 1L, s"expected ≥2 micro-batches, last id $lastId")

    val batchBytes = docs.select(explode(split(col("text"), " ")).as("w"))
      .agg(expr("cm_sketch_agg(w)")).collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(CmSketch.serialize(streamed), batchBytes),
      "streamed grid must be byte-equal to the batch sketch")

    // restart on the same checkpoint: nothing merges twice
    SketchStreams.wordSketchSink(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(in), store, ckpt)
      .awaitTermination()
    assert(java.util.Arrays.equals(CmSketch.serialize(store.load()._2), batchBytes),
      "replay must merge nothing")

    // never-undercount on true word counts
    val truth = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().orderBy(desc("count")).limit(20).collect()
    truth.foreach { r =>
      assert(store.estimate(r.getString(0)) >= r.getLong(1),
        s"undercount for '${r.getString(0)}'")
    }
  }

  test("a torn sketch.bin surfaces as an operable error naming the file, not a buffer underflow") {
    val dir = java.nio.file.Files.createTempDirectory("cmtorn").toFile
    val store = new SketchStreams.SketchStore(dir)
    store.commit(0L, new Array[Long](CmSketch.Depth * CmSketch.Width))
    val f = new java.io.File(dir, "sketch.bin")
    val full = java.nio.file.Files.readAllBytes(f.toPath)
    java.nio.file.Files.write(f.toPath, full.take(full.length / 2)) // torn
    val e = intercept[java.io.IOException] { store.load() }
    assert(e.getMessage.contains("sketch.bin") &&
      e.getMessage.contains("torn"), e.getMessage)
  }
}
