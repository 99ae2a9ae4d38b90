package graft.streaming

import java.nio.file.Files

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._

/** The streaming training-store writer: q79's split/shard assignment
  * evaluated by the SAME expression as the batch query, landed as a
  * `split=/shard=` hive-partitioned layout, exactly-once across resume. */
class ShardStreamsSpec extends SparkTestBase {
  import spark.implicits._

  test("sharded writer: hive layout, batch-parity assignment, crash-resume exactly-once") {
    val in = Files.createTempDirectory("shardstream_in").toString
    val out = Files.createTempDirectory("shardstream_out").toString + "/store"
    val ck = Files.createTempDirectory("shardstream_ck").toString

    val batch1 = (1L to 400L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
    batch1.write.mode("append").parquet(in)

    def runAvailable(): Unit = {
      val schema = spark.read.parquet(in).schema
      val q = ShardStreams.shardedWriter(
        spark.readStream.schema(schema).parquet(in), out, ck)
      q.awaitTermination()
    }
    runAvailable()

    // hive-partitioned layout: split=/shard= directories — the reader's
    // contamination wall and epoch pruning are the LAYOUT
    val splitDirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("split=")).sorted
    assert(splitDirs.toSeq === Seq("split=test", "split=train", "split=val"),
      splitDirs.mkString(","))
    val trainShards = new java.io.File(s"$out/split=train").listFiles()
      .map(_.getName).filter(_.startsWith("shard="))
    assert(trainShards.length > 1, "train docs should span multiple shards")

    // assignment parity: reading the store back reproduces EXACTLY the
    // batch expression's (doc_id -> split, shard) map
    val stored = spark.read.parquet(out)
      .select(col("doc_id"), col("split"), col("shard").cast("long").as("shard"))
    val expected = graft.queries.QualityQueries.withShardAssignment(batch1)
      .select(col("doc_id"), col("split"), col("shard"))
    assert(stored.count() === 400)
    assert(stored.exceptAll(expected).isEmpty && expected.exceptAll(stored).isEmpty,
      "stored assignment diverges from the batch expression")

    // a pruned read lists ONE directory's files only (static pruning)
    val one = spark.read.parquet(out).where(col("split") === "test")
    assert(one.select(col("split")).distinct().collect().map(_.getString(0)).toSeq
      === Seq("test"))

    // crash-resume: re-running over the SAME input (checkpoint intact)
    // appends nothing; a genuinely new batch appends exactly its rows
    runAvailable()
    assert(spark.read.parquet(out).count() === 400, "replay duplicated rows")
    (401L to 500L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
      .write.mode("append").parquet(in)
    runAvailable()
    assert(spark.read.parquet(out).count() === 500)
    // determinism across batches: doc 401's placement matches the batch expr
    val got401 = spark.read.parquet(out).where(col("doc_id") === 401L)
      .select(col("split"), col("shard").cast("long")).collect()(0)
    val exp401 = graft.queries.QualityQueries.withShardAssignment(
      Seq((401L, "x")).toDF("doc_id", "text"))
      .select(col("split"), col("shard")).collect()(0)
    assert(got401.getString(0) === exp401.getString(0)
      && got401.getLong(1) === exp401.getLong(1))
  }
}
