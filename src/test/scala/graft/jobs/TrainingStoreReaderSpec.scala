package graft.jobs

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.functions._

/** Training-store reader: deterministic seeded order, byte-identical
  * across runs AND across a mid-epoch resume; split isolation (the wall);
  * partition-pruned shard scans. */
class TrainingStoreReaderSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private lazy val storeDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("tsreader").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    graft.queries.QualityQueries.withShardAssignment(docs)
      .write.mode("overwrite").partitionBy("split", "shard").parquet(dir)
    dir
  }

  /** the epoch's id sequence, concatenated in served order. */
  private def sequence(split: String, seed: Long,
                       from: TrainingStoreReader.Cursor = null): Seq[Long] = {
    val it =
      if (from == null) TrainingStoreReader.epoch(spark, storeDir, split, seed)
      else TrainingStoreReader.resumeEpoch(spark, storeDir, split, from)
    val out = it.flatMap { case (_, _, df) =>
      df.orderBy(col("ord")).select(col("doc_id")).collect().map(_.getLong(0))
    }.toVector
    GraftCheckpoints.releaseAll()
    out
  }

  test("same seed ⇒ identical epoch order across independent runs; new seed ⇒ same multiset, fresh order") {
    val a1 = sequence("train", 7L)
    val a2 = sequence("train", 7L)
    assert(a1.nonEmpty)
    assert(a1 == a2, "epoch order must be a pure function of (store, split, seed)")
    val b = sequence("train", 8L)
    assert(b.sorted == a1.sorted, "a new seed must serve the same docs")
    assert(b != a1, "a new seed must reshuffle the order")
  }

  test("mid-epoch resume serves exactly the unconsumed suffix, in the same order") {
    val seed = 42L
    val full = sequence("train", seed)
    // consume the first two permuted shards fully, plus 3 docs of the third
    val order = TrainingStoreReader.shardOrder(seed)
    def shardLen(pos: Int): Long = {
      val n = TrainingStoreReader
        .shardDocs(spark, storeDir, "train", order(pos), seed).count()
      GraftCheckpoints.releaseAll(); n
    }
    val consumed = shardLen(0) + shardLen(1) + 3
    val cur = TrainingStoreReader.Cursor(seed, shardPos = 2, docsConsumed = 3)
    val resumed = sequence("train", seed, from = cur)
    assert(resumed == full.drop(consumed.toInt),
      "resume must reproduce the exact suffix of the straight-through epoch")
  }

  test("split isolation: readers of train/val/test partition the store, never cross the wall") {
    val byValSplit = Seq("train", "val", "test").map(s => s -> sequence(s, 5L)).toMap
    val store = spark.read.parquet(storeDir)
    byValSplit.foreach { case (s, ids) =>
      val expect = store.where(col("split") === s)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toVector
      assert(ids.sorted == expect, s"reader($s) must serve exactly split=$s")
    }
    val all = byValSplit.values.flatten.toVector
    assert(all.distinct.size == all.size, "splits must be disjoint")
    assert(all.size.toLong == store.count(), "splits must cover the store")
  }

  test("a shard frame is a statically partition-pruned scan of one split=/shard= directory") {
    val shard = TrainingStoreReader.shardOrder(7L).head
    val df = spark.read.parquet(storeDir)
      .where(col("split") === "train" && col("shard") === shard)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("split") && scan.contains("shard"),
      s"shard read must prune partitions statically:\n$scan")
    GraftCheckpoints.releaseAll()
  }
}
