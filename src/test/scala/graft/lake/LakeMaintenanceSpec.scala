package graft.lake

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._
import java.io.File
import java.nio.file.{Files, Paths}

/** Table-maintenance contracts: small-file compaction (content-identical,
  * non-blocking, optionally range-clustered) and snapshot-retention vacuum
  * (never drops the snapshot the current pointer serves). The nightly jobs
  * a 100-TB streamed-in lake table needs to stay scannable. */
class LakeMaintenanceSpec extends SparkTestBase {

  private def freshRoot(name: String): String =
    Files.createTempDirectory(s"lakemaint_$name").toString

  private def parquetFiles(root: String, stage: String, v: Int): Seq[File] = {
    val d = new File(s"$root/$stage/data_v$v")
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq
  }

  private def globalChecksum(df: org.apache.spark.sql.DataFrame): Long = {
    val cols = df.columns.map(col).toSeq
    df.agg(bit_xor(xxhash64(cols: _*))).collect()(0).getLong(0)
  }

  test("compact rewrites many small files into few, content-identical, old snapshot readable") {
    val root = freshRoot("compact")
    val lake = new LakeTable(root)
    // a streamed-in table: 16 tiny files
    lake.commit("t", spark.range(2000).toDF("id")
      .withColumn("k", pmod(col("id"), lit(7))).repartition(16), Map.empty)
    assert(parquetFiles(root, "t", 1).size === 16)
    val before = globalChecksum(lake.read(spark, "t"))

    val bytes = lake.dataBytes("t", 1)
    val newV = lake.compact(spark, "t", targetFileBytes = bytes) // everything fits one file
    assert(newV === 2)
    assert(parquetFiles(root, "t", 2).size === 1)
    assert(globalChecksum(lake.read(spark, "t")) === before)
    assert(lake.read(spark, "t").count() === 2000)
    // non-blocking: the pre-compaction snapshot is still time-travelable
    assert(lake.readAt(spark, "t", 1).count() === 2000)
    assert(lake.manifest("t").get.contains("\"compaction_of\":\"1\""))
  }

  test("compact clusterBy produces non-overlapping per-file key ranges (file-level skipping)") {
    val root = freshRoot("cluster")
    val lake = new LakeTable(root)
    // keys arrive shuffled across files, as a stream would leave them
    lake.commit("t", spark.range(4000).toDF("id")
      .withColumn("key", pmod(col("id") * 2654435761L, lit(4000)))
      .repartition(16), Map.empty)
    val bytes = lake.dataBytes("t", 1)
    lake.compact(spark, "t", targetFileBytes = bytes / 4 + 1, clusterBy = Seq("key"))
    val files = parquetFiles(root, "t", 2)
    assert(files.size >= 2, s"expected a multi-file rewrite, got ${files.size}")
    // each file holds a contiguous key range; ranges must not overlap —
    // that is exactly what parquet min/max footer stats need for skipping
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("key")), max(col("key"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlap: $ranges")
      case _ =>
    }
    assert(globalChecksum(lake.read(spark, "t")) ===
      globalChecksum(lake.readAt(spark, "t", 1)))
  }

  test("vacuum drops expired snapshots, keeps retained ones, time-travel fails only on dropped") {
    val root = freshRoot("vacuum")
    val lake = new LakeTable(root)
    lake.commit("t", spark.range(10).toDF("id"), Map.empty)  // v1
    lake.commit("t", spark.range(20).toDF("id"), Map.empty)  // v2
    lake.commit("t", spark.range(30).toDF("id"), Map.empty)  // v3
    // crash leftover that no manifest references
    Files.createDirectories(Paths.get(s"$root/t/junk.tmp"))
    // under the DEFAULT age cutoff a fresh .tmp is presumed in-flight
    // (a concurrent commit between write and ATOMIC_MOVE) and survives
    val dropped0 = lake.vacuum("t", retainLast = 3)
    assert(dropped0.isEmpty && Files.exists(Paths.get(s"$root/t/junk.tmp")))
    val dropped = lake.vacuum("t", retainLast = 2, orphanMinAgeMs = 0L)
    assert(dropped === Seq(1))
    assert(lake.versions("t") === Seq(2, 3))
    assert(lake.read(spark, "t").count() === 30)
    assert(lake.readAt(spark, "t", 2).count() === 20)
    intercept[IllegalArgumentException](lake.readAt(spark, "t", 1))
    assert(!Files.exists(Paths.get(s"$root/t/data_v1")))
    assert(!Files.exists(Paths.get(s"$root/t/junk.tmp")))
  }

  test("vacuum never drops the snapshot the current pointer serves (rollback safety)") {
    val root = freshRoot("rollback")
    val lake = new LakeTable(root)
    lake.commit("t", spark.range(10).toDF("id"), Map.empty)  // v1
    lake.commit("t", spark.range(20).toDF("id"), Map.empty)  // v2
    lake.commit("t", spark.range(30).toDF("id"), Map.empty)  // v3
    lake.rollback("t", 1)                                    // serving v1
    val dropped = lake.vacuum("t", retainLast = 1)
    assert(dropped === Seq(2))                               // v1 pinned, v3 retained
    assert(lake.read(spark, "t").count() === 10)             // still serving v1
    assert(lake.readAt(spark, "t", 3).count() === 30)
    intercept[IllegalArgumentException](lake.readAt(spark, "t", 2))
  }

  test("commitAppend writes ONLY the delta; readers of the new snapshot see old ∪ delta") {
    val root = freshRoot("append")
    val lake = new LakeTable(root)
    lake.commit("t", spark.range(100).toDF("id"), Map.empty)            // v1
    val v1Files = parquetFiles(root, "t", 1).map(f => (f.getName, f.lastModified))
    val v2 = lake.commitAppend("t", spark.range(100, 130).toDF("id"), Map.empty)
    assert(v2 === 2)
    // O(|batch|): the parent's files are untouched — same names, same mtimes
    assert(parquetFiles(root, "t", 1).map(f => (f.getName, f.lastModified)) === v1Files)
    // and the delta dir holds 30 rows, not 130
    assert(spark.read.parquet(s"$root/t/data_v2").count() === 30)
    assert(lake.read(spark, "t").count() === 130)
    assert(lake.readAt(spark, "t", 2).count() === 130)
    assert(lake.readAt(spark, "t", 1).count() === 100)                  // time travel
    assert(lake.manifest("t").get.contains("\"row_count\":\"130\""))    // snapshot TOTAL
    assert(lake.manifest("t").get.contains("\"append_of\":\"1\""))
    // a second append chains through the first's multi-dir snapshot
    lake.commitAppend("t", spark.range(130, 135).toDF("id"), Map.empty) // v3
    assert(lake.read(spark, "t").count() === 135)
    // dataBytes of an append snapshot spans parent dirs (compact sizing)
    assert(lake.dataBytes("t", 3) > lake.dataBytes("t", 1))
  }

  test("compact folds a multi-directory append snapshot into one dir; vacuum then frees parents") {
    val root = freshRoot("appendcompact")
    val lake = new LakeTable(root)
    lake.commit("t", spark.range(50).toDF("id"), Map.empty)             // v1
    lake.commitAppend("t", spark.range(50, 80).toDF("id"), Map.empty)   // v2 → [v1, v2]
    val before = globalChecksum(lake.read(spark, "t"))
    val v3 = lake.compact(spark, "t", targetFileBytes = Long.MaxValue)  // v3: one dir again
    assert(globalChecksum(lake.read(spark, "t")) === before)
    assert(lake.read(spark, "t").count() === 80)
    // vacuum to the compacted snapshot only: v1/v2 data now unreferenced
    val dropped = lake.vacuum("t", retainLast = 1, orphanMinAgeMs = 0L)
    assert(dropped === Seq(1, 2))
    assert(!Files.exists(Paths.get(s"$root/t/data_v1")))
    assert(lake.read(spark, "t").count() === 80)
    assert(v3 === 3)
  }

  test("metamorphic: random commit/append/compact/vacuum interleavings keep read() exact (3 seeds)") {
    // the lake's whole contract in one property: after ANY maintenance
    // history, read(current) returns exactly the rows the logical table
    // should hold, and the pointer's snapshot is never damaged
    for (seed <- Seq(1, 2, 3)) {
      val rng = new scala.util.Random(seed)
      val root = freshRoot(s"meta$seed")
      val lake = new LakeTable(root)
      var next = 0L
      def batch(n: Int) = { val d = spark.range(next, next + n).toDF("id"); next += n; d }
      lake.commit("t", batch(20 + rng.nextInt(30)), Map.empty)
      var expectRows = next
      for (_ <- 1 to 8) rng.nextInt(4) match {
        case 0 => lake.commitAppend("t", batch(1 + rng.nextInt(25)), Map.empty)
          expectRows = next
        case 1 => next += 10 + rng.nextInt(20)                          // full rewrite
          lake.commit("t", spark.range(0, next).toDF("id"), Map.empty)
          expectRows = next
        case 2 => lake.compact(spark, "t",
            targetFileBytes = (1 + rng.nextInt(2)).toLong * (1 << 20))
        case 3 => lake.vacuum("t", retainLast = 1 + rng.nextInt(3),
            orphanMinAgeMs = 0L)
      }
      val got = lake.read(spark, "t")
      assert(got.count() === expectRows, s"seed=$seed row count")
      assert(got.agg(sum(col("id"))).collect()(0).getLong(0)
        === expectRows * (expectRows - 1) / 2, s"seed=$seed content")
    }
  }

  test("vacuum never deletes a data dir a retained append snapshot still references") {
    val root = freshRoot("appendvacuum")
    val lake = new LakeTable(root)
    lake.commit("t", spark.range(40).toDF("id"), Map.empty)             // v1
    lake.commitAppend("t", spark.range(40, 60).toDF("id"), Map.empty)   // v2 refs data_v1
    lake.commitAppend("t", spark.range(60, 70).toDF("id"), Map.empty)   // v3 refs v1+v2
    val dropped = lake.vacuum("t", retainLast = 1, orphanMinAgeMs = 0L)
    assert(dropped === Seq(1, 2))                                       // snapshots expire…
    assert(Files.exists(Paths.get(s"$root/t/data_v1")))                 // …their data survives
    assert(Files.exists(Paths.get(s"$root/t/data_v2")))
    assert(lake.read(spark, "t").count() === 70)                        // v3 fully readable
  }
}
