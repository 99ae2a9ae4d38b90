package graft.jobs

import java.nio.file.Files

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._

/** Batch-append incremental near-dup: an appended batch must find EXACTLY
  * the pairs a full recompute over old ∪ new finds that involve a new doc
  * (VERDICT r2 "Next round" #9 done-criterion). */
class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base60 = (1 to 60).map(i => s"w$i").mkString(" ")
  private val alt60 = (1 to 60).map(i => s"v$i").mkString(" ")

  // base corpus: near-dup pair (3,4); unique 1, 2
  private lazy val baseDocs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, base60 + " x3"),
    (4L, base60 + " x4"))
    .toDF("doc_id", "text")

  // batch: 5 near-dups (3,4); 6/7 a new-only near-dup pair; 8 unique
  private lazy val batchDocs = Seq(
    (5L, base60 + " x5"),
    (6L, alt60 + " y6"),
    (7L, alt60 + " y7"),
    (8L, "totally unrelated words that match nothing else at all here"))
    .toDF("doc_id", "text")

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("append finds exactly the full-recompute pairs that involve a new doc") {
    val root = Files.createTempDirectory("incdedup").toString
    IncrementalDedup.init(spark, baseDocs, root)
    val appendPairs = pairsOf(IncrementalDedup.append(spark, batchDocs, root))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()

    val full = pairsOf(graft.queries.TextQueries.minhashPairsOf(
      spark, baseDocs.unionByName(batchDocs)))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    val newIds = Set(5L, 6L, 7L, 8L)
    val expected = full.filter { case (a, b) => newIds(a) || newIds(b) }

    assert(appendPairs === expected,
      s"append=$appendPairs expected=$expected full=$full")
    // the fixture must actually exercise both the new×old and the new×new path
    assert(appendPairs.contains((3L, 5L)) && appendPairs.contains((4L, 5L)),
      "new×old near-dups missing")
    assert(appendPairs.contains((6L, 7L)), "new×new near-dup missing")
    assert(!appendPairs.exists { case (a, b) => !newIds(a) && !newIds(b) },
      "append must not re-report old×old pairs")
  }

  test("store snapshots: append commits a new version; a second append sees the enlarged store") {
    val root = Files.createTempDirectory("incdedup2").toString
    val lake = new graft.lake.LakeTable(root)
    IncrementalDedup.init(spark, baseDocs, root)
    assert(lake.versions(IncrementalDedup.SigStage) === Seq(1))
    IncrementalDedup.append(spark, batchDocs, root)
    assert(lake.versions(IncrementalDedup.SigStage) === Seq(1, 2))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()

    // a later batch near-duplicating a FIRST-batch doc is found via the store
    val batch2 = Seq((9L, alt60 + " y9")).toDF("doc_id", "text")
    val p2 = pairsOf(IncrementalDedup.append(spark, batch2, root))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(p2 === Set((6L, 9L), (7L, 9L)), s"got $p2")
    assert(lake.versions(IncrementalDedup.SigStage) === Seq(1, 2, 3))
    // time-travel: version 1 still reads the original 4-doc store
    assert(lake.readAt(spark, IncrementalDedup.SigStage, 1).count() === 4)
  }

  test("intra-batch duplicate delivery appends ONE store row and reports no duplicate pairs") {
    // an at-least-once source can compact two deliveries of the same doc
    // into one micro-batch — the disjointness guard must hold WITHIN the
    // batch, not just against the store (round-4 review)
    val root = Files.createTempDirectory("incdedup_dup").toString
    val lake = new graft.lake.LakeTable(root)
    IncrementalDedup.init(spark, baseDocs, root)
    val doubled = batchDocs.unionByName(
      batchDocs.where(col("doc_id") === 5L)) // doc 5 delivered twice
    val rows = IncrementalDedup.append(spark, doubled, root).collect()
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      rows.map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq,
      "duplicate pair rows from an intra-batch duplicate")
    val store = lake.read(spark, IncrementalDedup.SigStage)
    assert(store.where(col("doc_id") === 5L).count() === 1,
      "intra-batch duplicate appended a second signature row")
    // fast-append: the v2 delta dir holds ONLY the batch's 4 docs (the
    // commit is O(|batch|), the parent's 4 rows are referenced not rewritten)
    assert(spark.read.parquet(
      s"$root/${IncrementalDedup.SigStage}/data_v2").count() === 4)
    assert(store.count() === 8)
  }

  test("metamorphic: ANY 3-way corpus split appended sequentially ≡ one full recompute (3 random splits)") {
    // synthetic corpus with planted near-dup clusters spanning arbitrary
    // split boundaries: cluster c = docs {3c, 3c+1, 3c+2} share a base
    // text; singles are pairwise unrelated
    val rnd = new scala.util.Random(11)
    val docsAll = (0 until 8).flatMap { c =>
      val base = (1 to 60).map(i => s"c${c}w$i").mkString(" ")
      (0 until 3).map(k => ((c * 3 + k).toLong, s"$base tail$k"))
    } ++ (24 until 30).map(i => (i.toLong, s"single $i " + (1 to 30).map(j => s"s$i$j").mkString(" ")))
    val full = pairsOf(graft.queries.TextQueries.minhashPairsOf(
      spark, docsAll.toDF("doc_id", "text")))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()

    (1 to 3).foreach { trial =>
      val shuffled = rnd.shuffle(docsAll)
      val (s1, rest) = shuffled.splitAt(shuffled.length / 3)
      val (s2, s3) = rest.splitAt(rest.length / 2)
      val root = Files.createTempDirectory(s"incmeta$trial").toString
      IncrementalDedup.init(spark, s1.toDF("doc_id", "text"), root)
      val p2 = pairsOf(IncrementalDedup.append(spark, s2.toDF("doc_id", "text"), root))
      val p3 = pairsOf(IncrementalDedup.append(spark, s3.toDF("doc_id", "text"), root))
      org.apache.spark.sql.GraftCheckpoints.releaseAll()
      // init's internal pairs (s1×s1) are what a full recompute finds
      // among s1 docs — recover them from the committed store directly
      val ids1 = s1.map(_._1).toSet
      val p1 = full.filter { case (a, b) => ids1(a) && ids1(b) }
      assert((p1 ++ p2 ++ p3) === full,
        s"trial $trial: union of per-batch pairs must equal the full recompute")
      // batches report ONLY pairs involving their own docs
      val ids2 = s2.map(_._1).toSet
      assert(p2.forall { case (a, b) => ids2(a) || ids2(b) }, s"trial $trial p2 scope")
    }
  }

  test("streaming face: micro-batches append through the store; replayed batch id is idempotent") {
    val root = Files.createTempDirectory("incstream").toString
    val in = Files.createTempDirectory("incstream_in").toString
    val out = Files.createTempDirectory("incstream_out").toString + "/pairs"
    val ck = Files.createTempDirectory("incstream_ck").toString
    IncrementalDedup.init(spark, baseDocs, root)

    def runAvailable(): Unit = {
      val schema = spark.read.parquet(in).schema
      val q = IncrementalDedup.appendStream(
        spark.readStream.schema(schema).parquet(in), root, out, ck)
      q.awaitTermination()
    }

    batchDocs.write.mode("append").parquet(in)
    runAvailable()
    val p1 = pairsOf(spark.read.parquet(out))
    val full1 = pairsOf(graft.queries.TextQueries.minhashPairsOf(
      spark, baseDocs.unionByName(batchDocs)))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    val newIds1 = Set(5L, 6L, 7L, 8L)
    assert(p1 === full1.filter { case (a, b) => newIds1(a) || newIds1(b) })

    val batch2 = Seq((9L, alt60 + " y9")).toDF("doc_id", "text")
    batch2.write.mode("append").parquet(in)
    runAvailable()
    val p2 = pairsOf(spark.read.parquet(out))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(p2 === p1 ++ Set((6L, 9L), (7L, 9L)), s"got $p2")

    // replay guard: re-running append with an ALREADY-COMMITTED batch id
    // neither double-commits the store nor changes the pair set
    val lake = new graft.lake.LakeTable(root)
    val versionsBefore = lake.versions(IncrementalDedup.SigStage)
    val replay = pairsOf(IncrementalDedup.append(spark, batch2, root, Some(1L)))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(replay === Set((6L, 9L), (7L, 9L)), s"replay=$replay")
    assert(lake.versions(IncrementalDedup.SigStage) === versionsBefore,
      "replayed batch must not commit a new store version")
  }

  test("LATE replay (older batch id redelivered after newer commits) is recognized, not emptied") {
    val root = Files.createTempDirectory("incdedup_late").toString
    val lake = new graft.lake.LakeTable(root)
    IncrementalDedup.init(spark, baseDocs, root)
    val p1 = pairsOf(IncrementalDedup.append(spark, batchDocs, root, Some(1L)))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    val batch2 = Seq((9L, alt60 + " y9")).toDF("doc_id", "text")
    IncrementalDedup.append(spark, batch2, root, Some(2L))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    val versionsBefore = lake.versions(IncrementalDedup.SigStage)
    // redeliver batch 1 AFTER batch 2 committed: a head-manifest-only probe
    // would misread it as new, anti-join everything away, and return {}
    val late = pairsOf(IncrementalDedup.append(spark, batchDocs, root, Some(1L)))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(p1.subsetOf(late), s"late replay lost pairs: $p1 -> $late")
    // plus the truthful additions vs the CURRENT store (6/7 now pair with 9)
    assert(late === p1 ++ Set((6L, 9L), (7L, 9L)), s"late=$late")
    assert(lake.versions(IncrementalDedup.SigStage) === versionsBefore,
      "late replay must not commit")
  }

  test("a crash-orphan manifest (written before the pointer moved) is NOT replay evidence") {
    // commitData writes _manifest_vN.json BEFORE the pointer's ATOMIC_MOVE;
    // a crash between the two leaves an orphan whose batch rows are NOT in
    // the store. Counting it as commit evidence would skip the recommit
    // forever and silently lose the batch (round-4 review).
    val root = Files.createTempDirectory("incdedup_orphan").toString
    val lake = new graft.lake.LakeTable(root)
    IncrementalDedup.init(spark, baseDocs, root)
    // simulate the crash: an orphan v2 manifest carrying batch_id 1, with
    // the pointer still on v1 and no v2 data committed
    Files.write(java.nio.file.Paths.get(
      s"$root/${IncrementalDedup.SigStage}/_manifest_v2.json"),
      """{"stage":"x","version":"2","batch_id":"1"}""".getBytes)
    assert(lake.currentVersion(IncrementalDedup.SigStage) === Some(1))
    // the redelivered batch must be treated as NEW: rows committed, pairs found
    val pairs = pairsOf(IncrementalDedup.append(spark, batchDocs, root, Some(1L)))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(pairs.contains((3L, 5L)) && pairs.contains((6L, 7L)), s"got $pairs")
    assert(lake.read(spark, IncrementalDedup.SigStage).count() === 8,
      "batch rows were never committed — orphan manifest misread as evidence")
  }
}
