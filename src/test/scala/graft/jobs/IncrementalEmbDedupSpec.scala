package graft.jobs

import java.nio.file.Files

import graft.queries.EmbQueries
import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._

/** Batch-append incremental SemDeDup: an appended batch must find EXACTLY
  * the pairs a full recompute over old ∪ new finds that involve a new
  * vector — including the cell-size cap judged on the union counts. */
class IncrementalEmbDedupSpec extends SparkTestBase {
  import spark.implicits._

  /** deterministic pseudo-random unit-ish vector; positive scaling keeps
    * the product-quantizer cell (argmax of dots is scale-invariant) AND
    * cosine = 1, so scaled copies are guaranteed same-cell dups. */
  private def vec(seed: Int): Seq[Float] = {
    val r = new scala.util.Random(seed)
    Seq.fill(EmbQueries.Dim)((r.nextGaussian() / 4).toFloat)
  }
  private def scaled(v: Seq[Float], s: Float): Seq[Float] = v.map(x => x * s)

  // base corpus: dup pair (3,4); 1, 2 unique
  private lazy val baseVecs = Seq(
    (1L, vec(101)), (2L, vec(102)),
    (3L, vec(103)), (4L, scaled(vec(103), 1.5f)))
    .toDF("vec_id", "embedding")

  // batch: 5 dups (3,4) (new×old); 6/7 a new-only dup pair; 8 unique
  private lazy val batchVecs = Seq(
    (5L, scaled(vec(103), 2.0f)),
    (6L, vec(106)), (7L, scaled(vec(106), 1.2f)),
    (8L, vec(108)))
    .toDF("vec_id", "embedding")

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def fullPairs(vecs: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val p = pairsOf(EmbQueries.semPairsOf(vecs))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    p
  }

  test("append finds exactly the full-recompute pairs that involve a new vector") {
    val root = Files.createTempDirectory("incemb").toString
    IncrementalEmbDedup.init(spark, baseVecs, root)
    val appendPairs = pairsOf(IncrementalEmbDedup.append(spark, batchVecs, root))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()

    val full = fullPairs(baseVecs.unionByName(batchVecs))
    val newIds = Set(5L, 6L, 7L, 8L)
    val expected = full.filter { case (a, b) => newIds(a) || newIds(b) }

    assert(appendPairs === expected,
      s"append=$appendPairs expected=$expected full=$full")
    // the fixture must exercise both the new×old and the new×new path
    assert(appendPairs.contains((3L, 5L)) && appendPairs.contains((4L, 5L)),
      "new×old semantic dups missing")
    assert(appendPairs.contains((6L, 7L)), "new×new semantic dup missing")
    assert(!appendPairs.exists { case (a, b) => !newIds(a) && !newIds(b) },
      "append must not re-report old×old pairs")
  }

  test("store snapshots: append commits a new version; a second append sees the enlarged store") {
    val root = Files.createTempDirectory("incemb2").toString
    val lake = new graft.lake.LakeTable(root)
    IncrementalEmbDedup.init(spark, baseVecs, root)
    assert(lake.versions(IncrementalEmbDedup.CellStage) === Seq(1))
    IncrementalEmbDedup.append(spark, batchVecs, root)
    assert(lake.versions(IncrementalEmbDedup.CellStage) === Seq(1, 2))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()

    // a later batch duplicating a FIRST-batch vector is found via the store
    val batch2 = Seq((9L, scaled(vec(106), 0.8f))).toDF("vec_id", "embedding")
    val p2 = pairsOf(IncrementalEmbDedup.append(spark, batch2, root))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(p2 === Set((6L, 9L), (7L, 9L)), s"got $p2")
    assert(lake.versions(IncrementalEmbDedup.CellStage) === Seq(1, 2, 3))
    // time-travel: version 1 still reads the original 4-vector store
    assert(lake.readAt(spark, IncrementalEmbDedup.CellStage, 1).count() === 4)
  }

  test("intra-batch duplicate delivery appends ONE store row and reports no duplicate pairs") {
    // the disjointness guard must hold WITHIN a batch too: an at-least-once
    // source can compact two deliveries of one vec_id into one micro-batch
    // (round-4 review) — a doubled store row would double every future
    // refine join match for that id
    val root = Files.createTempDirectory("incemb_dup").toString
    val lake = new graft.lake.LakeTable(root)
    IncrementalEmbDedup.init(spark, baseVecs, root)
    val doubled = batchVecs.unionByName(batchVecs.where(col("vec_id") === 5L))
    val rows = IncrementalEmbDedup.append(spark, doubled, root).collect()
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      rows.map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq,
      "duplicate pair rows from an intra-batch duplicate")
    val store = lake.read(spark, IncrementalEmbDedup.CellStage)
    assert(store.where(col("vec_id") === 5L).count() === 1,
      "intra-batch duplicate appended a second store row")
    // fast-append: the v2 delta holds ONLY the 4 batch vectors
    assert(spark.read.parquet(
      s"$root/${IncrementalEmbDedup.CellStage}/data_v2").count() === 4)
    assert(store.count() === 8)
  }

  test("cap parity: a batch that pushes a cell past SemMaxCell kills it on BOTH faces") {
    // one direction, many positive scalings → one cell, pairwise cosine 1
    val base = vec(777)
    def clones(ids: Range): Seq[(Long, Seq[Float])] =
      ids.map(i => (i.toLong, scaled(base, 1.0f + i / 1000.0f)))

    val root = Files.createTempDirectory("incembcap").toString
    val n0 = EmbQueries.SemMaxCell - 56 // 200: under cap
    IncrementalEmbDedup.init(spark, clones(1 to n0).toDF("vec_id", "embedding"), root)

    // +1 → 201 ≤ cap: the new vector pairs with every store member
    val p1 = pairsOf(IncrementalEmbDedup.append(
      spark, clones(n0 + 1 to n0 + 1).toDF("vec_id", "embedding"), root))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(p1.size === n0 && p1.forall(_._2 === (n0 + 1).toLong), s"got ${p1.size} pairs")

    // +100 → 301 > cap: the cell is dead for the append AND the recompute
    val big = clones(n0 + 2 to n0 + 101).toDF("vec_id", "embedding")
    val p2 = pairsOf(IncrementalEmbDedup.append(spark, big, root))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(p2.isEmpty, s"over-cap cell must yield no pairs, got ${p2.size}")
    assert(fullPairs(clones(1 to n0 + 101).toDF("vec_id", "embedding")).isEmpty,
      "full recompute must also skip the over-cap cell")
  }

  test("streaming face: micro-batches append through the store; replayed batch id is idempotent") {
    val root = Files.createTempDirectory("incembstream").toString
    val in = Files.createTempDirectory("incembstream_in").toString
    val out = Files.createTempDirectory("incembstream_out").toString + "/pairs"
    val ck = Files.createTempDirectory("incembstream_ck").toString
    IncrementalEmbDedup.init(spark, baseVecs, root)

    def runAvailable(): Unit = {
      val schema = spark.read.parquet(in).schema
      val q = IncrementalEmbDedup.appendStream(
        spark.readStream.schema(schema).parquet(in), root, out, ck)
      q.awaitTermination()
    }

    batchVecs.write.mode("append").parquet(in)
    runAvailable()
    val p1 = pairsOf(spark.read.parquet(out))
    val full1 = fullPairs(baseVecs.unionByName(batchVecs))
    val newIds1 = Set(5L, 6L, 7L, 8L)
    assert(p1 === full1.filter { case (a, b) => newIds1(a) || newIds1(b) })

    val batch2 = Seq((9L, scaled(vec(106), 0.8f))).toDF("vec_id", "embedding")
    batch2.write.mode("append").parquet(in)
    runAvailable()
    val p2 = pairsOf(spark.read.parquet(out))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(p2 === p1 ++ Set((6L, 9L), (7L, 9L)), s"got $p2")

    // replay guard: an ALREADY-COMMITTED batch id neither double-commits
    // the store nor changes the pair set
    val lake = new graft.lake.LakeTable(root)
    val versionsBefore = lake.versions(IncrementalEmbDedup.CellStage)
    val replay = pairsOf(IncrementalEmbDedup.append(spark, batch2, root, Some(1L)))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(replay === Set((6L, 9L), (7L, 9L)), s"replay=$replay")
    assert(lake.versions(IncrementalEmbDedup.CellStage) === versionsBefore,
      "replayed batch must not commit a new store version")
  }
}
