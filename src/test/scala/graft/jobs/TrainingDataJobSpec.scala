package graft.jobs

import java.nio.file.Files

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._

/** The end-to-end pipeline over a corpus with one PLANTED artifact per
  * stage: a quality reject, an exact duplicate, a near-duplicate, and a
  * benchmark-contaminated doc — each must fall at exactly its stage, and
  * a rerun must resume from the committed stages without recomputing. */
class TrainingDataJobSpec extends SparkTestBase {
  import spark.implicits._

  private def words(stem: String): String =
    (1 to 60).map(i => s"$stem$i").mkString(" ")

  // 1  clean survivor          4  near-dup of 3 (keep 3)
  // 2  clean survivor          5  exact dup of 1's text? no — of doc 6
  // 6/7 exact dup pair (keep 6)
  // 8  digit spam — quality reject
  // 9  contaminated: shares the eval 5-gram
  private lazy val corpus = Seq(
    (1L, words("alpha")),
    (2L, words("beta")),
    (3L, words("gamma") + " tailthree"),
    (4L, words("gamma") + " tailfour"),
    (6L, words("delta")),
    (7L, words("delta")),
    (8L, (1 to 60).map(i => s"${i % 7}").mkString(" ")),
    (9L, words("omicron") + " canaryq one two three four"))
    .toDF("doc_id", "text")

  private lazy val evalSet = Seq(
    (9001L, "held out benchmark canaryq one two three four prompt"))
    .toDF("doc_id", "text")

  test("each planted artifact falls at its stage; store layout + parity; rerun resumes") {
    val lakeRoot = Files.createTempDirectory("tdj_lake").toString
    val store = Files.createTempDirectory("tdj_store").toString + "/store"
    val out = TrainingDataJob.run(spark, corpus, evalSet, lakeRoot, store)
    org.apache.spark.sql.GraftCheckpoints.releaseAll()

    val survivors = out.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(survivors === Set(1L, 2L, 3L, 6L),
      s"survivors=$survivors (8=quality, 7=exact, 4=neardup, 9=contaminated must fall)")

    // the per-stage report pins WHERE each artifact fell
    val counts = TrainingDataJob.report(spark, lakeRoot).map(c => c.stage -> c.docs).toMap
    val Seq(sQ, sE, sN, sD, sS) = TrainingDataJob.stageNames
    assert(counts(sQ) === 7, "quality gate drops exactly doc 8")
    assert(counts(sE) === 6, "exact dedup drops exactly doc 7")
    assert(counts(sN) === 5, "near-dup canonicalization drops exactly doc 4")
    assert(counts(sD) === 4, "decontamination drops exactly doc 9")
    assert(counts(sS) === 4)

    // store: hive layout + assignment parity with the batch expression
    val stored = spark.read.parquet(store)
      .select(col("doc_id"), col("split"), col("shard").cast("long").as("shard"))
    val expected = graft.queries.QualityQueries.withShardAssignment(
      corpus.where(col("doc_id").isin(1L, 2L, 3L, 6L)))
      .select(col("doc_id"), col("split"), col("shard"))
    assert(stored.exceptAll(expected).isEmpty && expected.exceptAll(stored).isEmpty)

    // rerun = RESUME: no stage recomputes (no new snapshot versions), the
    // store is NOT rewritten (_SUCCESS mtime unchanged), result identical
    val lake = new graft.lake.LakeTable(lakeRoot)
    val versionsBefore = TrainingDataJob.stageNames.map(s => lake.versions(s))
    val marker = new java.io.File(s"$store/_SUCCESS")
    assert(marker.exists(), "store write must leave the _SUCCESS marker")
    val markerMtime = marker.lastModified()
    val again = TrainingDataJob.run(spark, corpus, evalSet, lakeRoot, store)
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(TrainingDataJob.stageNames.map(s => lake.versions(s)) === versionsBefore,
      "rerun must resume committed stages, not recompute them")
    assert(marker.lastModified() === markerMtime,
      "resumed rerun rewrote the training store")
    assert(again.select(col("doc_id")).collect().map(_.getLong(0)).toSet === survivors)

    // the report reads manifest stats only — counts match the scans above
    assert(TrainingDataJob.report(spark, lakeRoot).map(_.docs) === Seq(7L, 6L, 5L, 4L, 4L))
  }

  test("incremental face: init then a daily batch with one artifact per gate; replayed batch appends nothing") {
    val lakeRoot = Files.createTempDirectory("tdj_inc_lake").toString
    val store = Files.createTempDirectory("tdj_inc_store").toString + "/store"

    val init = TrainingDataJob.initIncremental(spark, corpus, evalSet, lakeRoot, store)
    val initIds = init.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(initIds === Set(1L, 2L, 3L, 6L), s"init=$initIds")

    // batch: 11 quality-fail; 12 near-dup of STORED 1 (dropped via the
    // signature store); 13/14 a batch-internal dup pair (keep 13);
    // 15 contaminated; 16 clean survivor
    val batch = Seq(
      (11L, (1 to 60).map(i => s"${i % 5}").mkString(" ")),
      (12L, words("alpha") + " recrawl"),
      (13L, words("sigmaword") + " tailone"),
      (14L, words("sigmaword") + " tailtwo"),
      (15L, words("rhoword") + " canaryq one two three four"),
      (16L, words("tauword")))
      .toDF("doc_id", "text")
    val appended = TrainingDataJob.appendBatch(
      spark, batch, evalSet, lakeRoot, store, Some(1L))
    val batchIds = appended.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(batchIds === Set(13L, 16L),
      s"batch survivors=$batchIds (11=quality, 12=store-dup, 14=batch-dup, 15=contaminated)")

    val stored = spark.read.parquet(store).select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    assert(stored === initIds ++ batchIds)

    // replay of the SAME batch id: no duplicate store rows, same survivors
    val replay = TrainingDataJob.appendBatch(
      spark, batch, evalSet, lakeRoot, store, Some(1L))
    val replayIds = replay.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(replayIds === batchIds)
    assert(spark.read.parquet(store).count() === (initIds ++ batchIds).size.toLong,
      "replayed batch appended duplicate store rows")

    // batch 2 (round-4 review): 16 REDELIVERED under a new batch id (an
    // at-least-once source) must not re-enter the store; 0 near-dups
    // STORED 13 with a SMALLER id — the store copy cannot be retracted,
    // so the newcomer is dropped regardless of id order
    val batch2 = Seq(
      (16L, words("tauword")),
      (0L, words("sigmaword") + " tailthree"))
      .toDF("doc_id", "text")
    val b2 = TrainingDataJob.appendBatch(
      spark, batch2, evalSet, lakeRoot, store, Some(2L))
    val b2Ids = b2.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(b2Ids === Set.empty[Long],
      s"batch2 survivors=$b2Ids (16=cross-batch redelivery, 0=smaller-id dup of stored 13)")
    assert(spark.read.parquet(store).where(col("doc_id") === 16L).count() === 1,
      "redelivered doc re-entered the training store")
    assert(spark.read.parquet(store).count() === (initIds ++ batchIds).size.toLong)

    // CRASH WINDOW (round-4 review): batch 3's signatures committed but
    // the job died before the store write (no marker). The retry must
    // recognize the replay from the SIG-STORE manifest — marker-based
    // evidence would anti-join the whole batch away and permanently lose
    // its survivors.
    val batch3 = Seq((20L, words("upsilonword"))).toDF("doc_id", "text")
    IncrementalDedup.append(spark, batch3, lakeRoot, Some(3L)).count() // "crashed" run
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    val retry = TrainingDataJob.appendBatch(
      spark, batch3, evalSet, lakeRoot, store, Some(3L))
    val retryIds = retry.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
    assert(retryIds === Set(20L), s"crash-window retry lost survivors: $retryIds")
    assert(spark.read.parquet(store).where(col("doc_id") === 20L).count() === 1,
      "crash-window retry must land the batch's survivors exactly once")
  }

  test("property: under ANY batch split the store is an independent set of the near-dup relation (3 seeds)") {
    // The universal invariant of the online face — whatever the split, no
    // two training-store docs directly near-dup each other (which docs
    // survive IS split-dependent: greedy online dedup, documented). Also:
    // replaying every batch id leaves the store byte-identical.
    for (seed <- Seq(11, 12, 13)) {
      val rng = new scala.util.Random(seed)
      // 18 docs in 6 content families of 3 (family = near-dups). Stems are
      // LETTER-only: digit-heavy stems fail the quality gate and an empty
      // gated set would leave an unreadable empty sig store.
      val fams = Seq.tabulate(6)(f =>
        words(s"fam${('a' + seed - 11).toChar}${('a' + f).toChar}word"))
      val docIds = rng.shuffle((1 to 18).toList)
      val corpusRows = docIds.zipWithIndex.map { case (id, i) =>
        (id.toLong, fams(i % 6) + s" tail$id") }
      val parts = corpusRows.groupBy(_ => rng.nextInt(3)) // up to 3 batches
      val batches = (0 to 2).flatMap(parts.get).filter(_.nonEmpty)

      val lakeRoot = Files.createTempDirectory(s"tdj_prop$seed").toString
      val store = Files.createTempDirectory(s"tdj_props$seed").toString + "/s"
      TrainingDataJob.initIncremental(
        spark, batches.head.toDF("doc_id", "text"), evalSet, lakeRoot, store)
      org.apache.spark.sql.GraftCheckpoints.releaseAll()
      batches.tail.zipWithIndex.foreach { case (b, i) =>
        TrainingDataJob.appendBatch(spark, b.toDF("doc_id", "text"),
          evalSet, lakeRoot, store, Some(i.toLong)).count()
        org.apache.spark.sql.GraftCheckpoints.releaseAll()
      }
      val storedDocs = spark.read.parquet(store)
        .select(col("doc_id"), col("text"))
      val internalPairs = graft.queries.TextQueries
        .minhashPairsOf(spark, storedDocs).count()
      org.apache.spark.sql.GraftCheckpoints.releaseAll()
      assert(internalPairs === 0,
        s"seed=$seed: store contains direct near-dups")
      // replay every append batch id — store must not change
      val before = spark.read.parquet(store).count()
      batches.tail.zipWithIndex.foreach { case (b, i) =>
        TrainingDataJob.appendBatch(spark, b.toDF("doc_id", "text"),
          evalSet, lakeRoot, store, Some(i.toLong)).count()
        org.apache.spark.sql.GraftCheckpoints.releaseAll()
      }
      assert(spark.read.parquet(store).count() === before,
        s"seed=$seed: replay changed the store")
    }
  }
}
