package graft.jobs

import java.nio.file.Files

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._

/** End-to-end corpus dedup pipeline: exact losers drop, near-dup
  * components keep their longest member, unique docs survive — and a
  * second run resumes from the committed snapshots instead of
  * recomputing (no new versions, identical rows). */
class CorpusDedupJobSpec extends SparkTestBase {
  import spark.implicits._

  private val base = (1 to 60).map(i => s"w$i").mkString(" ")

  private lazy val docsDf = Seq(
    (1L, "dup dup dup one two three four five six seven"),
    (2L, "dup dup dup one two three four five six seven"), // exact twin → loses
    (3L, base + " x3"),                                     // near-dup of 4,5
    (4L, base + " x4 extra extra2"),                        // longest → keeps
    (5L, base + " x5"),
    (6L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (7L, "unique seven words in this one doc right here yes"))
    .map { case (id, t) => (id, t, t.length.toLong) }
    .toDF("doc_id", "text", "n_chars")

  test("pipeline keeps exact winner, canonical near-dup, uniques; resumes without recommit") {
    val root = Files.createTempDirectory("corpus_lake").toString
    val cleaned = CorpusDedupJob.run(spark, docsDf, root)
    val ids = cleaned.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 4L, 6L, 7L), s"survivors: $ids")

    // committed artifacts exist with lineage for every stage
    val lake = new graft.lake.LakeTable(root)
    Seq("exact_losers", "neardup_labels", "neardup_losers", "cleaned").foreach { s =>
      assert(lake.isCommitted(s), s"stage $s committed")
      assert(lake.readLineage(spark, s).count() >= 1, s"stage $s lineage")
      assert(lake.versions(s) === Seq(1), s"stage $s single version")
    }
    assert(lake.read(spark, "exact_losers").collect().map(_.getLong(0)).toSet === Set(2L))
    assert(lake.read(spark, "neardup_losers").collect().map(_.getLong(0)).toSet === Set(3L, 5L))

    // replay: every stage resumes from its manifest — same rows, no v2
    val again = CorpusDedupJob.run(spark, docsDf, root)
    assert(again.select(col("doc_id")).collect().map(_.getLong(0)).toSet === ids)
    Seq("exact_losers", "neardup_labels", "neardup_losers", "cleaned").foreach { s =>
      assert(lake.versions(s) === Seq(1), s"stage $s must not recommit")
    }
  }

  test("CC fixed-point rounds are reliable lake stages; a crash before a round's commit resumes without recomputing earlier rounds") {
    val root = Files.createTempDirectory("cc_lake").toString
    val lake = new graft.lake.LakeTable(root)

    val labels = StagedCC.minhashLabels(spark, docsDf, lake, "cc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)

    // byte-equal to the in-memory (gate-query) fixed point
    val expected = graft.queries.TextQueries.minhashLabelsOf(spark, docsDf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(labels === expected, "staged CC must equal in-memory CC")
    org.apache.spark.sql.GraftCheckpoints.releaseAll()

    // every round is an independently committed snapshot
    val rounds = Iterator.from(0).takeWhile(i => lake.isCommitted(s"cc_round_$i")).toSeq
    assert(rounds.length >= 3, s"expected seed + ≥1 propagation + converged round, got $rounds")
    val lastRound = s"cc_round_${rounds.last}"
    val earlier = ("cc_edges" +: rounds.init.map(i => s"cc_round_$i")).toSeq
    val manifestsBefore = earlier.map(s => s -> lake.manifest(s).get).toMap

    // simulate a crash where the LAST round's commit never landed: its
    // manifest pointer is gone (partial data without a manifest is exactly
    // what a mid-write crash leaves behind — LakeTable contract)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$root/$lastRound/_manifest.json"))
    assert(!lake.isCommitted(lastRound))

    // rerun: earlier rounds resume from their manifests untouched, only the
    // crashed round recommits, and the labels are identical
    val labels2 = StagedCC.minhashLabels(spark, docsDf, lake, "cc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(labels2 === labels, "resumed run must reproduce the labels")
    assert(lake.isCommitted(lastRound), "crashed round recommitted")
    earlier.foreach { s =>
      assert(lake.manifest(s).get === manifestsBefore(s),
        s"stage $s must not recommit on resume")
    }
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
  }
}
