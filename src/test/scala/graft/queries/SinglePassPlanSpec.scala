package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.execution.{FileSourceScanExec, GenerateExec}

/** Plan-shape gates for the VERDICT r3 single-pass fixes: the expensive
  * streams (the N×L 5-gram explode of the decontamination family, the
  * 4-table × 16-hyperplane bucket pass of embedding dedup) must be
  * evaluated exactly once per query — the r3 shapes ran each twice inside
  * one action (a doubled full-stream pass at 100 TB). */
class SinglePassPlanSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def docScans(df: DataFrame): Int =
    allPlanNodes(df.queryExecution.executedPlan).count {
      case f: FileSourceScanExec =>
        f.relation.location.inputFiles.exists(_.contains("documents.parquet"))
      case _ => false
    }

  private def generates(df: DataFrame): Int =
    allPlanNodes(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[GenerateExec])

  test("q60 decontaminate explodes the train gram stream exactly once") {
    val df = QualityQueries.decontaminate(spark, sf)
    // one corpus scan, one gram explode: totals AND hits come out of the
    // single rollup (the r3 shape had two of each plus a global distinct)
    assert(docScans(df) === 1, "train side must scan documents once")
    assert(generates(df) === 1, "train gram stream must explode once")
    // no Expand: a multi-countDistinct rollup would triple the gram stream
    // map-side (the round-4 review finding); the two-stage shape dedups
    // pairs in the stream's only wide exchange instead
    val expands = allPlanNodes(df.queryExecution.executedPlan).count(
      _.isInstanceOf[org.apache.spark.sql.execution.ExpandExec])
    assert(expands === 0, "gram stream must not pass through Expand")
    // and the stream itself faces ≤ 1 exchange before the doc-level
    // rollup: pair-dedup + per-doc + output sort = 3 exchanges total
    val exchanges = allPlanNodes(df.queryExecution.executedPlan).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(exchanges <= 3, s"expected ≤3 exchanges (pair dedup, doc rollup, sort), got $exchanges")
    assert(df.count() > 0)
    GraftCheckpoints.releaseAll()
  }

  test("q64 contamination report explodes the train gram stream exactly once") {
    val df = QualityQueries.contaminationReport(spark, sf)
    assert(docScans(df) === 1, "train side must scan documents once")
    assert(generates(df) === 1, "train gram stream must explode once")
    assert(df.count() > 0)
    GraftCheckpoints.releaseAll()
  }

  test("q65 bloom refine never re-runs the gram stream") {
    val df = QualityQueries.decontaminateBloom(spark, sf)
    // the gram stream was consumed ONCE into the checkpointed per-doc
    // rollup; the exact refine explodes only the tiny Bloom-survivor sets,
    // so the final plan touches no documents scan at all
    assert(docScans(df) === 0, "refine must read the materialized rollup, not the corpus")
    assert(generates(df) === 1, "only the survivor-set explode remains")
    assert(df.count() > 0)
    GraftCheckpoints.releaseAll()
  }

  test("q22 bucket self-join reads the materialized hyperplane triples") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val b = EmbQueries.bucketedOf(emb)
    // both the size aggregate and the size-filter join must read the
    // checkpointed (vec_id, t, bucket) ints: no embeddings scan and no
    // posexplode may survive in the returned plan (each would mean a
    // second run of the ≈4096-FMA bucket expression)
    val embScans = allPlanNodes(b.queryExecution.executedPlan).count {
      case f: FileSourceScanExec =>
        f.relation.location.inputFiles.exists(_.contains("embeddings.parquet"))
      case _ => false
    }
    assert(embScans === 0, "hyperplane pass must not re-run for either consumer")
    assert(generates(b) === 0, "bucket explode must be materialized, not replayed")
    assert(b.count() > 0)
    GraftCheckpoints.releaseAll()
  }

  test("q80 DSIR token pass explodes once; weights and scores ride the checkpoint") {
    // the expensive pre-checkpoint pass: one corpus scan, one token
    // explode, one exchange (the (doc_id, source, bucket) partial-agg
    // groupBy — map-side combine carries deduped bucket counts)
    val g = QualityQueries.dsirBucketCountsOf(
      graft.model.Pages.documentsPages(spark, sf))
    assert(docScans(g) === 1, "token pass must scan documents once")
    assert(generates(g) === 1, "token stream must explode once")
    val gEx = allPlanNodes(g.queryExecution.executedPlan).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(gEx === 1, s"expected exactly the groupBy exchange, got $gEx")

    // the full query: both consumers (the ≤256-row weight rollup and the
    // per-doc scorer) read the materialized G — no second corpus scan, no
    // second explode; the weight join is a broadcast and the selection is
    // a TakeOrderedAndProject top-K, never a global sort
    val df = QualityQueries.dsirSelect(spark, sf)
    val nodes = allPlanNodes(df.queryExecution.executedPlan)
    assert(docScans(df) === 0, "both consumers must read the checkpointed G")
    assert(generates(df) === 0, "token explode must not be replayed")
    assert(nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "weight table must broadcast")
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "top-K must be TakeOrderedAndProject")

    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= QualityQueries.DsirTopK)
    assert(rows.map(_.getInt(0)).toSeq === (1 to rows.length),
      "ranks must be contiguous from 1")
    assert(rows.forall(_.getLong(2) > 0L), "scores must be positive")
    GraftCheckpoints.releaseAll()
  }

  test("q47 repetition quality is a map-side projection: no explode, no corpus exchange") {
    // every statistic is a function of one doc's own gram multiset
    // (max multiplicity = longest equal-run in the sorted array), so the
    // corpus faces ONE scan, ZERO Generates, and zero exchanges before
    // the output sort — the previous shape shuffled the exploded gram
    // stream twice (VERDICT r5 #1)
    val df = QualityQueries.repetitionQuality(spark, sf)
    assert(docScans(df) === 1, "the corpus must be scanned once")
    assert(generates(df) === 0, "no gram explode may remain — the stats are doc-local")
    val expands = allPlanNodes(df.queryExecution.executedPlan).count(
      _.isInstanceOf[org.apache.spark.sql.execution.ExpandExec])
    assert(expands === 0, "no Expand")
    val exchanges = allPlanNodes(df.queryExecution.executedPlan).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(exchanges <= 1, s"only the output sort may exchange, got $exchanges")
    assert(df.count() > 0)
    GraftCheckpoints.releaseAll()
  }

  test("q106 boilerplate census: block df pass explodes once; consumers ride the checkpoint") {
    // the expensive pre-checkpoint pass: one corpus scan, one block
    // explode, exactly the two documented keyed exchanges (pair-dedup,
    // then the (host, blk) doc-frequency rollup)
    val g = QualityQueries.boilerDfreqOf(
      graft.model.Pages.documentsPages(spark, sf))
    assert(docScans(g) === 1, "block pass must scan documents once")
    assert(generates(g) === 1, "block stream must explode once")
    val gEx = allPlanNodes(g.queryExecution.executedPlan).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(gEx === 2, s"expected pair-dedup + df exchanges, got $gEx")

    // full query: stats, broll and btop all read the materialized df
    // table and every npages reference reads the materialized host
    // counts, so a regression that re-runs the block explode (or the
    // corpus scan) per consumer cannot pass silently (ADVICE r5 #1)
    val df = QualityQueries.boilerplateCensus(spark, sf)
    assert(docScans(df) === 0, "all consumers must read the materialized df/npages tables")
    assert(generates(df) === 0, "the block explode must be materialized, not replayed")
    assert(df.count() > 0)
    GraftCheckpoints.releaseAll()
  }

  test("q81 collocations: unigrams AND bigrams ride one explode") {
    // pre-checkpoint: the concatenated (kind, g1, g2) struct stream —
    // one corpus scan, ONE Generate for both gram kinds, one exchange
    val g = TextQueries.colloGramCountsOf(
      graft.model.Pages.documentsPages(spark, sf))
    assert(docScans(g) === 1, "gram pass must scan documents once")
    assert(generates(g) === 1, "both gram kinds must share one explode")
    val gEx = allPlanNodes(g.queryExecution.executedPlan).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(gEx === 1, s"expected exactly the groupBy exchange, got $gEx")

    // full query: vocabulary joins + totals broadcast all read the
    // checkpointed counts; selection is TakeOrderedAndProject
    val df = TextQueries.collocations(spark, sf)
    val nodes = allPlanNodes(df.queryExecution.executedPlan)
    assert(docScans(df) === 0, "all consumers must read the checkpointed counts")
    assert(generates(df) === 0, "gram explode must not be replayed")
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "top-K must be TakeOrderedAndProject")

    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= TextQueries.ColloTopK)
    assert(rows.map(_.getInt(0)).toSeq === (1 to rows.length),
      "ranks must be contiguous from 1")
    // a collocation's support never exceeds either side's support
    assert(rows.forall(r => r.getLong(3) <= r.getLong(4)
      && r.getLong(3) <= r.getLong(5)), "c_bigram must bound below c_left/c_right")
    GraftCheckpoints.releaseAll()
  }
}
