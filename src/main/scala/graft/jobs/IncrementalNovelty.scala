package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.{LakeTable, StageRunner}
import graft.queries.QualityQueries

/** INCREMENTAL crawl-novelty tracking — the production face q108's scale
  * note promises: the (block, epoch-bucket) observation table is a staged
  * lake store an incremental crawl APPENDS to, so the first-seen census
  * never recomputes history. State is append-only by construction: a
  * store row is one OBSERVATION `(h, eb)` (block md5 × epoch bucket, the
  * q108 pair), and first-seen derives at read time as `min(eb)` per
  * block — so a late-arriving batch whose blocks predate the stored
  * first-seen migrates them DOWN without any row rewrite (set union of
  * observations ≡ recompute, exactly).
  *
  * The append choreography is [[IncrementalAppend]]'s shared protocol
  * (batch-id replay probe against pointer-reachable manifests, two-layer
  * disjointness guard on the packed pair key, O(|batch|) fast-append
  * commit), with the pair rows themselves as the batch — dedup against
  * the store is a left_anti on `pk`, so a recrawl re-observing known
  * (block, bucket) pairs appends nothing and causes no version spam. */
object IncrementalNovelty {

  /** Stage name folds the derivation constants (block width, bucket
    * seconds — the CLAUDE.md stage-key invariant): changing either
    * invalidates the store instead of silently mixing derivations. */
  val Stage: String =
    s"novelty_pair_store_w${QualityQueries.BlockW}-b${QualityQueries.NoveltyBucketS}"

  /** (pk, h, eb) observed pairs over any (warc_epoch, text) frame — `pk`
    * packs the pair for the shared protocol's disjointness guard. The
    * bucket derivation is [[QualityQueries.withEpochBucket]], the SAME
    * definition q108 runs. */
  private[jobs] def pairsOf(docs: DataFrame): DataFrame =
    QualityQueries.noveltyPairsOf(QualityQueries.withEpochBucket(docs))
      .withColumn("pk", concat(col("h"), lit(":"), col("eb").cast("string")))

  /** Commit the observation store for the initial corpus; returns it. */
  def init(spark: SparkSession, docs: DataFrame, lakeRoot: String): DataFrame =
    StageRunner.stage(spark, new LakeTable(lakeRoot), Stage) {
      pairsOf(docs)
    }

  /** Append a crawl batch: commits only genuinely new (block, bucket)
    * observations (batch-id idempotent) and returns the post-merge
    * first-seen census — q108's `(eb, n_new)` column over the full
    * observed corpus, the number an incremental crawl watches per cycle. */
  def append(spark: SparkSession, newDocs: DataFrame, lakeRoot: String,
             batchId: Option[Long] = None): DataFrame =
    IncrementalAppend.appendWithHandle(
      spark, pairsOf(newDocs), lakeRoot, Stage, batchId, "pk",
      identity) { (_, _, all) => firstSeenCensusOf(all) }._1

  /** Streaming face: every micro-batch of `docsStream` runs [[append]]
    * (batch-id-idempotent via the foreachBatch id) and appends that
    * batch's POST-MERGE census, stamped with its batch id, to
    * `censusOut` — the per-cycle novelty series an incremental crawl
    * dashboards (latest cycle = max batch_id). */
  def appendStream(docsStream: DataFrame, lakeRoot: String,
                   censusOut: String, checkpointDir: String,
                   trigger: org.apache.spark.sql.streaming.Trigger =
                     org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    IncrementalAppend.stream(docsStream, censusOut, checkpointDir, trigger) {
      (s, batch, id) =>
        val (census, handle, replay) = IncrementalAppend.appendWithHandle(
          s, pairsOf(batch), lakeRoot, Stage, Some(id), "pk",
          identity) { (_, _, all) => firstSeenCensusOf(all) }
        (census.withColumn("batch_id", lit(id)), handle, replay)
    }

  /** The census over the committed store alone (reader face). */
  def census(spark: SparkSession, lakeRoot: String): DataFrame =
    firstSeenCensusOf(new LakeTable(lakeRoot).read(spark, Stage))

  /** first-seen per block = min observed bucket; census = blocks first
    * seen per bucket (q108's `n_new`). */
  private def firstSeenCensusOf(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("h")).agg(min(col("eb")).as("feb"))
      .groupBy(col("feb")).agg(count(lit(1)).as("n_new"))
      .select(col("feb").as("eb"), col("n_new"))
      .orderBy(col("eb"))
}
