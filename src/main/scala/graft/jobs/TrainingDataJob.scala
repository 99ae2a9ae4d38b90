package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.{LakeTable, StageRunner}
import graft.queries.{QualityQueries, TextQueries}

/** The END-TO-END training-data pipeline, composed from the engine's
  * oracle-gated operators and committed stage-by-stage to the lake:
  *
  *   raw docs ─ quality gate (q73 scorer) ─ exact dedup (q14 keep-min)
  *     ─ near-dup canonicalization (q17/q18/q55 MinHash labels)
  *     ─ benchmark decontamination (q60 k-gram overlap vs a caller eval
  *       set) ─ shuffle-shard training store (q79 assignment,
  *       `split=/shard=` hive layout).
  *
  * Stage ORDER is the 100-TB cost argument: the map-side quality gate cuts
  * first (cheapest per row, biggest cut on crawl data); exact dedup is one
  * fingerprint shuffle over survivors; the expensive MinHash/LSH pass runs
  * only on what survived both; decontamination explodes grams over the
  * smallest surviving set; the store write is map-side placement. Every
  * stage lands as a [[LakeTable]] snapshot via [[StageRunner.stage]], so a
  * crashed run RESUMES after the last committed stage (spec-driven), and
  * every intermediate corpus is time-travelable for audits. Stage names
  * fold their decision constants (threshold, gram size, band match bar) —
  * the stage-key invariant: changing a constant invalidates the stage.
  *
  * The lake root is the pipeline's identity: one root per (corpus, eval
  * set, config) run — the single-writer / fixed-input contract of
  * [[LakeTable.commit]]. */
object TrainingDataJob {

  /** One row per pipeline stage: docs surviving after it. */
  final case class StageCount(stage: String, docs: Long)

  def stageNames: Seq[String] = Seq(
    s"tdj_quality_t${QualityQueries.KeepThresholdBp}",
    "tdj_exact",
    s"tdj_neardup_m${graft.ops.TextOps.MatchThreshold}",
    s"tdj_decontam_k${QualityQueries.DecontK}",
    "tdj_store")

  /** k-word gram hashes of a (doc_id, text) frame — the q60 stream shape
    * (explode once; distinctness is the consumer's job). */
  private def gramsOf(d: DataFrame, k: Int): DataFrame =
    d.select(col("doc_id"), split(col("text"), " ").as("a"))
      .where(size(col("a")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(a) - ${k - 1}), g -> array_join(slice(a, g, $k), ' '))")).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("h"))

  /** Run (or resume) the pipeline. `docs`: (doc_id, text); `evalDocs`: the
    * held-out benchmark (doc_id, text). Returns the final sharded corpus
    * (doc_id, text, h, split, shard) as committed to the `tdj_store`
    * stage; the caller points the training reader at
    * `storeDir` (hive `split=/shard=` layout, written once). */
  def run(spark: SparkSession, docs: DataFrame, evalDocs: DataFrame,
          lakeRoot: String, storeDir: String): DataFrame = {
    val lake = new LakeTable(lakeRoot)
    val Seq(sQuality, sExact, sNear, sDecon, sStore) = stageNames

    // 1. quality gate — map-side scorer, semi-join survivors back to text
    val quality = StageRunner.stage(spark, lake, sQuality) {
      docs.join(QualityQueries.scoreDocs(docs).where(col("keep"))
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
    }

    // 2. exact dedup — keep the MIN doc_id per text fingerprint (q14
    // semantics): one hash shuffle on the 16-byte fingerprint
    val exact = StageRunner.stage(spark, lake, sExact) {
      val fp = quality.withColumn("fp", md5(col("text")))
      fp.join(
        fp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id")),
        Seq("fp", "doc_id"), "left_semi").drop("fp")
    }

    // 3. near-dup canonicalization — MinHash/LSH component labels; the
    // keeper is the cluster-min doc (the label IS the component min under
    // min-propagation), docs outside every cluster have no label row and
    // pass. The labels' checkpoint blocks are released only AFTER the
    // stage's commit action consumed them (a released local checkpoint is
    // unrecomputable); on a resume the build closure never runs and no
    // blocks are pinned.
    var labelsHandle: DataFrame = null
    val near = StageRunner.stage(spark, lake, sNear) {
      val labels = TextQueries.minhashLabelsOf(spark, exact)
      labelsHandle = labels
      exact.join(labels.select(col("u").as("doc_id"), col("label")),
          Seq("doc_id"), "left")
        .where(col("label").isNull || col("label") === col("doc_id"))
        .drop("label")
    }
    if (labelsHandle != null)
      org.apache.spark.sql.GraftCheckpoints.release(labelsHandle)

    // 4. decontamination — drop any doc sharing a k-gram with the eval
    // set (q60's join shape: tiny distinct eval side broadcast, train
    // grams exploded ONCE into a semi-join — no rollup needed to gate)
    val decon = StageRunner.stage(spark, lake, sDecon) {
      val k = QualityQueries.DecontK
      val evalGrams = gramsOf(evalDocs, k).select(col("h")).distinct()
      val hit = gramsOf(near, k)
        .join(broadcast(evalGrams), Seq("h"), "left_semi")
        .select(col("doc_id")).distinct()
      near.join(hit, Seq("doc_id"), "left_anti")
    }

    // 5. shuffle-shard store — q79 assignment, written hive-partitioned
    // (the batch twin of ShardStreams.shardedWriter's layout)
    val sharded = StageRunner.stage(spark, lake, sStore) {
      QualityQueries.withShardAssignment(decon)
    }
    sharded.write.mode("overwrite").partitionBy("split", "shard")
      .parquet(storeDir)
    sharded
  }

  /** Per-stage surviving-doc counts (reads committed snapshots only). */
  def report(spark: SparkSession, lakeRoot: String): Seq[StageCount] = {
    val lake = new LakeTable(lakeRoot)
    stageNames.filter(lake.isCommitted).map(s =>
      StageCount(s, lake.read(spark, s).count()))
  }
}
