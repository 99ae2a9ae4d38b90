package graft.jobs

import org.apache.spark.sql.{DataFrame, Row, SparkSession, GraftCheckpoints}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.lake.LakeTable

/** The append choreography SHARED by [[IncrementalDedup]] (MinHash
  * signature store) and [[IncrementalEmbDedup]] (SemDeDup cell store) —
  * round-4 review: the two jobs had copied it nearly line-for-line, so a
  * protocol fix had to land twice. The protocol, held once:
  *
  *  1. `batchId` replay probe: if ANY snapshot manifest reachable from the
  *     store's current pointer carries this batch id (foreachBatch
  *     redelivered the batch after a crash between the store commit and
  *     the sink write, or an older batch was manually re-invoked), the
  *     commit is skipped and the incoming state probes the store alone —
  *     same pair set, no duplicate store rows. Orphan manifests of
  *     never-pointed or rolled-back-away snapshots are NOT evidence.
  *  2. DISJOINTNESS GUARD, two layers: `dropDuplicates(idCol)` inside the
  *     batch (an at-least-once source can compact two deliveries of one id
  *     into a single micro-batch) and a `left_anti` join against the store
  *     (a re-delivered id from an earlier batch) — first-write-wins;
  *     duplicate store rows would multiply every future refine join.
  *     Duplicate deliveries carry identical payloads, so which row
  *     survives is moot. On a KNOWN replay the whole batch is already in
  *     the store, so the incoming state probes unfiltered and the pair
  *     set reproduces exactly.
  *  3. The job-specific pair computation over (newState, old, all).
  *  4. Commit gate: only a non-replay batch with at least one genuinely
  *     new row commits — via [[LakeTable.commitAppend]], an O(|batch|)
  *     fast-append snapshot (the parent's data files are referenced, not
  *     rewritten); a batch of pure re-deliveries causes no version spam.
  *
  * Returns (pairs, newState handle): newState is `.local`-checkpointed so
  * a streaming caller can free exactly the blocks this append pinned once
  * its sink write completes — a global releaseAll would also kill any
  * OTHER query's live checkpoints on a shared session. */
private[jobs] object IncrementalAppend {

  /** (pairs, newState handle, wasReplay): `wasReplay` is the manifest
    * probe's verdict — the ONLY correct replay evidence for downstream
    * idempotence decisions (a sink-side marker can be missing exactly when
    * the state commit already happened: the crash-between window). */
  def appendWithHandle(
      spark: SparkSession, batch: DataFrame, lakeRoot: String, stage: String,
      batchId: Option[Long], idCol: String, stateOf: DataFrame => DataFrame)(
      pairsOf: (DataFrame, DataFrame, DataFrame) => DataFrame)
      : (DataFrame, DataFrame, Boolean) = {
    val lake = new LakeTable(lakeRoot)
    require(lake.isCommitted(stage), s"no committed $stage — run init first")
    // probe every snapshot manifest REACHABLE FROM THE CURRENT POINTER,
    // not just the head: a LATE replay (batch 7 redelivered after batch 8
    // committed — possible only for a manual re-invocation; Structured
    // Streaming replays are always the newest batch) must still be
    // recognized — probing only the head manifest would misread it as new,
    // anti-join away all its rows, and return an EMPTY pair set.
    // Recognized, it returns the batch's pairs against the CURRENT store
    // (the original set, plus any pairs with batches that committed since
    // — the truthful answer to a re-ask) and, critically, commits nothing.
    // The `v <= currentVersion` bound matters (round-4 review): commitData
    // writes `_manifest_v$N.json` BEFORE the pointer's ATOMIC_MOVE, so a
    // crash between the two leaves an orphan versioned manifest whose
    // batch rows are NOT in the store — counting it as commit evidence
    // would skip the recommit forever and silently lose the batch; a
    // rolled-back-away snapshot's manifest is pointer-unreachable for the
    // same reason. The version list is tiny (bounded by vacuum retention)
    // and lives on the driver.
    val alreadyCommitted = batchId.exists { id =>
      val tag = "\"batch_id\":\"" + id + "\""
      val cur = lake.currentVersion(stage).getOrElse(0)
      lake.versions(stage).filter(_ <= cur).exists(v =>
        lake.manifestAt(stage, v).exists(_.contains(tag)))
    }
    val old = lake.read(spark, stage)
    val incoming = stateOf(batch.dropDuplicates(idCol))
    val newState = GraftCheckpoints.local(
      if (alreadyCommitted) incoming
      else incoming.join(old.select(col(idCol)), Seq(idCol), "left_anti"))
    // on a replay the store already holds the batch's state rows — using
    // old ∪ new would duplicate them and multiply the refine join
    val all = if (alreadyCommitted) old else old.unionByName(newState)
    val pairs = pairsOf(newState, old, all)
    if (!alreadyCommitted && newState.limit(1).count() > 0)
      lake.commitAppend(stage, newState,
        Map("appended" -> "true") ++ batchId.map("batch_id" -> _.toString))
    (pairs, newState, alreadyCommitted)
  }

  /** Streaming face: every micro-batch runs the job's append (batch-id
    * idempotent via the foreachBatch batch id) and appends its pair rows
    * to `pairsOut`, then releases exactly the blocks the append pinned. */
  def stream(src: DataFrame, pairsOut: String, checkpointDir: String,
             trigger: Trigger)(
             append: (SparkSession, DataFrame, Long) => (DataFrame, DataFrame, Boolean))
      : StreamingQuery =
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        if (!batch.isEmpty) {
          val (pairs, handle, _) = append(batch.sparkSession, batch, id)
          pairs.write.mode("append").parquet(pairsOut)
          GraftCheckpoints.release(handle)
        }
        ()
      }
      .start()
}
