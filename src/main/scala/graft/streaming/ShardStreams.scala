package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.queries.QualityQueries

/** Streaming face of q79's shuffle-shard assignment: the TRAINING-STORE
  * WRITER. A continuous stream of gate-surviving documents is split/shard-
  * assigned by the exact expressions the batch query evaluates
  * ([[QualityQueries.withShardAssignment]] — single source of truth, the
  * q69/canonicalDedupStream pattern) and lands hive-partitioned by
  * `split=/shard=` directories.
  *
  * Why this layout is the 100-TB serving shape:
  *  - the assignment is a pure map-side projection — the stream never
  *    shuffles and holds ZERO state (no watermark, no store);
  *  - `partitionBy(split, shard)` makes every training reader's scan a
  *    static directory prune: an epoch over train/shard=7 lists exactly
  *    one directory, the eval harness reads `split=test` without touching
  *    a training byte — the contamination wall is enforced by LAYOUT, not
  *    by a filter the reader must remember;
  *  - writes are exactly-once per sink semantics (parquet sink + WAL via
  *    `checkpointLocation`), so a crash-resume never duplicates a doc.
  *
  * Intra-shard SHUFFLE ORDER is deliberately not materialized here: the
  * writer's job is placement; order is recovered at read time by sorting
  * each shard's bounded slice on the same `h` (or by q79's ordinal for a
  * global materialization) — sorting inside a streaming sink would force
  * per-trigger state for no placement benefit. */
object ShardStreams {

  /** Start the sharded training-store writer. `docs` may be a streaming OR
    * batch frame with a `doc_id` column; columns (h, split, shard) are
    * derived, everything else passes through to the store. */
  def shardedWriter(docs: DataFrame, outDir: String, checkpointDir: String,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    QualityQueries.withShardAssignment(docs)
      .writeStream
      .partitionBy("split", "shard")
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .trigger(trigger)
      .format("parquet")
      .start()
}
