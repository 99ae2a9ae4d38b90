package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming operators (builder prompt §streams:
  * `KeyValueGroupedDataset.flatMapGroupsWithState` for custom state) over
  * the events/documents stream schemas. Both run identically under
  * Trigger.AvailableNow against a parquet directory and checkpoint-resume.
  *
  * Scale posture: state is per-key and bounded — sessionize holds ONE open
  * session struct per active user (closed sessions leave state via event-
  * time timeout), dedup keeps keys only inside the watermark horizon
  * (`dropDuplicatesWithinWatermark`), so state size tracks the active set,
  * not history. */
object StatefulStreams {

  /** carries the watermarked event-time column itself — a typed `.map`
    * would strip the watermark attribute and event-time timeout needs it. */
  final case class SessEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long) {
    def ts_us: Long = ts.getTime * 1000L
  }
  final case class SessState(start_us: Long, last_us: Long, n: Long, min_event: Long)
  final case class Session(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Long, min_event: Long)

  /** 30-minute gap, mirroring the batch q25 sessionize. */
  val GapUs: Long = 1800000000L

  /** Streaming sessionization: per-user sessions closed either by an
    * in-batch gap > 30 min or by event-time timeout once the watermark
    * passes last_event + gap (the open tail). flatMapGroupsWithState in
    * Append mode — each emitted row is a CLOSED session. */
  def sessionize(events: DataFrame, watermarkDelay: String = "1 minute"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"), col("event_id").cast("long"))
      .as[SessEvent]

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (it.isEmpty && state.hasTimedOut) {
            // watermark passed the open tail's gap horizon → close it
            val s = state.get
            state.remove()
            Iterator.single(Session(uid, s.start_us, s.last_us, s.n, s.min_event))
          } else {
            val evs = it.toArray.sortBy(e => (e.ts_us, e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var cur = state.getOption
            evs.foreach { e =>
              cur match {
                case Some(s) if e.ts_us - s.last_us > GapUs =>
                  closed += Session(uid, s.start_us, s.last_us, s.n, s.min_event)
                  cur = Some(SessState(e.ts_us, e.ts_us, 1, e.event_id))
                case Some(s) =>
                  cur = Some(SessState(s.start_us, e.ts_us, s.n + 1,
                    math.min(s.min_event, e.event_id)))
                case None =>
                  cur = Some(SessState(e.ts_us, e.ts_us, 1, e.event_id))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // event-time timeout at last + gap: fires once the WATERMARK
              // passes it, closing the tail session
              state.setTimeoutTimestamp((s.last_us + GapUs) / 1000L)
            }
            closed.iterator
          }
      }
  }

  /** Streaming exact dedup — the streaming face of q14: first occurrence
    * of each content key within the watermark horizon passes, later
    * duplicates drop. State = keys inside the horizon only. */
  def dedupStream(docs: DataFrame, keyCol: String,
                  watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Streaming canonical-URL dedup — q69's streaming face: recrawl
    * variants (tracking params, default port, authority case, fragments,
    * trailing slashes) of the same page collapse to one survivor within
    * the watermark horizon. The normalization is the SAME codegen'd
    * column expression the batch gate runs ([[graft.ops.TextOps
    * .canonicalUrl]]); state holds one canonical key per page inside the
    * horizon — at 100 TB/day the horizon bounds state, not the corpus. */
  def canonicalDedupStream(pages: DataFrame, urlCol: String = "url",
                           watermarkDelay: String = "1 hour"): DataFrame =
    dedupStream(pages.withColumn("canon_url",
      graft.ops.TextOps.canonicalUrl(col(urlCol))), "canon_url",
      watermarkDelay)

  /** Stream-stream INTERVAL join: each click paired with every view of the
    * same user inside the trailing window. The time-range condition bounds
    * both join states — a view leaves state once the click-side watermark
    * passes view_ts + window, a click once the view-side watermark passes
    * click_ts. Works identically on batch frames (q57's gate runs this
    * exact function over the batch read). */
  def intervalJoin(clicks: DataFrame, views: DataFrame,
                   window: String = "10 minutes",
                   watermarkDelay: String = "1 minute"): DataFrame = {
    val c = clicks.withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("click_id"), col("user_id").as("c_uid"),
        col("ts").as("c_ts"))
    val v = views.withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("view_id"), col("user_id").as("v_uid"),
        col("ts").as("v_ts"))
    c.join(v, expr(
      s"c_uid = v_uid AND v_ts >= c_ts - interval $window AND v_ts <= c_ts"))
      .select(col("click_id"), col("c_uid").as("user_id"), col("view_id"),
        unix_micros(col("c_ts")).as("click_us"), unix_micros(col("v_ts")).as("view_us"))
  }
}
