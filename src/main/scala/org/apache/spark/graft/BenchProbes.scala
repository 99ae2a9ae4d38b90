package org.apache.spark.graft

import org.apache.spark.{MapOutputTrackerMaster, SparkContext}

/** Block-manager / shuffle-state probes for the bench harness (VERDICT r3
  * #3: a hostile driver window must be self-diagnosing from the artifact —
  * per-query counters prove in-JSON whether late-sweep inflation is leaked
  * session state or host noise). Lives under org.apache.spark because the
  * map-output tracker and the context cleaner are `private[spark]`. */
object BenchProbes {

  /** RDDs still holding persisted blocks — after a query's releaseAll this
    * must be 0; anything else is a checkpoint-hygiene leak. */
  def persistedRddCount(sc: SparkContext): Int = sc.getPersistentRDDs.size

  /** Shuffles still registered with the map-output tracker. Registered
    * shuffles pin map-output state and shuffle files until the weak-ref
    * ContextCleaner notices their RDDs died — in a long-lived sweep
    * session that is "whenever a GC happens", i.e. state accumulates. */
  def registeredShuffleCount(sc: SparkContext): Int =
    sc.env.mapOutputTracker match {
      case m: MapOutputTrackerMaster => m.shuffleStatuses.size
      case _ => -1
    }

  /** Between-queries epilogue: explicitly clean every registered shuffle
    * (map-output state + shuffle files) instead of waiting for the
    * GC-driven cleaner. Safe between sequential queries — the next query
    * rebuilds its plan from scratch; NOT safe mid-query. Blocking, so the
    * shuffle-file deletion I/O lands HERE rather than inside the next
    * query's timed window (the walls this probe exists to de-noise).
    * Returns how many shuffles were cleaned — 0 when no ContextCleaner is
    * installed (spark.cleaner.referenceTracking=false), in which case the
    * registered-count canary still reports the accumulation. */
  def purgeShuffles(sc: SparkContext): Int =
    sc.env.mapOutputTracker match {
      case m: MapOutputTrackerMaster if sc.cleaner.isDefined =>
        val ids = m.shuffleStatuses.keys.toSeq
        ids.foreach(id => sc.cleaner.foreach(_.doCleanupShuffle(id, blocking = true)))
        ids.size
      case _ => 0
    }
}
