package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.{LakeTable, StageRunner}
import graft.queries.TextQueries

/** The end-to-end training-corpus dedup PIPELINE — the composition a
  * 100-TB run actually executes, with every stage an independently
  * committed, resumable lake snapshot carrying per-partition lineage
  * (north rule: "every stage writes per-partition lineage rows and
  * checkpoints ... so runs resume mid-job"):
  *
  *  1. `exact_losers` — md5 hash-group exact dedup (q14 semantics): every
  *     doc whose text hash has a smaller doc_id twin.
  *  2. `neardup_labels` — banded-MinHash connected components (q36
  *     machinery) over the exact-deduped survivors.
  *  3. `neardup_losers` — per component keep the longest text (doc_id
  *     tiebreak; q55 argmax), everything else loses.
  *  4. `cleaned` — the surviving corpus: input minus both loser sets
  *     (two left-anti hash joins on doc_id).
  *
  * Each stage reads its upstream from the COMMITTED snapshot, never from a
  * recomputed plan — so a crash between stages resumes exactly where it
  * stopped, and a finished run is a no-op replay (LakeSpec contract). */
object CorpusDedupJob {

  def run(spark: SparkSession, docs: DataFrame, lakeRoot: String): DataFrame = {
    val lake = new LakeTable(lakeRoot)
    val d = docs.select(col("doc_id"), col("text"), col("n_chars"))

    val exactLosers = StageRunner.stage(spark, lake, "exact_losers") {
      val groups = d.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
        .where(col("n") > 1)
      d.select(md5(col("text")).as("h"), col("doc_id"))
        .join(groups, Seq("h"))
        .where(col("doc_id") =!= col("keep_id"))
        .select(col("doc_id"))
    }

    val exactClean = d.join(exactLosers, Seq("doc_id"), "left_anti")

    var lblHandle: org.apache.spark.sql.DataFrame = null
    val labels = StageRunner.stage(spark, lake, "neardup_labels") {
      lblHandle = TextQueries.minhashLabelsOf(spark, exactClean)
      lblHandle
    }
    // the stage is committed and re-read from the lake — drop the fixed
    // point's checkpoint blocks (session hygiene, VERDICT r2 #1)
    if (lblHandle != null)
      org.apache.spark.sql.GraftCheckpoints.release(lblHandle)

    val neardupLosers = StageRunner.stage(spark, lake, "neardup_losers") {
      import org.apache.spark.sql.expressions.Window
      val m = labels.join(
        exactClean.select(col("doc_id").as("u"), col("n_chars")), Seq("u"))
      m.withColumn("rk", row_number().over(
          Window.partitionBy(col("label")).orderBy(col("n_chars").desc, col("u"))))
        .where(col("rk") > 1)
        .select(col("u").as("doc_id"))
    }

    StageRunner.stage(spark, lake, "cleaned", meta = Map("stage" -> "final")) {
      exactClean.join(neardupLosers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("text"), col("n_chars"))
    }
  }
}
