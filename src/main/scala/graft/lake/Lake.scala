package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Iceberg-style table emulation (SURVEY.md §7: no Iceberg jar ships in
  * this sandbox): each stage commit = parquet data files + per-partition
  * lineage rows + an atomically-renamed JSON snapshot manifest. A rerun
  * consults the manifest and skips committed stages — the
  * checkpoint/resume contract of the north rule. Swap [[LakeTable]] for a
  * real Iceberg catalog by reimplementing the four methods. */
class LakeTable(val root: String) {

  private def stageDir(stage: String) = s"$root/$stage"
  private def manifestPath(stage: String) = Paths.get(s"${stageDir(stage)}/_manifest.json")

  def isCommitted(stage: String): Boolean = Files.exists(manifestPath(stage))

  def read(spark: SparkSession, stage: String): DataFrame =
    spark.read.parquet(s"${stageDir(stage)}/data")

  def readLineage(spark: SparkSession, stage: String): DataFrame =
    spark.read.parquet(s"${stageDir(stage)}/lineage")

  /** Commit a stage: data + lineage parquet, then the manifest via
    * write-tmp + ATOMIC_MOVE — the commit point. Partial writes without a
    * manifest are invisible to readers and get overwritten on retry. */
  def commit(stage: String, data: DataFrame, lineage: DataFrame,
             meta: Map[String, String]): Unit = {
    val dir = stageDir(stage)
    data.write.mode("overwrite").parquet(s"$dir/data")
    lineage.write.mode("overwrite").parquet(s"$dir/lineage")
    val spark = data.sparkSession
    val rows = spark.read.parquet(s"$dir/data").count()
    val json = {
      val fields = meta ++ Map(
        "stage" -> stage,
        "row_count" -> rows.toString,
        "committed_at" -> java.time.Instant.now().toString)
      fields.map { case (k, v) =>
        "\"" + k + "\":\"" + v.replace("\"", "'") + "\""
      }.mkString("{", ",", "}")
    }
    val tmp = Paths.get(s"$dir/_manifest.json.tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(stage), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def manifest(stage: String): Option[String] =
    if (isCommitted(stage)) Some(new String(
      Files.readAllBytes(manifestPath(stage)), StandardCharsets.UTF_8))
    else None
}

/** Deterministic stage DAG runner with per-partition lineage
  * (stage, partition_id, output_rows, checksum) — SURVEY.md §2.11. */
object StageRunner {

  /** Order-independent content checksum per Spark partition:
    * bit_xor of xxhash64 over all columns (overflow-free under ANSI). */
  def lineageOf(stage: String, df: DataFrame): DataFrame = {
    val cols = df.columns.map(col).toSeq
    df.withColumn("__pid", spark_partition_id())
      .groupBy(col("__pid").as("partition_id"))
      .agg(count(lit(1)).as("output_rows"),
        bit_xor(xxhash64(cols: _*)).as("checksum"))
      .withColumn("stage", lit(stage))
  }

  /** Run (or resume) a stage: if the manifest exists, read the committed
    * result instead of recomputing — rerunning a failed job resumes after
    * the last committed stage. */
  def stage(spark: SparkSession, lake: LakeTable, name: String,
            meta: Map[String, String] = Map.empty)(build: => DataFrame): DataFrame = {
    if (lake.isCommitted(name)) {
      lake.read(spark, name)
    } else {
      val t0 = System.nanoTime()
      val df = build
      val lineage = lineageOf(name, df)
        .withColumn("wall_ms", lit((System.nanoTime() - t0) / 1000000))
      lake.commit(name, df, lineage, meta)
      lake.read(spark, name)
    }
  }
}
