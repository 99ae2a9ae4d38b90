package graft.lake

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
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

  /** Commit a stage — single-pass (VERDICT r1 #7 / ADVICE r1):
    *  1. ONE evaluation of the plan: the data parquet write.
    *  2. ONE scan of the COMMITTED bytes computing lineage + row count
    *     together (so checksums describe exactly the files a reader sees,
    *     not a second nondeterministically-partitioned evaluation).
    *  3. The P collected lineage rows (bounded by partition count, never
    *     by data size) are written back from the driver — a zero-data-scan
    *     job — then the manifest lands via write-tmp + ATOMIC_MOVE.
    * Partial writes without a manifest are invisible to readers and get
    * overwritten on retry. */
  def commit(stage: String, data: DataFrame, meta: Map[String, String]): Unit = {
    val t0 = System.nanoTime()
    val dir = stageDir(stage)
    data.write.mode("overwrite").parquet(s"$dir/data")

    val spark = data.sparkSession
    val committed = read(spark, stage)
    val linDf = StageRunner.lineageOf(stage, committed)
    val lin = linDf.collect()
    val rows = lin.map(_.getAs[Long]("output_rows")).sum
    val wallMs = (System.nanoTime() - t0) / 1000000
    val schema = linDf.schema.add("wall_ms", LongType, nullable = false)
    val withWall: Seq[Row] = lin.toSeq.map(r => Row.fromSeq(r.toSeq :+ wallMs))
    spark.createDataFrame(spark.sparkContext.parallelize(withWall, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/lineage")

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
    * the last committed stage. The build plan is evaluated exactly once
    * (the data write inside [[LakeTable.commit]]). */
  def stage(spark: SparkSession, lake: LakeTable, name: String,
            meta: Map[String, String] = Map.empty)(build: => DataFrame): DataFrame = {
    if (!lake.isCommitted(name)) lake.commit(name, build, meta)
    lake.read(spark, name)
  }
}
