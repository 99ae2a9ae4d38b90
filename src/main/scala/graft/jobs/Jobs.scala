package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.lake.{LakeTable, StageRunner}
import graft.model.{Pages, PolygonLayer}
import graft.sql.{functions => G}

/** The headline checkpointed jobs (north rule): every stage commits data +
  * per-partition lineage to the lake; reruns resume after the last
  * committed stage. */
object SpatialJoinJob {

  /** polygon-side row budget under which we broadcast; above it we run the
    * salted cell-equi shuffle plan (adaptive broadcast-vs-shuffle
    * selection; AQE remains the runtime second line). */
  val BroadcastRowThreshold = 100000L
  val SaltBuckets = 8

  def run(spark: SparkSession, sfDir: String, lakeRoot: String): DataFrame = {
    val lake = new LakeTable(lakeRoot)

    val pages = StageRunner.stage(spark, lake, "s1_attach_cells",
      Map("input" -> sfDir)) {
      Pages.volumePages(spark, sfDir)
        .select(col("pid"), col("lon"), col("lat"), col("is_hot"),
          G.st_tile(col("lon"), col("lat"), 12).as("cell"))
    }

    val polys = PolygonLayer.toDF(spark)

    val joined = StageRunner.stage(spark, lake, "s2_pip_join") {
      val polyCount = polys.count()
      if (polyCount <= BroadcastRowThreshold) {
        // broadcast plan: zero shuffle on the probe side
        pages.join(broadcast(polys),
          col("lon") >= col("xmin") && col("lon") <= col("xmax") &&
            col("lat") >= col("ymin") && col("lat") <= col("ymax") &&
            G.st_contains_xy(col("poly"), col("lon"), col("lat")))
          .select(col("pid"), col("poly_id"), col("is_hot"))
      } else {
        // salted cell-equi shuffle join: explode polygons into z8 cover
        // cells replicated across salt buckets; pages salt by hash(pid).
        val polyCells = polys
          .select(col("poly_id"), col("poly"),
            G.tiles_for(col("poly"), array(lit(8))).as(Seq("cell8", "x", "y", "z")))
          .crossJoin(spark.range(SaltBuckets).select(col("id").cast("int").as("salt")))
        val salted = pages
          .withColumn("cell8", G.tile_parent(col("cell"), lit(4)))
          .withColumn("salt", pmod(hash(col("pid")), lit(SaltBuckets)).cast("int"))
        salted.join(polyCells, Seq("cell8", "salt"))
          .where(G.st_contains_xy(col("poly"), col("lon"), col("lat")))
          .select(col("pid"), col("poly_id"), col("is_hot"))
      }
    }

    StageRunner.stage(spark, lake, "s3_agg") {
      joined.groupBy(col("poly_id"))
        .agg(count(lit(1)).as("n"),
          min(col("pid")).as("min_pid"), max(col("pid")).as("max_pid"),
          sum(when(col("is_hot"), 1L).otherwise(0L)).as("n_hot"))
        .orderBy(col("poly_id"))
    }
  }
}

/** Iterative-doubling kNN: start at ring r0; probes whose k-th candidate is
  * not yet provably inside the searched box expand their ring and rejoin —
  * the general form of the fixed-ring q04 plan. Driver loop, one Spark job
  * per round, bounded by log2(gridSize) rounds. */
object KnnJob {

  def run(spark: SparkSession, sfDir: String,
          probes: Seq[(Int, Double, Double)], k: Int, zoom: Int,
          lakeRoot: String): DataFrame = {
    import spark.implicits._
    val lake = new LakeTable(lakeRoot)

    val pages = StageRunner.stage(spark, lake, "knn_pages") {
      Pages.volumePages(spark, sfDir)
        .select(col("pid"), col("lon"), col("lat"),
          G.st_tile(col("lon"), col("lat"), zoom).as("cell"))
    }.cache()

    var remaining = probes
    var results: Option[DataFrame] = None
    var r = 1
    val maxR = 1 << zoom
    while (remaining.nonEmpty && r <= maxR) {
      val probeDf = remaining.toDF("qid", "qlon", "qlat")
        .select(col("qid"), col("qlon"), col("qlat"),
          G.cell_ring(G.st_tile(col("qlon"), col("qlat"), zoom), lit(r))
            .as(Seq("cell", "ring")))
      val dsq = (col("lon") - col("qlon")) * (col("lon") - col("qlon")) +
        (col("lat") - col("qlat")) * (col("lat") - col("qlat"))
      val w = Window.partitionBy(col("qid")).orderBy(col("dsq"), col("pid"))
      val cand = pages.join(broadcast(probeDf), "cell")
        .select(col("qid"), col("qlon"), col("qlat"), col("pid"), dsq.as("dsq"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .cache()
      // a probe is DONE when its k-th distance fits inside the ring box:
      // sqrt(dsq_k) < r * (cell width in degrees) — conservative bound.
      val cellDeg = 360.0 / (1L << zoom)
      val safe = r * cellDeg
      val kth = cand.groupBy("qid")
        .agg(count(lit(1)).as("found"), max(col("dsq")).as("maxdsq"))
        .collect()
        .map(row => (row.getInt(0), row.getLong(1), row.getDouble(2)))
      val done = kth.filter { case (_, found, maxdsq) =>
        found >= k && math.sqrt(maxdsq) < safe
      }.map(_._1).toSet
      val doneDf = cand.where(col("qid").isin(done.toSeq: _*))
        .select(col("qid"), col("rank"), col("pid"))
      results = results.map(_.unionByName(doneDf)).orElse(Some(doneDf))
      remaining = remaining.filterNot { case (q, _, _) => done.contains(q) }
      r *= 2
    }
    val out = results.get.orderBy(col("qid"), col("rank"))
    StageRunner.stage(spark, lake, "knn_result",
      Map("k" -> k.toString, "zoom" -> zoom.toString))(out)
  }
}

/** Zoom-pyramid materialization job: per-level 2×2 rollups committed as
  * separate resumable stages (the overview/COG build, SURVEY.md §2.10). */
object PyramidJob {

  def run(spark: SparkSession, sfDir: String, lakeRoot: String,
          baseZoom: Int = 12, minZoom: Int = 6): DataFrame = {
    val lake = new LakeTable(lakeRoot)
    var level = StageRunner.stage(spark, lake, s"pyramid_z$baseZoom") {
      Pages.volumePages(spark, sfDir)
        .select(G.st_tile(col("lon"), col("lat"), baseZoom).as("cell"))
        .groupBy("cell").agg(count(lit(1)).as("n"))
        // Morton write-locality order within files (SURVEY.md §4)
        .withColumn("morton", G.st_morton(G.tile_x(col("cell")), G.tile_y(col("cell"))))
        .sortWithinPartitions(col("morton"))
        .drop("morton")
    }
    var z = baseZoom
    while (z > minZoom) {
      val next = z - 2
      val prev = level
      level = StageRunner.stage(spark, lake, s"pyramid_z$next") {
        prev.select(G.tile_parent(col("cell"), lit(2)).as("cell"), col("n"))
          .groupBy("cell").agg(sum(col("n")).as("n"))
      }
      z = next
    }
    level
  }
}
