package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round side harness (guide §1.4): times a SUBSET of the
  * declared queries with the same action/estimator as [[Bench]] (count,
  * min of N runs, checkpoint release + shuffle purge per run) so per-query
  * iteration doesn't need the full 20-minute bench, and optionally dumps
  * `.explain("formatted")` per query for the plans/ evidence directory.
  *
  * This harness is ADDITIVE — [[Bench]] itself is frozen for measurement.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra q74_pagerank q59_span_dedup"
  *   sbt "runMain graft.BenchExtra --explain plans/r06 --suffix _before all"
  *   sbt "runMain graft.BenchExtra --runs 3 --noop q72_heavy_hitters"
  */
object BenchExtra {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    var explainDir: Option[String] = None
    var suffix = ""
    var runs = 2
    var noop = false
    val names = Seq.newBuilder[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--explain" => explainDir = Some(args(i + 1)); i += 2
        case "--suffix" => suffix = args(i + 1); i += 2
        case "--runs" => runs = args(i + 1).toInt; i += 2
        case "--noop" => noop = true; i += 1
        case n => names += n; i += 1
      }
    }
    val all = SparkEntry.queries
    val picked: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      names.result() match {
        case Seq("all") | Seq() => all.toSeq
        case ns => ns.map(n => n -> all.getOrElse(n,
          sys.error(s"unknown query $n; known: ${all.keys.mkString(", ")}")))
      }

    val spark = graft.sql.GraftSession.builder(s"local[$cpus]", cpus * 2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probes = org.apache.spark.graft.BenchProbes
    val sc = spark.sparkContext

    explainDir.foreach(d => new java.io.File(d).mkdirs())

    val results = picked.map { case (name, fn) =>
      sc.setJobDescription(name)
      explainDir.foreach { d =>
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, s"$name$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        org.apache.spark.sql.GraftCheckpoints.releaseAll()
        probes.purgeShuffles(sc)
      }
      val secs = (1 to runs).map { _ =>
        val sec = time {
          val df = fn(spark, sfDir)
          if (noop) df.write.format("noop").mode("overwrite").save()
          else df.count()
        }
        org.apache.spark.sql.GraftCheckpoints.releaseAll()
        probes.purgeShuffles(sc)
        sec
      }
      println(f"BENCHX $name%-28s min=${secs.min}%7.3f first=${secs.head}%7.3f all=${secs.map(s => f"$s%.3f").mkString(",")}")
      name -> secs
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"${v.min}%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"extra","unit":"sec","sf":"$sfDir","runs":$runs,"queries_min":$qs,"total_min":${f"${results.map(_._2.min).sum}%.3f"}}""")
    spark.stop()
  }
}
