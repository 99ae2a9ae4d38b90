package graft.sql

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for SQL-layer suites. */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session
  override def afterAll(): Unit = { /* shared session stays up for the run */ }

  /** Full physical-plan walk: `collect()` does not cross AQE query-stage
    * or reused-exchange boundaries — cross them explicitly so plan asserts
    * can reach scan nodes inside adaptive stages. */
  protected def allPlanNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(allPlanNodes)
  }
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val s = GraftSession.builder("local[4]", shufflePartitions = 4)
      .config("spark.sql.warehouse.dir", wh)
      // this host has heavy co-tenant CPU steal (CLAUDE.md): a multi-second
      // scheduler stall can starve the in-process heartbeater until the
      // executor self-exits with code 56 and kills the whole forked suite.
      // Long intervals + high failure tolerance make the 25-minute
      // single-JVM run immune to stall bursts (observed: one such abort).
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeat.maxFailures", "240")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
