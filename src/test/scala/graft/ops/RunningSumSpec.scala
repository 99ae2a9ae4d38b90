package graft.ops

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed running sum (q54's primitive): partition-offset cumsum must
  * equal the single-partition window cumsum while actually running over
  * multiple range partitions. */
class RunningSumSpec extends SparkTestBase {

  test("withRunningSum ≡ global window cumsum, across >1 partition") {
    import spark.implicits._
    val df = spark.range(10000).toDF("id")
      .withColumn("v", pmod(col("id") * 37L, lit(101L)))
      .repartition(8) // scrambled input placement
    val got = Ordinals.withRunningSum(df, "cum", col("v"), col("id"))
    // the cumsum window must be partition-LOCAL (keyed by the range-
    // partition id), never the global single-partition Window.orderBy
    // (AQE may still coalesce tiny shuffles, so partition count is not
    // the observable — the window spec is)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("__ord_part"), plan.take(500))
    val exp = df.withColumn("cum",
      sum(col("v")).over(Window.orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
      .sameElements(exp.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))))
  }

  test("empty input yields empty output") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(Ordinals.withRunningSum(df, "cum", col("v"), col("id")).count() === 0)
  }
}
