package graft.ops

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** `Ordinals.withGroupedOrdinal` — the skew-proof per-group rank. Contracts:
  * ranks are EXACTLY the per-group window's row_number (metamorphic, random
  * skewed data), AND a huge group genuinely spans multiple partitions (the
  * property the per-group window cannot have: its partitioning puts each
  * group on one reducer). */
class GroupedOrdinalSpec extends SparkTestBase {

  test("grouped ordinal == window row_number on skewed random data") {
    // 3 groups, one 100x the others, keys shuffled
    val df = spark.range(5000).toDF("id")
      .withColumn("g", when(pmod(col("id"), lit(100)) < 98, "big")
        .when(pmod(col("id"), lit(100)) === 98, "mid").otherwise("small"))
      .withColumn("k", pmod(col("id") * 2654435761L, lit(5000)))
      .repartition(8)
    val got = Ordinals.withGroupedOrdinal(df, "rn", col("g"), col("k"), col("id"))
      .select(col("id"), col("rn"))
    val expected = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("k"), col("id"))).cast("long"))
      .select(col("id"), col("rn"))
    assert(got.except(expected).count() === 0)
    assert(expected.except(got).count() === 0)
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
  }

  test("a huge group spans multiple partitions (no one-reducer-per-group skew)") {
    val df = spark.range(4000).toDF("id")
      .withColumn("g", when(col("id") < 3990, "big").otherwise("rest"))
      .withColumn("k", pmod(col("id") * 31L, lit(4000)))
    val ranked = Ordinals.withGroupedOrdinal(df, "rn", col("g"), col("k"), col("id"))
    val partsOfBig = ranked.where(col("g") === "big")
      .select(spark_partition_id().as("p")).distinct().count()
    assert(partsOfBig > 1,
      s"the big group must span partitions, got $partsOfBig")
    // and the ranks are still dense 1..n within the group
    val r = ranked.where(col("g") === "big").agg(
      count(lit(1)), min(col("rn")), max(col("rn")),
      countDistinct(col("rn"))).collect()(0)
    assert(r.getLong(1) === 1L && r.getLong(2) === r.getLong(0) &&
      r.getLong(3) === r.getLong(0))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
  }

  test("null group values rank as their own group") {
    val df = spark.range(100).toDF("id")
      .withColumn("g", when(pmod(col("id"), lit(3)) === 0, lit(null: String))
        .otherwise(lit("a")))
    val got = Ordinals.withGroupedOrdinal(df, "rn", col("g"), col("id"))
    val nulls = got.where(col("g").isNull)
      .agg(count(lit(1)), min(col("rn")), max(col("rn"))).collect()(0)
    assert(nulls.getLong(1) === 1L && nulls.getLong(2) === nulls.getLong(0))
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
  }
}
