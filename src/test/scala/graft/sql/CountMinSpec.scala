package graft.sql

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._

/** Count-Min sketch: the never-undercount guarantee (the property q84's
  * byte-equality with the exact oracle rests on), merge associativity
  * under partitioning, and the prefilter's actual pruning power. */
class CountMinSpec extends SparkTestBase {

  test("cm_est never undercounts, on every key of a real gram stream") {
    val grams = graft.model.Pages.documentsPages(spark, "/root/testdata/sf0.001")
      .select(split(col("text"), " ").as("a"))
      .select(explode(graft.ops.TextOps.adjacentPairs(col("a"))(
        (x, y) => concat_ws(" ", x, y))).as("g"))
    val sk = grams.agg(call_function("cm_sketch_agg", col("g")))
      .collect()(0).getAs[Array[Byte]](0)
    val rows = grams.groupBy(col("g")).agg(count(lit(1)).as("c"))
      .withColumn("est", call_function("cm_est", col("g"), lit(sk)))
      .collect()
    assert(rows.length > 100)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"undercount on ${r.getString(0)}: est ${r.getLong(2)} < true ${r.getLong(1)}"))
    // total mass is exact in every row of the grid (adds, never drops)
    val grid = CmSketch.deserialize(sk)
    val total = rows.map(_.getLong(1)).sum
    (0 until CmSketch.Depth).foreach { j =>
      val rowMass = (0 until CmSketch.Width)
        .map(i => grid(j * CmSketch.Width + i)).sum
      assert(rowMass === total, s"grid row $j lost mass")
    }
  }

  test("sketch is partitioning-invariant (merge is elementwise add)") {
    import spark.implicits._
    val data = (1 to 500).map(i => s"k${i % 37}").toDF("g")
    val one = data.coalesce(1).agg(call_function("cm_sketch_agg", col("g")))
      .collect()(0).getAs[Array[Byte]](0)
    val many = data.repartition(13).agg(call_function("cm_sketch_agg", col("g")))
      .collect()(0).getAs[Array[Byte]](0)
    assert(one.toSeq === many.toSeq)
  }

  test("q84 prefilter prunes the long tail but keeps every heavy key") {
    val sf = "/root/testdata/sf0.01"
    val out = graft.queries.TextQueries.cmHeavy(spark, sf).collect()
    // exact reference computed independently
    val exact = graft.model.Pages.documentsPages(spark, sf)
      .select(split(col("text"), " ").as("a"))
      .select(explode(graft.ops.TextOps.adjacentPairs(col("a"))(
        (x, y) => concat_ws(" ", x, y))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .where(col("c") >= graft.queries.TextQueries.CmHeavyMin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty, "threshold must select something at sf0.01")
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toMap === exact,
      "sketch-prefiltered output must equal the exact threshold query")
    // and the prune is real: heavy keys are a small fraction of the space
    val totalKeys = graft.model.Pages.documentsPages(spark, sf)
      .select(split(col("text"), " ").as("a"))
      .select(explode(graft.ops.TextOps.adjacentPairs(col("a"))(
        (x, y) => concat_ws(" ", x, y))).as("g"))
      .select(col("g")).distinct().count()
    assert(out.length.toLong * 5 < totalKeys,
      s"prefilter kept ${out.length} of $totalKeys keys — no pruning value")
  }
}
