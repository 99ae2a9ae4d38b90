package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.functions._

/** q91 leakage audit: split labels recompute from the q79 assignment,
  * the pair set is exactly q18's, and the leak verdict is the label
  * inequality. */
class SplitLeakageSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("q91 labels ≡ q79 assignment; pair set ≡ q18; leak = wall crossing") {
    val out = TextQueries.splitLeakage(spark, sf).collect()
    assert(out.nonEmpty, "gate must be non-vacuous")
    val pairs = TextQueries.minhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == pairs,
      "audit must cover exactly the q18 pair set")
    val splits = QualityQueries.withShardAssignment(
      spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("n_chars")))
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getString(3) == splits(a), s"split_a for $a")
      assert(r.getString(4) == splits(b), s"split_b for $b")
      assert(r.getBoolean(5) == (splits(a) != splits(b)), s"leak for ($a,$b)")
    }
    GraftCheckpoints.releaseAll()
  }
}
