package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.functions._

/** q78 SemDeDup (cluster-then-cosine semantic dedup): plan-shape and
  * planted-recall gates. The product-quantizer pass (2 levels × 16 dot
  * products per row) must be materialized exactly once — the intra-cell
  * self-join and the cell-size cap both read the checkpointed
  * (vec_id, cell) longs, never re-running the quantizer — and every
  * planted EXACT twin must be pruned (identical embeddings quantize to the
  * same cell regardless of the directions, so exact-twin recall is a
  * data-independent invariant of the design; sign-flip twins may split
  * cells — SemDeDup's documented single-assignment trade). */
class SemDedupSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("q78 quantizer pass runs once; exact twins always pruned") {
    val df = EmbQueries.semDedup(spark, sf)
    // the quantizer (array_position over the 16-dot arrays) must be
    // checkpointed out of the final plan: both consumers read the
    // materialized cells, so no argmax survives in the executed plan
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.contains("array_position"),
      "product-quantizer pass must be materialized, not replayed per consumer")

    val out = df.collect()
    assert(out.nonEmpty, "gate must be non-vacuous")
    // keeper < pruned by construction (a < b), and n_dups ≥ 1
    assert(out.forall(r => r.getLong(1) < r.getLong(0) && r.getLong(2) >= 1L))

    // every planted exact twin (vec_id % 97 == 0 → twin id + 10M, cosine
    // exactly 1.0, same cell) must appear as pruned with keeper ≤ original
    val marked = spark.read.parquet(s"$sf/embeddings.parquet")
      .where(pmod(col("vec_id"), lit(97L)) === 0)
      .select(col("vec_id")).collect().map(_.getLong(0))
    assert(marked.nonEmpty, "fixture must contain marked rows")
    val pruned = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    marked.foreach { id =>
      assert(pruned.contains(id + 10000000L), s"exact twin of $id must be pruned")
      assert(pruned(id + 10000000L) <= id, s"twin of $id must keep a rep ≤ $id")
    }
    GraftCheckpoints.releaseAll()
  }

  test("q78 cell cap bounds every intra-cell join side") {
    // cells frame: no cell may exceed SemMaxCell after the cap filter —
    // and the planted exact twin shares its original's cell (bit-identical
    // dot arrays ⇒ identical argmax), the recall invariant the spec above
    // relies on
    val input = EmbQueries.dedupInput(spark, sf)
    val cells = input.select(col("vec_id"),
      EmbQueries.semCell(col("embedding")).as("cell"))
    val byId = cells.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byId.keys.filter(id => id < 10000000L && id % 97 == 0).foreach { id =>
      assert(byId(id + 10000000L) === byId(id), s"exact twin of $id must share its cell")
    }
    val maxCell = cells.groupBy(col("cell")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    // sanity at fixture scale: the hottest cell is far below the cap, so
    // the cap never silently voids the gate here (it exists for 100-TB skew)
    assert(maxCell <= EmbQueries.SemMaxCell)
    GraftCheckpoints.releaseAll()
  }
}
