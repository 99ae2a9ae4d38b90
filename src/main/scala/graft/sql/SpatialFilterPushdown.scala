package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.BinaryType

import graft.core.Geom

/** Optimizer rule: spatial predicates become parquet DATA SKIPPING.
  *
  * A `Filter` containing `st_contains_xy(<literal geometry>, lon, lat)` (or
  * the packed-ring form `st_contains_ring(<xs lit>, <ys lit>, lon, lat)`)
  * gains the geometry's bounding-box range conjuncts
  * `lon BETWEEN xmin,xmax AND lat BETWEEN ymin,ymax`. Those are plain
  * comparisons on scan columns, so the existing PushDownPredicates +
  * FileSourceStrategy machinery carries them into the parquet scan as
  * `PushedFilters` — row groups whose lon/lat min/max stats miss the
  * bbox are never read, while the exact ray-cast stays behind as the
  * post-scan refine. At 100 TB this is the difference between scanning
  * the planet and scanning the row groups that overlap the query region
  * (telluric's filter(intersects), vectors.py:53-67, gets this pruning
  * implicitly from fiona/GDAL spatial indexes; here it falls out of
  * column statistics).
  *
  * Soundness: bbox ⊇ geometry, and the added bounds are inclusive, so the
  * conjunction never drops a contained point. Idempotence: conjuncts
  * already present (semantically) are not re-added, so the fixpoint batch
  * converges. Null semantics: `st_contains_xy` is null-intolerant (null in
  * → null out → row filtered), and the added range conjuncts are likewise
  * null-filtering, so the conjunction's row set is unchanged. */
object SpatialFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {

  private def bboxConjuncts(lonE: Expression, latE: Expression,
                            xmin: Double, ymin: Double,
                            xmax: Double, ymax: Double): Seq[Expression] =
    Seq(GreaterThanOrEqual(lonE, Literal(xmin)), LessThanOrEqual(lonE, Literal(xmax)),
      GreaterThanOrEqual(latE, Literal(ymin)), LessThanOrEqual(latE, Literal(ymax)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extra = conjuncts.flatMap {
        // determinism guard (ADVICE r2): the added range conjuncts duplicate
        // the coordinate expressions, so a non-deterministic lon/lat would
        // be evaluated independently per conjunct and change the row set
        case StContainsXY(Literal(wkb: Array[Byte], BinaryType), lonE, latE)
            if wkb != null && lonE.deterministic && latE.deterministic =>
          val bb = Geom.fromWkb(wkb).bbox
          bboxConjuncts(lonE, latE, bb.xmin, bb.ymin, bb.xmax, bb.ymax)
        case StContainsRing(xsL: Literal, ysL: Literal, lonE, latE)
            if xsL.value != null && ysL.value != null &&
              lonE.deterministic && latE.deterministic =>
          val xs = xsL.value.asInstanceOf[ArrayData].toDoubleArray()
          val ys = ysL.value.asInstanceOf[ArrayData].toDoubleArray()
          if (xs.isEmpty || ys.isEmpty) Nil
          else bboxConjuncts(lonE, latE, xs.min, ys.min, xs.max, ys.max)
        case _ => Nil
      }.filterNot(e => conjuncts.exists(_.semanticEquals(e)))
        // also dedupe among the additions themselves: two semantically
        // equal spatial predicates in one Filter must not double-add
        .foldLeft(Seq.empty[Expression]) { (acc, e) =>
          if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
        }
      if (extra.isEmpty) f
      else Filter(And(extra.reduceLeft(And), cond), child)
  }
}
