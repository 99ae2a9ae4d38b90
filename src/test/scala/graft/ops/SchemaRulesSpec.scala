package graft.ops

import graft.core.Geom
import graft.sql.SparkTestBase
import org.apache.spark.sql.types._

/** Error-contract tests (SURVEY.md §5 category 7): heterogeneous schema and
  * geometry rules of collections.py:425-449, 455-460. */
class SchemaRulesSpec extends SparkTestBase {
  import spark.implicits._

  test("property type: first-seen wins, None upgrades (collections.py:425-449)") {
    val t = SchemaRules.unifyPropertyType("a",
      Seq(None, Some(LongType), None, Some(LongType)))
    assert(t === Some(LongType))
    assert(SchemaRules.unifyPropertyType("a", Seq(None, None)) === None)
  }

  test("conflicting property types raise (collections.py:438-442)") {
    val e = intercept[SchemaRules.FeatureCollectionIOError] {
      SchemaRules.unifyPropertyType("a", Seq(Some(LongType), Some(StringType)))
    }
    assert(e.getMessage.contains("conflicting types"))
    intercept[SchemaRules.FeatureCollectionIOError] {
      SchemaRules.mergeSchemas(Seq("a" -> LongType), Seq("a" -> DoubleType))
    }
    // disjoint keys merge, order preserved (first collection first)
    val merged = SchemaRules.mergeSchemas(
      Seq("a" -> LongType, "b" -> StringType), Seq("b" -> StringType, "c" -> DoubleType))
    assert(merged === Seq("a" -> LongType, "b" -> StringType, "c" -> DoubleType))
  }

  test("heterogeneous geometry types raise (collections.py:455-460)") {
    val mixed = Seq(
      Geom.toWkb(Geom.GPoint(1, 2)),
      Geom.toWkb(Geom.polygonFromBounds(0, 0, 1, 1))).toDF("geom")
    val e = intercept[SchemaRules.FeatureCollectionIOError] {
      SchemaRules.requireHomogeneousGeometry(mixed)
    }
    assert(e.getMessage.contains("heterogeneous"))
    val homo = Seq(
      Geom.toWkb(Geom.GPoint(1, 2)), Geom.toWkb(Geom.GPoint(3, 4))).toDF("geom")
    assert(SchemaRules.requireHomogeneousGeometry(homo) === 1) // WKB Point
  }
}
