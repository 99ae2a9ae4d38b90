package graft.ops

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, IntegerType, TimestampType, StringType}

/** transform_properties / serialize_properties parity
  * (`/root/reference/telluric/features.py:22-65`): fiona-schema-driven
  * coercion of string temporal properties on read, ISO serialization on
  * write. */
class FionaDatesSpec extends SparkTestBase {
  import spark.implicits._

  private def recs = Seq(
    (1L, "2024-03-05", "2024-03-05T10:11:12", "13:45:30", "keepme"),
    (2L, "1999-12-31", "1999-12-31 23:59:59", "00:00:01", "andme"),
    (3L, null.asInstanceOf[String], null.asInstanceOf[String],
      null.asInstanceOf[String], null.asInstanceOf[String]))
    .toDF("fid", "d", "dt", "t", "s")

  test("schema-driven coercion: date/datetime/time types, null passthrough (features.py:22-44)") {
    val out = SchemaRules.transformProperties(recs,
      Seq("d" -> "date", "dt" -> "datetime", "t" -> "time", "s" -> "str",
        "absent" -> "date"))
    val sch = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(sch("d") === DateType)
    assert(sch("dt") === TimestampType)
    assert(sch("t") === IntegerType) // seconds-of-day ordinal
    assert(sch("s") === StringType)  // non-temporal untouched

    val rows = out.orderBy("fid").collect()
    assert(rows(0).getDate(1).toString === "2024-03-05")
    assert(rows(0).getTimestamp(2).toInstant.getEpochSecond ===
      java.time.Instant.parse("2024-03-05T10:11:12Z").getEpochSecond)
    assert(rows(0).getInt(3) === 13 * 3600 + 45 * 60 + 30)
    assert(rows(1).getInt(3) === 1)
    // reference: `if prop_value is None: continue`
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2) && rows(2).isNullAt(3))
  }

  test("isoformat serialization: T separator, micros only when nonzero (features.py:47-65)") {
    val df = Seq(
      (1L, "2024-03-05 10:11:12"),
      (2L, "2024-03-05 10:11:12.000250"))
      .toDF("fid", "s")
      .withColumn("ts", to_timestamp(col("s")))
      .withColumn("iso", SchemaRules.isoSerialize(col("ts")))
    val got = df.orderBy("fid").select("iso").as[String].collect()
    assert(got(0) === "2024-03-05T10:11:12")
    assert(got(1) === "2024-03-05T10:11:12.000250")
  }
}
