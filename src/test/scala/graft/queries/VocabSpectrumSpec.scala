package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints
import org.apache.spark.sql.functions._

/** q103 vocabulary frequency spectrum: must agree with a driver-side
  * recomputation, bucket bounds must be the exact power-of-two envelope
  * (bucket b ⟺ 2^(b−1) ≤ cnt < 2^b), and term/token mass must conserve. */
class VocabSpectrumSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("q103 ≡ driver recomputation") {
    val texts = graft.model.Pages.documentsPages(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ", -1).foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1))
    // min term in UTF-8 BYTE order (what Spark and DuckDB compare)
    def utf8Min(xs: Seq[String]): String = xs.reduce { (a, b) =>
      if (java.util.Arrays.compareUnsigned(
        a.getBytes("UTF-8"), b.getBytes("UTF-8")) <= 0) a else b
    }
    val exp = counts.toSeq.groupBy { case (_, c) => 64 - java.lang.Long.numberOfLeadingZeros(c) }
      .toSeq.sortBy(_._1).map { case (b, ts) =>
        (b, ts.length.toLong, ts.map(_._2).sum, ts.map(_._2).min,
          ts.map(_._2).max, utf8Min(ts.map(_._1)))
      }
    val got = TextQueries.vocabSpectrum(spark, sf).collect().map { r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5))
    }
    GraftCheckpoints.releaseAll()
    assert(got.toSeq === exp)
  }

  test("bucket envelope and mass conservation") {
    val d = graft.model.Pages.documentsPages(spark, sf)
    val totalTokens = d.select(sum(size(split(col("text"), " "))))
      .collect()(0).getLong(0)
    val got = TextQueries.vocabSpectrum(spark, sf).collect()
    GraftCheckpoints.releaseAll()
    got.foreach { r =>
      val b = r.getInt(0)
      assert(r.getLong(3) >= (1L << (b - 1)) && r.getLong(4) < (1L << b))
      assert(r.getLong(3) <= r.getLong(4))
    }
    assert(got.map(_.getLong(2)).sum === totalTokens) // token mass conserved
  }
}
