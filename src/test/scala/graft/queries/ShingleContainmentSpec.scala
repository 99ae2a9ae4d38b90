package graft.queries

import graft.sql.SparkTestBase
import org.apache.spark.sql.GraftCheckpoints

/** q92 containment: verified against an EXHAUSTIVE driver-side all-pairs
  * recomputation (independent md5/shingle arithmetic, no LSH shortlist) —
  * proving both the values and, over this corpus, the shortlist's recall. */
class ShingleContainmentSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def shingles(t: String): Set[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (1 to math.max(t.length - 7, 1)).map { p =>
      val s = t.substring(p - 1, math.min(p - 1 + 8, t.length))
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % graft.ops.TextOps.MinhashP
    }.toSet
  }

  test("q92 ≡ exhaustive all-pairs containment over this corpus") {
    val out = TextQueries.shingleContainment(spark, sf).collect()
    assert(out.nonEmpty, "gate must be non-vacuous")
    val sets = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(r.getString(1))).toMap
    val ids = sets.keys.toSeq.sorted
    val truth = (for {
      i <- ids; j <- ids if i < j
      inter = (sets(i) & sets(j)).size.toLong if inter > 0
      cont = inter * 10000L / math.min(sets(i).size, sets(j).size)
      if cont >= TextQueries.ContainmentBp
    } yield (i, j) -> (inter, sets(i).size.toLong, sets(j).size.toLong, cont)).toMap
    val got = out.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == truth.keySet,
      s"pair sets differ: missing ${truth.keySet -- got.keySet}, extra ${got.keySet -- truth.keySet}")
    truth.foreach { case (k, v) => assert(got(k) == v, s"values differ at $k") }
    GraftCheckpoints.releaseAll()
  }
}
