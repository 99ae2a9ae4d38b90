package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import graft.sql.GraftUnary

/** Text-analysis / dedup operators for the web-pages payload — the
  * training-data-pipeline surface (builder prompt): exact dedup, MinHash
  * LSH, SimHash, language-ID heuristic, quality scoring, token counting.
  * Everything is a composition of codegen'd built-ins except simhash64
  * (a custom Expression). Column builders mirror ANSI-SQL oracles
  * exactly (integer arithmetic + md5, no locale-dependent ops). */
object TextOps {

  /** Whitespace token count: regex split (codegen'd built-in). */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** Occurrences of a literal substring via length arithmetic — exact in
    * any SQL dialect (no regex dialect drift). */
  def occurrences(text: Column, pat: String): Column =
    ((length(text) - length(replace(text, lit(pat), lit("")))) / pat.length).cast("bigint")

  /** Language-ID by stopword-hit argmax — the n-gram/stopword heuristic.
    * Deterministic tie-break: first language in [[langScores]] order wins. */
  val langScores: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " que "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "),
    "pt" -> Seq(" de ", " que ", " uma "))

  def langScore(text: Column, lang: String): Column =
    langScores.find(_._1 == lang).get._2
      .map(p => occurrences(text, p)).reduce(_ + _)

  def langId(text: Column): Column = {
    val scores = langScores.map { case (l, _) => l -> langScore(text, l) }
    // strict argmax, ties to earlier entry: lang_i wins iff score_i > score_j
    // for all j<i and score_i >= score_j for all j>i
    val best = scores.zipWithIndex.foldLeft(lit("und")) { case (acc, ((l, s), i)) =>
      val beatsEarlier = scores.take(i).map(_._2).map(s > _).foldLeft(lit(true))(_ && _)
      val beatsLater = scores.drop(i + 1).map(_._2).map(s >= _).foldLeft(lit(true))(_ && _)
      when(beatsEarlier && beatsLater && s > 0, lit(l)).otherwise(acc)
    }
    best
  }

  /** Quality features (length/punct/stopword ratios) + a bucket label. */
  def punctCount(text: Column): Column =
    Seq(".", ",", "!", "?").map(p => occurrences(text, p)).reduce(_ + _)
  def stopwordCount(text: Column): Column =
    Seq(" the ", " a ", " of ", " and ").map(p => occurrences(text, p)).reduce(_ + _)
  def qualityBucket(nTokens: Column, nChars: Column, nStop: Column): Column =
    when(nTokens < 10, lit("too_short"))
      .when(nStop.cast("double") / nTokens.cast("double") > 0.2, lit("high"))
      .when(nStop > 0, lit("medium"))
      .otherwise(lit("low"))

  /** Exact-dup key. */
  def textHash(text: Column): Column = md5(text)

  /** MinHash signature j over 8-char shingles (stride 3, first 200 chars):
    * min over shingles of md5(j || ':' || shingle) — hex-string min is a
    * total order shared by every SQL engine. Composition of built-ins →
    * whole-stage codegen. */
  def minhashSig(text: Column, j: Int): Column =
    array_min(transform(
      sequence(lit(1), greatest(least(length(text), lit(200)) - 7, lit(1)), lit(3)),
      p => md5(concat(lit(s"$j:"), substring(text, lit(p).cast("int"), lit(8))))))

  /** the 4-band signature struct used for LSH bucketing */
  def minhashSigs(text: Column): Seq[Column] =
    (1 to 4).map(j => minhashSig(text, j).as(s"sig$j"))

  /** ANSI-SQL mirror of [[minhashSig]] for the DuckDB oracle. */
  def minhashSigSql(textExpr: String, j: Int): String =
    s"""list_min(list_transform(
       |  generate_series(1, GREATEST(LEAST(length($textExpr), 200) - 7, 1), 3),
       |  p -> md5('$j:' || substr($textExpr, CAST(p AS INTEGER), 8))))""".stripMargin

  def occurrencesSql(textExpr: String, pat: String): String = {
    val esc = pat.replace("'", "''")
    s"CAST((length($textExpr) - length(replace($textExpr, '$esc', ''))) / ${pat.length} AS BIGINT)"
  }

  def langScoreSql(textExpr: String, lang: String): String =
    langScores.find(_._1 == lang).get._2
      .map(p => occurrencesSql(textExpr, p)).mkString("(", " + ", ")")

  def langIdSql(textExpr: String): String = {
    val scores = langScores.map { case (l, _) => l -> langScoreSql(textExpr, l) }
    scores.zipWithIndex.foldLeft("'und'") { case (acc, ((l, s), i)) =>
      val earlier = scores.take(i).map(o => s"$s > ${o._2}")
      val later = scores.drop(i + 1).map(o => s"$s >= ${o._2}")
      val conds = (earlier ++ later :+ s"$s > 0").mkString(" AND ")
      s"(CASE WHEN $conds THEN '$l' ELSE $acc END)"
    }
  }
}

/** simhash64(text): 64-bit SimHash over whitespace tokens; per-token hash =
  * first 8 bytes of md5 (big-endian). Custom Expression (no SQL-builtin
  * composition reaches bit-vote semantics cheaply). */
case class SimHash64(child: Expression) extends GraftUnary {
  override def dataType: DataType = LongType
  def compute(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toString
    val votes = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    text.split("\\s+").foreach { tok =>
      if (tok.nonEmpty) {
        val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash64"
}
