package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, GraftRegistrar}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Pages
import graft.ops.TextOps

/** Text / dedup / relational-collection queries over the documents-derived
  * pages (the text-bearing slice of the input_hint table). */
object TextQueries {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Pages.documentsPages(spark, sfDir)

  /** Byte-identity invariant: `text` flows through a filter→derive→project
    * pipeline untouched; md5 in the output makes corruption visible. */
  def textIdentity(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .where(col("n_chars") >= 100)
      .withColumn("html_len", length(col("html")))
      .select(col("doc_id"), col("text"), md5(col("text")).as("text_md5"),
        col("html_len"))
      .orderBy(col("doc_id"))

  /** Collection sort + head (collections.py:158-177 + slicing). */
  def sortTopN(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .orderBy(col("n_chars").desc, col("doc_id"))
      .select(col("doc_id"), col("n_chars"), col("lang"))
      .limit(100)

  /** groupby + agg + HAVING group filter (collections.py:179-208, 639-650). */
  def groupbyHaving(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"))
      .where(col("n") >= 5)
      .orderBy(col("lang"), col("source"))

  /** concat (+) with schema union: two projections with disjoint extras
    * (collections.py:73-80; null fill per :489-496). */
  def unionConcat(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val a = d.where(col("lang") === "en")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val b = d.where(col("lang") === "zh")
      .select(col("doc_id"), col("lang"), col("source"))
    a.unionByName(b, allowMissingColumns = true)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        count(col("n_chars")).as("n_with_chars"),
        count(col("source")).as("n_with_source"))
      .orderBy(col("lang"))
  }

  /** fc[10:20]-style slicing via window row_number (collections.py:405-408). */
  def slice(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.orderBy(col("n_chars").desc, col("doc_id"))
    docs(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") > 10 && col("rn") <= 20)
      .select(col("rn"), col("doc_id"), col("n_chars"))
      .orderBy(col("rn"))
  }

  /** Exact dedup: hash-groupBy, keep min doc_id (one shuffle on the 128-bit
    * key; at 10^12 rows this is the same plan with more partitions). */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .groupBy(TextOps.textHash(col("text")).as("text_md5"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
      .where(col("n") > 1)
      .orderBy(col("keep_id"))

  /** Token/punct/stopword counting + quality bucket. */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
      .withColumn("n_tokens", TextOps.tokenCount(col("text")).cast("bigint"))
      .withColumn("n_punct", TextOps.punctCount(col("text")))
      .withColumn("n_stop", TextOps.stopwordCount(col("text")))
      .withColumn("quality",
        TextOps.qualityBucket(col("n_tokens"), col("n_chars"), col("n_stop")))
    d.groupBy(col("lang"), col("quality"))
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("sum_tokens"),
        sum(col("n_punct")).as("sum_punct"), sum(col("n_stop")).as("sum_stop"))
      .orderBy(col("lang"), col("quality"))
  }

  /** Heuristic language-ID vs the labeled lang column (confusion counts). */
  def langId(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .withColumn("pred", TextOps.langId(col("text")))
      .groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc"))
      .orderBy(col("lang"), col("pred"))

  /** Per-doc MinHash signatures (LSH input). */
  def minhashSigs(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id") +: TextOps.minhashSigs(col("text")): _*)
      .orderBy(col("doc_id"))

  /** MinHash LSH near-dup groups: bucket-join on the banded signature
    * (here: full 4-sig band). */
  def minhashGroups(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id") +: TextOps.minhashSigs(col("text")): _*)
      .groupBy(col("sig1"), col("sig2"), col("sig3"), col("sig4"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
      .where(col("n") > 1)
      .orderBy(col("keep_id"))

  /** SimHash fingerprints: rows-only oracle (custom Expression; spec-tested
    * in ScalaTest). Output is deterministic (doc_id, simhash). */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    GraftRegistrar.ensure(spark)
    docs(spark, sfDir)
      .select(col("doc_id"), call_function("simhash64", col("text")).as("simhash"))
      .orderBy(col("doc_id"))
  }
}

object TextOracles {
  import TextOps._

  val textIdentity: String =
    """SELECT doc_id, text, md5(text) AS text_md5,
      |       CAST(octet_length(encode('<html>' || text || '</html>')) AS INTEGER) AS html_len
      |FROM documents WHERE n_chars >= 100 ORDER BY doc_id""".stripMargin

  val sortTopN: String =
    "SELECT doc_id, n_chars, lang FROM documents ORDER BY n_chars DESC, doc_id LIMIT 100"

  val groupbyHaving: String =
    """SELECT lang, source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       min(doc_id) AS min_doc
      |FROM documents GROUP BY lang, source HAVING count(*) >= 5
      |ORDER BY lang, source""".stripMargin

  val unionConcat: String =
    """SELECT lang, count(*) AS n, count(n_chars) AS n_with_chars,
      |       count(source) AS n_with_source
      |FROM (
      |  SELECT doc_id, lang, n_chars, NULL AS source FROM documents WHERE lang = 'en'
      |  UNION ALL
      |  SELECT doc_id, lang, NULL AS n_chars, source FROM documents WHERE lang = 'zh'
      |) GROUP BY lang ORDER BY lang""".stripMargin

  val slice: String =
    """SELECT CAST(rn AS INTEGER) AS rn, doc_id, n_chars FROM (
      |  SELECT doc_id, n_chars,
      |         ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rn
      |  FROM documents
      |) WHERE rn > 10 AND rn <= 20 ORDER BY rn""".stripMargin

  val dedupExact: String =
    """SELECT md5(text) AS text_md5, count(*) AS n, min(doc_id) AS keep_id
      |FROM documents GROUP BY md5(text) HAVING count(*) > 1
      |ORDER BY keep_id""".stripMargin

  val tokenStats: String =
    s"""SELECT lang, quality, count(*) AS n, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |       CAST(sum(n_punct) AS BIGINT) AS sum_punct, CAST(sum(n_stop) AS BIGINT) AS sum_stop
       |FROM (
       |  SELECT lang, n_tokens, n_punct, n_stop,
       |    CASE WHEN n_tokens < 10 THEN 'too_short'
       |         WHEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 0.2 THEN 'high'
       |         WHEN n_stop > 0 THEN 'medium' ELSE 'low' END AS quality
       |  FROM (
       |    SELECT lang,
       |      CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |      ${occurrencesSql("text", ".")} + ${occurrencesSql("text", ",")} +
       |        ${occurrencesSql("text", "!")} + ${occurrencesSql("text", "?")} AS n_punct,
       |      ${occurrencesSql("text", " the ")} + ${occurrencesSql("text", " a ")} +
       |        ${occurrencesSql("text", " of ")} + ${occurrencesSql("text", " and ")} AS n_stop
       |    FROM documents
       |  )
       |)
       |GROUP BY lang, quality ORDER BY lang, quality""".stripMargin

  val langId: String =
    s"""SELECT lang, ${langIdSql("text")} AS pred, count(*) AS n, min(doc_id) AS min_doc
       |FROM documents GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin

  val minhashSigs: String =
    s"""SELECT doc_id, ${minhashSigSql("text", 1)} AS sig1, ${minhashSigSql("text", 2)} AS sig2,
       |       ${minhashSigSql("text", 3)} AS sig3, ${minhashSigSql("text", 4)} AS sig4
       |FROM documents ORDER BY doc_id""".stripMargin

  val minhashGroups: String =
    s"""SELECT sig1, sig2, sig3, sig4, count(*) AS n, min(doc_id) AS keep_id FROM (
       |  SELECT doc_id, ${minhashSigSql("text", 1)} AS sig1, ${minhashSigSql("text", 2)} AS sig2,
       |         ${minhashSigSql("text", 3)} AS sig3, ${minhashSigSql("text", 4)} AS sig4
       |  FROM documents
       |) GROUP BY 1, 2, 3, 4 HAVING count(*) > 1 ORDER BY keep_id""".stripMargin
}
