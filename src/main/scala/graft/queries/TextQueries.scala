package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession, GraftRegistrar, GraftCheckpoints}
import org.apache.spark.sql.GraftCheckpoints.TrackedDataFrame
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

  /** q86 WARC ingest round-trip: the corpus is serialized to Common-Crawl
    * framing (`.warc.gz`, one gzip member per record — [[graft.io.WarcIO]])
    * and parsed back; the gate compares doc ids, byte lengths, dates and
    * payload md5 against the ORIGINAL parquet, so any header or payload
    * corruption in either direction of the codec is a hash mismatch. The
    * fixture staging is fingerprint-keyed ([[StageCache.dir]]); ingest
    * itself is file-per-task with zero shuffle before the output sort —
    * the exact shape a 10⁵-file crawl dump wants. */
  val WarcFiles = 8

  private val warcStageLock = new Object

  /** Stage the corpus as WARC files once per (input fingerprint, framing
    * derivation); concurrent processes race safely on the atomic rename
    * (same choreography as [[StageCache.publish]]). */
  def warcFixture(spark: SparkSession, sfDir: String): java.io.File = {
    // folds the documentsPages derivation (url prefix, epoch chain, html
    // framing) — the staged .warc.gz bytes bake those values in, so a
    // mirrored-constant change must invalidate the stage (CLAUDE.md
    // stage-key invariant), not serve stale archives against a new oracle
    // ct folded in: the payload is BARE html, so the record honestly says
    // text/html — labeling it application/http (the real-CC convention)
    // would promise embedded HTTP headers that aren't there, and the
    // ingest pipeline now splits such payloads at the first blank line
    val dir = StageCache.dir(s"$sfDir/documents.parquet", "warc_fixture",
      s"gzmember:${Pages.DocDerivationKey}:iso:f$WarcFiles:ct=text/html:v1")
    warcStageLock.synchronized {
      if (!StageCache.isPublished(dir)) {
        val tmp = new java.io.File(dir.getParentFile,
          dir.getName + ".tmp-" + java.lang.ProcessHandle.current().pid())
        tmp.mkdirs()
        val tmpPath = tmp.getAbsolutePath
        docs(spark, sfDir)
          .select(col("doc_id"), col("url"), col("warc_epoch"), col("html"))
          .repartition(WarcFiles, col("doc_id"))
          .sortWithinPartitions(col("doc_id"))
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            if (it.hasNext) {
              val pid = org.apache.spark.TaskContext.getPartitionId()
              val fmt = java.time.format.DateTimeFormatter
                .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
                .withZone(java.time.ZoneOffset.UTC)
              val f = new java.io.File(tmpPath, f"part-$pid%05d.warc.gz")
              graft.io.WarcIO.writeLocal(it.map { r =>
                val docId = r.getLong(0)
                ("response", s"<urn:graft:$docId>", r.getString(1),
                  fmt.format(java.time.Instant.ofEpochSecond(r.getLong(2))),
                  "text/html",
                  r.getAs[Array[Byte]](3))
              }, f)
            }
          }
        new java.io.FileOutputStream(new java.io.File(tmp, "_SUCCESS")).close()
        try java.nio.file.Files.move(tmp.toPath, dir.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.FileSystemException =>
            // another process published first — deterministic bytes, drop ours
            def rm(f: java.io.File): Unit = {
              Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
            }
            rm(tmp)
        }
      }
    }
    dir
  }

  def warcIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = warcFixture(spark, sfDir)
    graft.io.WarcIO.read(spark, dir.getAbsolutePath, "*.warc.gz")
      .where(col("warc_type") === "response")
      .select(
        regexp_extract(col("target_uri"), "/d/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
        col("target_uri").as("url"),
        unix_timestamp(col("warc_date"), "yyyy-MM-dd'T'HH:mm:ssX")
          .as("warc_epoch"),
        col("content_length"),
        md5(col("payload")).as("payload_md5"))
      .orderBy(col("doc_id"))
  }

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

  /** fc[10:20]-style slicing (collections.py:405-408) via the distributed
    * ordinal (range-repartition + partition offsets — no single-partition
    * window; graft.ops.Ordinals). */
  def slice(spark: SparkSession, sfDir: String): DataFrame =
    // project BEFORE the ordinal: the range shuffle and its persisted
    // frame carry two longs per row, not the derived html/text payload
    graft.ops.Ordinals.withOrdinal(
        docs(spark, sfDir).select(col("doc_id"), col("n_chars")),
        "rn", col("n_chars").desc, col("doc_id"))
      .withColumn("rn", col("rn").cast("int"))
      .where(col("rn") > 10 && col("rn") <= 20)
      .select(col("rn"), col("doc_id"), col("n_chars"))
      .orderBy(col("rn"))

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

  /** q67 BM25 relevance ranking over the corpus for a fixed query — the
    * retrieval scorer a training-data pipeline runs to mine topical
    * subsets. Rational-arithmetic BM25 variant: the idf factor is the raw
    * Robertson–Spärck-Jones odds (N−df+½)/(df+½) WITHOUT the log, and
    * k1=3/2, b=3/4 are folded into one integer numerator/denominator pair
    * (tf·(k1+1))/(tf + k1(1−b+b·dl/avgdl)) ≡ 20·tf·Σdl / (8·tf·Σdl + 3·Σdl
    * + 9·dl·N) — so the whole score is BIGINT products plus IEEE + * /,
    * which DuckDB reproduces bit-for-bit (no libm). Corpus stats (N, Σdl,
    * df_t) are ONE row, explicitly broadcast; the ranking is a distributed
    * top-k (TakeOrderedAndProject), never a global sort. */
  val Bm25Terms: Seq[String] = Seq("spark", "merge", "vector")
  val Bm25TopK = 20

  def bm25Rank(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = docs(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("a"))
    // persisted: tf feeds BOTH the stats aggregate and the scoring side of
    // the crossJoin — without it Spark plans two independent corpus
    // scans + tokenize passes. tf is (doc_id, dl, tf0..tf2): tiny to
    // store, expensive to recompute (same trade as the staged signatures).
    val tf = toks.select(
      col("doc_id") +: size(col("a")).cast("long").as("dl") +:
        Bm25Terms.indices.map { i =>
          // exact token-equality count WITHOUT the interpreted
          // higher-order `filter` lambda (guide §1.2 per-task work /
          // CLAUDE.md hot-path-codegen invariant): array_remove is
          // codegen'd, so the whole tf projection stays inside
          // WholeStageCodegen. Measured 2.09 s → 0.46 s at
          // sf0.1/local[32] — the interpreted lambda was the sweep's
          // single largest per-row cost.
          (size(col("a")) - size(array_remove(col("a"), Bm25Terms(i))))
            .cast("long").as(s"tf$i")
        }: _*).trackedCheckpoint
    val aggs = sum(col("dl")).as("sum_dl") +:
      Bm25Terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = tf.agg(count(lit(1)).as("n_docs"), aggs: _*)
    def term(i: Int) =
      ((col("n_docs") * 2 - col(s"df$i") * 2 + 1).cast("double") /
        (col(s"df$i") * 2 + 1).cast("double")) *
        ((col(s"tf$i") * col("sum_dl") * 20).cast("double") /
          (col(s"tf$i") * col("sum_dl") * 8 + col("sum_dl") * 3 +
            col("dl") * col("n_docs") * 9).cast("double"))
    tf.crossJoin(broadcast(stats))
      .withColumn("score", term(0) + term(1) + term(2))
      .orderBy(col("score").desc, col("doc_id")).limit(Bm25TopK)
      // rank lands AFTER the top-k: the unpartitioned window sees 20 rows
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("dl"),
        col("tf0"), col("tf1"), col("tf2"), col("score"))
  }

  /** q85 hybrid retrieval: BM25 lexical top-[[HybridK]] fused with
    * embedding-cosine semantic top-[[HybridK]] (probe = vector 0, the
    * documents/embeddings tables share the 0..N id space) by Reciprocal
    * Rank Fusion. The fused score is INTEGER-exact —
    * `rrf_nano = Σ_leg 10⁹ div (60 + rank_leg)` over the leg ranks, 0 when
    * the doc missed a leg — so fusion ordering never touches a float
    * (Cormack et al.'s 1/(k+r) with k=60, nano-scaled and floored; the
    * leg ranks themselves are the q67/q20-proven deterministic orderings).
    * Scale shape: each leg ends in a TakeOrderedAndProject(K) — a K-row
    * driver-bounded frame — so the full-outer fusion join touches 2K rows
    * no matter the corpus size; the only corpus-sized work is the two
    * scans the legs already own. */
  /** statically tied to [[Bm25TopK]]: the lex leg's depth IS bm25Rank's
    * internal limit, so an independent HybridK would silently desync the
    * Spark leg (capped at Bm25TopK) from the oracle's LIMIT HybridK. */
  val HybridK: Int = Bm25TopK
  val HybridTop = 10
  val RrfK0 = 60

  def hybridRank(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.queries.EmbQueries.dotCols
    val lex = bm25Rank(spark, sfDir)
      .select(col("doc_id"), col("rank").as("lex_rank"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("norm", sqrt(dotCols(col("embedding"), col("embedding"))))
    val probe = emb.where(col("vec_id") === 0)
      .select(col("embedding").as("qemb"), col("norm").as("qnorm"))
    val sem = emb.join(broadcast(probe))
      .select(col("vec_id"),
        (dotCols(col("embedding"), col("qemb")) / (col("qnorm") * col("norm"))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(HybridK)
      // rank AFTER the top-k limit: the unpartitioned window sees K rows
      .withColumn("sem_rank",
        row_number().over(Window.orderBy(col("cos").desc, col("vec_id"))))
      .select(col("vec_id").as("doc_id"), col("sem_rank"))
    val fused = lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(0)).as("sem_rank"))
      .withColumn("rrf_nano",
        when(col("lex_rank") > 0,
          expr(s"1000000000 div ($RrfK0 + lex_rank)")).otherwise(lit(0L)) +
          when(col("sem_rank") > 0,
            expr(s"1000000000 div ($RrfK0 + sem_rank)")).otherwise(lit(0L)))
    fused.orderBy(col("rrf_nano").desc, col("doc_id")).limit(HybridTop)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rrf_nano").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("lex_rank"), col("sem_rank"),
        col("rrf_nano"))
  }

  /** Corpus heavy hitters (q72): the exact top-K most frequent word
    * trigrams — the vocabulary/boilerplate census every corpus report
    * starts with. The plan is the point at 100 TB: explode → map-side
    * partial count → ONE hash shuffle on the gram → global count →
    * `TakeOrderedAndProject(K)` — a K-row driver result with no global
    * sort and no window over the full vocabulary; the rank window runs
    * AFTER the limit, over K rows. Ties break on the gram string so the
    * result is deterministic under the oracle. */
  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val grams = docs(spark, sfDir)
      .select(split(col("text"), " ").as("a"))
      .where(size(col("a")) >= 3)
      .select(explode(expr("sequence(1, size(a) - 2)")).as("p"), col("a"))
      .select(expr("array_join(slice(a, p, 3), ' ')").as("g"))
    grams.groupBy(col("g")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("g")).limit(HeavyK)
      .withColumn("rank", row_number().over(Window.orderBy(col("c").desc, col("g"))))
      .select(col("rank"), col("g"), col("c"))
  }

  val HeavyK = 50

  /** q81 collocation constants: selection size, integer lift scale, and
    * the minimum bigram support (kills noise AND bounds the lift — with
    * c ≥ MinCount both unigram counts are ≥ MinCount, so the staged
    * integer division below stays inside BIGINT at sf0.1-class N; a
    * 10^12-token corpus would widen the scale type). Mirrored verbatim in
    * [[TextOracles.collocations]]. */
  val ColloTopK = 50
  val ColloScale = 1000000L
  val ColloMinCount = 5

  /** q81: collocation mining — the phrase-vocabulary construction pass of
    * a training-data pipeline (rank word bigrams by pointwise mutual
    * information: how much more often the pair occurs than its parts
    * predict). The PMI's log is dropped (log is monotone) and the lift
    * p(a,b)/(p(a)·p(b)) = c_ab·N²/(M·c_a·c_b) is evaluated in STAGED
    * BIGINT floor divisions — the stages are mirrored exactly in the
    * oracle, so cross-engine equality is by construction rather than by
    * float luck (CLAUDE.md invariant).
    *
    * Scale shape — both gram kinds ride ONE explode: the token stream and
    * the bigram stream are concatenated as a (kind, g1, g2) struct array
    * per document and exploded once, so the corpus faces one scan and one
    * partial-agg exchange (the (kind, g1, g2) groupBy). The checkpointed
    * counts then split into the Zipf-bounded unigram vocabulary (join
    * left unhinted — AQE broadcasts when it fits, the freqQuality
    * posture), the MinCount-filtered bigram table, and a ONE-ROW totals
    * broadcast (the q67 pattern); selection is TakeOrderedAndProject. */
  def collocations(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = colloGramCountsOf(docs(spark, sfDir)).trackedCheckpoint
    val totals = counts.agg(
      sum(when(col("kind") === 1, col("c")).otherwise(lit(0L))).as("n"),
      sum(when(col("kind") === 2, col("c")).otherwise(lit(0L))).as("m"))
    val uni = counts.where(col("kind") === 1)
      .select(col("g1").as("w"), col("c").as("cw"))
    val scored = counts.where(col("kind") === 2 && col("c") >= ColloMinCount)
      .select(col("g1"), col("g2"), col("c"))
      .join(uni.select(col("w").as("g1"), col("cw").as("c_left")), Seq("g1"))
      .join(uni.select(col("w").as("g2"), col("cw").as("c_right")), Seq("g2"))
      .crossJoin(broadcast(totals))
      .withColumn("score",
        expr(s"(((((c * n) DIV c_left) * n) DIV c_right) * $ColloScale) DIV m"))
      .orderBy(col("score").desc, col("g1"), col("g2")).limit(ColloTopK)
    scored.withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("g1"), col("g2"))).cast("int"))
      .select(col("rank"), col("g1"), col("g2"), col("c").as("c_bigram"),
        col("c_left"), col("c_right"), col("score"))
  }

  /** The expensive pass of [[collocations]] PRE-checkpoint: unigrams and
    * bigrams of every doc concatenated into one (kind, g1, g2) struct
    * stream — exactly one Generate and one Exchange (spec-gated). The
    * bigram arm uses the zip_with-of-slices shape (q47's) so a 1-token
    * doc contributes an empty bigram array, never a reversed sequence. */
  private[graft] def colloGramCountsOf(d: DataFrame): DataFrame = {
    // ONE position-explode covers both gram kinds: p ≤ n is unigram p,
    // p > n is bigram p−n — element_at/when are codegen'd, where the
    // previous transform+zip_with struct arrays were built per doc
    // through interpreted HOF evaluation (CodegenFallback). Rows and
    // grouping keys are unchanged (a 1-token doc contributes exactly its
    // unigram: sequence(1, 2·1−1) = [1]).
    val n = size(col("a"))
    val q = col("p") - n
    d.select(split(col("text"), " ").as("a"))
      .select(explode(expr("sequence(1, 2 * size(a) - 1)")).as("p"), col("a"))
      .select(
        when(col("p") <= n, lit(1)).otherwise(lit(2)).as("kind"),
        when(col("p") <= n, element_at(col("a"), col("p")))
          .otherwise(element_at(col("a"), q)).as("g1"),
        when(col("p") <= n, lit(""))
          .otherwise(element_at(col("a"), q + 1)).as("g2"))
      .groupBy(col("kind"), col("g1"), col("g2"))
      .agg(count(lit(1)).as("c"))
  }

  /** q84 support threshold (mirrored in [[TextOracles.cmHeavy]]). */
  val CmHeavyMin = 40L

  /** q84: threshold heavy hitters (all word bigrams with support ≥
    * [[CmHeavyMin]]) via a Count-Min prefilter with exact refine — the
    * sketch twin of q65's Bloom decontamination, and the THRESHOLD
    * counterpart of q72's top-K (different machinery: q72 bounds the
    * output size, q84 bounds the support).
    *
    * Scale shape: pass 1 folds the gram stream into ONE 32 KB Count-Min
    * grid ([[graft.sql.CountMinAgg]] — map-side partial sketches, the
    * exchange carries a single sketch row, never the key space); the
    * frozen grid bakes into the plan as a literal (the q65 Bloom-literal
    * pattern) and pass 2's `cm_est(g) ≥ T` prunes the long tail MAP-SIDE
    * before the only key exchange — at 10^12 grams the exchange shrinks
    * from |all keys| to |heavy candidates|. Because the estimate never
    * undercounts, no truly-heavy key is pruned, and the exact recount +
    * HAVING makes the output BYTE-EQUAL to the plain exact query the
    * oracle runs (sketch error can only admit extra candidates, which the
    * refine removes). */
  def cmHeavy(spark: SparkSession, sfDir: String): DataFrame = {
    // position-explode + element_at (codegen'd) — the kgramHashes rewrite;
    // `size ≥ 2` reproduces the empty-pair-array drop of adjacentPairs
    val grams = docs(spark, sfDir)
      .select(split(col("text"), " ").as("a"))
      .where(size(col("a")) >= 2)
      .select(explode(expr("sequence(1, size(a) - 1)")).as("p"), col("a"))
      .select(concat_ws(" ", element_at(col("a"), col("p")),
        element_at(col("a"), col("p") + 1)).as("g"))
    // bounded driver collect: ONE 32 KB model artifact, never data rows
    val sk = grams.agg(call_function("cm_sketch_agg", col("g")))
      .collect()(0).getAs[Array[Byte]](0)
    grams.where(call_function("cm_est", col("g"), lit(sk)) >= CmHeavyMin)
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .where(col("c") >= CmHeavyMin)
      .orderBy(col("g"))
  }

  val PostingBuckets = 16

  /** Inverted-index posting store — the TEXT twin of the IVF serving
    * layout (`EmbQueries.ivfStore`): postings (term, doc_id, tf) staged
    * hive-partitioned by a term-hash bucket. A term lookup resolves its
    * buckets driver-side (a |terms|-row job) and pushes a literal
    * partition filter, so the scan lists/reads only the queried buckets'
    * directories of a corpus-sized posting table — static pruning, the
    * inverted-list access pattern. */
  def postingStore(spark: SparkSession, sfDir: String): DataFrame = {
    // key names the tokenizer + bucket hash (ADVICE r3): a tokenizer or
    // bucketing change invalidates the stage without a manual bump
    val dir = StageCache.dir(s"$sfDir/documents.parquet", "posting_store",
      s"b$PostingBuckets:tok=ws-space:h=xxhash64:v1")
    StageCache.getOrPublish(spark, dir, partitionCols = Seq("bkt")) {
      postingsOf(docs(spark, sfDir)).repartition(col("bkt"))
    }
  }

  /** (term, doc_id, tf, bkt) postings from a documents frame. */
  def postingsOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .withColumn("bkt",
        pmod(xxhash64(col("term")), lit(PostingBuckets)).cast("int"))

  /** Per-term corpus stats over a posting frame (shared by the pruned
    * store path and the direct recomputation the spec compares against). */
  def termStatsOver(postings: DataFrame, terms: Seq[String]): DataFrame =
    postings.where(col("term").isin(terms: _*))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        max(col("tf")).as("max_tf"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("term"))

  /** q76: term lookup THROUGH the bucket-pruned store. */
  def postingLookup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val terms = Bm25Terms
    val bkts = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(PostingBuckets)).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSeq
    termStatsOver(
      postingStore(spark, sfDir).where(col("bkt").isin(bkts: _*)), terms)
  }

  /** The 128-perm signature table for an sfDir input, staged ONCE per
    * input fingerprint (same pattern as [[minhashLabels]]): q17/q18/q46
    * all consume signatures, and a sweep used to run the expensive
    * MinHash pass once per query. CorpusDedupJob stages exactly this
    * table in its lake; here the stage cache is the query-facing twin.
    * Values are deterministic, so every gate hash is unchanged. */
  private def sigsDf(spark: SparkSession, sfDir: String): DataFrame =
    StageCache.getOrPublish(spark, stageCacheDir(sfDir, "minhash_sigs")) {
      // the docs parquet is one row group (one scan task) — spread the
      // docs BEFORE the expensive MinHash projection so the pass runs on
      // every core, then the stage write is parallel too
      sigsOf(spark, docs(spark, sfDir)
        .repartition(spark.sparkContext.defaultParallelism))
    }

  /** Bump when ANY MinHash-pipeline semantic changes that the constants
    * below don't capture (shingling logic, permutation formula, band-key
    * encoding) — a stale cache would otherwise outlive the code change
    * and desynchronize the gate from the oracle. */
  private val StageCacheVersion = "v2"

  /** fingerprint-keyed stage-cache directory (shared [[StageCache]]
    * machinery): key = source fingerprint + every algorithm constant of
    * the signature pipeline + [[StageCacheVersion]]. */
  private def stageCacheDir(sfDir: String, what: String): java.io.File =
    StageCache.dir(s"$sfDir/documents.parquet", what,
      s"${TextOps.minhashKey}:$StageCacheVersion")

  def sigsOf(spark: SparkSession, d: DataFrame): DataFrame = {
    GraftRegistrar.ensure(spark)
    d.select(col("doc_id"), call_function("minhash128", col("text")).as("sigs"))
  }

  /** Per-doc 128-permutation MinHash signatures. The gate projects spot
    * positions + the full-signature checksum (128 values as columns would
    * bloat the compare; the sum pins every position). */
  def minhashSigs(spark: SparkSession, sfDir: String): DataFrame =
    sigsDf(spark, sfDir)
      .select(col("doc_id"),
        element_at(col("sigs"), 1).as("sig_a"),
        element_at(col("sigs"), 64).as("sig_b"),
        element_at(col("sigs"), 128).as("sig_c"),
        aggregate(col("sigs"), lit(0L), (acc, x) => acc + x).as("sig_sum"))
      .orderBy(col("doc_id"))

  /** MinHash LSH near-dup PAIRS: 32 bands × 4 rows banding (posexplode →
    * equi-join on (band, key) → cross-band pair dedup → exact signature
    * refine ≥ 90/128). Candidate volume is O(N·bands·bucket_size), never
    * O(N²): the join key is the band hash, so only same-bucket rows meet. */
  def minhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    pairsFromSigs(sigsDf(spark, sfDir)) // staged sigs: parquet-backed
      .orderBy(col("a"), col("b"))

  def minhashPairsOf(spark: SparkSession, d: DataFrame): DataFrame =
    minhashPairsWithSigs(spark, d)._1

  /** q91 cross-split leakage audit: every near-dup pair (the staged q18
    * LSH pairs) labeled with both ends' q79 split assignment and a `leak`
    * verdict (a near-duplicate straddling the train/eval wall is exactly
    * the contamination q79's hash wall is built to prevent for RECRAWLS
    * of the same doc — near-dups of DIFFERENT doc_ids hash independently,
    * so this audit is the report a release runs before freezing splits).
    * Scale shape: the split is a pure function of doc_id, derived
    * MAP-SIDE on both pair ends — no join against an assignment table;
    * the corpus-sized work is the staged pair table the audit reads. */
  def splitLeakage(spark: SparkSession, sfDir: String): DataFrame = {
    minhashPairs(spark, sfDir)
      .select(col("a"), col("b"), col("n_match"),
        QualityQueries.splitCol(col("a")).as("split_a"),
        QualityQueries.splitCol(col("b")).as("split_b"))
      .withColumn("leak", col("split_a") =!= col("split_b"))
      .orderBy(col("a"), col("b"))
  }

  /** pairs plus the checkpointed signature handle, so iterative callers can
    * release the signature blocks once their own materialization no longer
    * references them. */
  private[graft] def minhashPairsWithSigs(
      spark: SparkSession, d: DataFrame): (DataFrame, DataFrame) = {
    // materialize the 128-perm signatures ONCE (the expensive pass) at one
    // row per doc; the banded self-join then carries only (band, key,
    // doc_id) ints — LATE MATERIALIZATION: signatures rejoin by doc_id
    // only for the surviving candidate pairs. (The previous shape carried
    // `sigs` through the posexplode, persisting every signature 32× and
    // shuffling 128-long arrays through the join.)
    val sigs = sigsOf(spark, d).trackedCheckpoint
    (pairsFromSigs(sigs), sigs)
  }

  /** Banded candidates + exact refine over an already-materialized
    * signature table (in-memory checkpoint or committed stage) —
    * UNORDERED; gate queries sort, jobs don't need to. The ONE
    * implementation of the LSH candidate+refine pipeline: the gate
    * queries, the label fixed point, and the staged job path
    * ([[graft.jobs.StagedCC]]) all call this, so banding/threshold
    * changes cannot silently diverge the byte-equality-coupled paths. */
  private[graft] def pairsFromSigs(sigs: DataFrame): DataFrame = {
    val bands = sigs.select(col("doc_id"),
      posexplode(TextOps.bandKeys(col("sigs"))).as(Seq("band", "key")))
    val cand = bands.select(col("band"), col("key"), col("doc_id").as("a"))
      .join(bands.select(col("band"), col("key"), col("doc_id").as("b")),
        Seq("band", "key"))
      .where(col("a") < col("b"))
      .dropDuplicates("a", "b")
    cand
      .join(sigs.select(col("doc_id").as("a"), col("sigs").as("sa")), Seq("a"))
      .join(sigs.select(col("doc_id").as("b"), col("sigs").as("sb")), Seq("b"))
      .withColumn("n_match", TextOps.sigMatches(col("sa"), col("sb")))
      .where(col("n_match") >= TextOps.MatchThreshold)
      .select(col("a"), col("b"), col("n_match"))
  }

  /** Near-dup GROUPS from the banded-LSH pair graph: connected components
    * by iterative min-label propagation — label(u) ← min(label(u),
    * min over neighbors) until a zero-change round. No driver-side label
    * structures; the only driver value per round is the changed-count
    * scalar, and rounds are bounded by component diameter (VERDICT r1 #2:
    * "group formation via iterative min-propagation"). */
  def minhashGroups(spark: SparkSession, sfDir: String): DataFrame =
    minhashLabels(spark, sfDir)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), min(col("u")).as("min_doc"), max(col("u")).as("max_doc"))
      .orderBy(col("label"))

  /** q77: dup-cluster size histogram — the observability readout every
    * dedup pass ships (how much mass sits in how-big clusters decides
    * whether near-dup thresholds need tuning). Reads the SAME staged
    * label table as q36/q55 (zero recompute in a sweep); two tiny
    * aggregations over the dup-graph nodes — the corpus itself is never
    * touched. */
  def dupGroupHistogram(spark: SparkSession, sfDir: String): DataFrame =
    minhashLabels(spark, sfDir)
      .groupBy(col("label")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz"))
      .agg(count(lit(1)).as("n_groups"), min(col("label")).as("min_label"),
        max(col("label")).as("max_label"))
      .orderBy(col("sz"))

  /** Component membership (u → label) of the banded-LSH pair graph — the
    * min-propagation fixed point shared by q36 and q55, staged ONCE per
    * input fingerprint (VERDICT r2 #4: the two gate queries used to
    * recompute the full signature→bands→pairs→CC pipeline independently;
    * a real pipeline stages exactly this table — CorpusDedupJob does).
    * The stage is a parquet write keyed by (path, size, mtime) of the
    * source table plus the algorithm version; labels are deterministic, so
    * a replay reads identical values and every gate hash is unchanged. */
  def minhashLabels(spark: SparkSession, sfDir: String): DataFrame =
    StageCache.getOrPublish(spark, stageCacheDir(sfDir, "minhash_labels"),
      afterPublish = GraftCheckpoints.release) {
      // cold path builds on the STAGED signature table, so a sweep runs
      // the MinHash pass at most once across q17/q18/q36/q46/q55
      labelsFromPairs(spark, pairsFromSigs(sigsDf(spark, sfDir)), None)
    }

  def minhashLabelsOf(spark: SparkSession, d: DataFrame): DataFrame = {
    val (pairs, sigs) = minhashPairsWithSigs(spark, d)
    labelsFromPairs(spark, pairs, Some(sigs))
  }

  /** min-propagation + pointer-jumping fixed point over a pair table;
    * `sigsToRelease` is freed once the edge table is materialized. */
  private def labelsFromPairs(spark: SparkSession, pairs: DataFrame,
                              sigsToRelease: Option[DataFrame]): DataFrame = {
    val edges = pairs.select(col("a"), col("b"))
    val sym = edges.union(edges.select(col("b"), col("a"))).toDF("u", "v")
      .trackedCheckpoint
    // sym is materialized — the signature blocks behind the pair plan are dead
    sigsToRelease.foreach(GraftCheckpoints.release)
    // lblCp = the checkpoint HANDLE of the current label table (lbl may be
    // a projection of it); superseded rounds release their blocks
    // immediately, so peak residency is one round, not the fixed-point
    // history (VERDICT r2 #1).
    var lblCp = sym.select(col("u")).distinct().withColumn("label", col("u"))
      .trackedCheckpoint
    var lbl: DataFrame = lblCp
    var changed = 1L
    while (changed > 0) {
      val nbrMin = sym.join(lbl.withColumnRenamed("u", "v"), "v")
        .groupBy(col("u")).agg(min(col("label")).as("nbr"))
      val propagated = lbl.join(nbrMin, Seq("u"), "left")
        .select(col("u"), least(col("label"), coalesce(col("nbr"), col("label"))).as("label"),
          (col("nbr") < col("label")).as("chg"))
        // both sides of the jump self-join read this frame with DIFFERENT
        // partitionings (u vs label) — materialize once per round (the
        // label table is the dup-graph node set, small by construction)
        .trackedCheckpoint
      // POINTER JUMPING: label(u) ← label(label(u)). Every label value is
      // itself a node id present in lbl, so the self-join always resolves.
      // Neighbor-min alone needs O(component diameter) rounds — a chain
      // of near-dups at web scale can be long; the jump halves remaining
      // path lengths each round, so convergence is O(log n) rounds.
      val next = propagated.join(
          propagated.select(col("u").as("label"), col("label").as("label2")),
          Seq("label"), "left")
        .select(col("u"),
          least(col("label"), coalesce(col("label2"), col("label"))).as("label"),
          (col("chg") || col("label2") < col("label")).as("chg"))
        .trackedCheckpoint
      changed = next.agg(coalesce(sum(when(col("chg"), 1L).otherwise(0L)), lit(0L)))
        .collect().head.getLong(0)
      // `next` is materialized (eager checkpoint) — the round's inputs are dead
      GraftCheckpoints.release(propagated)
      GraftCheckpoints.release(lblCp)
      lblCp = next
      lbl = next.drop("chg")
    }
    // the fixed point is checkpointed; the edge table is no longer reachable
    GraftCheckpoints.release(sym)
    // the returned frame is a projection of the last round's checkpoint —
    // register it so release(returned) frees those blocks
    GraftCheckpoints.alias(lbl, lblCp)
  }

  /** Canonical-document selection: per near-dup group keep the best member
    * (longest text, doc_id tiebreak) — the final "which copy survives"
    * stage of a dedup pipeline. Per-group argmax via row_number (partial
    * top-k under WindowGroupLimit), group size joined back. */
  def canonicalDocs(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = minhashLabels(spark, sfDir)
      .join(docs(spark, sfDir).select(col("doc_id").as("u"), col("n_chars")), Seq("u"))
    val sizes = m.groupBy(col("label")).agg(count(lit(1)).as("n_members"))
    m.withColumn("rk", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("n_chars").desc, col("u"))))
      .where(col("rk") === 1)
      .join(sizes, Seq("label"))
      .select(col("label"), col("u").as("keep_doc"), col("n_chars").as("keep_chars"),
        col("n_members"), (col("n_members") - 1).as("n_dropped"))
      .orderBy(col("label"))
  }

  /** SimHash fingerprints — oracle-gated since r2 via the nibble-arithmetic
    * SQL mirror (TextOps.simhashSql). */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    GraftRegistrar.ensure(spark)
    docs(spark, sfDir)
      .select(col("doc_id"), call_function("simhash64", col("text")).as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** SimHash Hamming-ball near-dup pairs: 4×16-bit chunk bucketing — any
    * pair within Hamming distance ≤3 shares at least one chunk exactly
    * (pigeonhole over 4 chunks), so the equi-join on (k, chunk) finds ALL
    * such pairs with O(N·4) bucket rows, never an all-pairs scan; exact
    * popcount refine after the join. */
  def simhashNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    GraftRegistrar.ensure(spark)
    val sh = docs(spark, sfDir)
      .select(col("doc_id"), call_function("simhash64", col("text")).as("sh"))
    val chunks = sh.select(col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(k =>
        shiftrightunsigned(col("sh"), 16 * k).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("k", "chunk")))
      .trackedCheckpoint // one simhash pass, not one per join branch
    val a = chunks.select(col("k"), col("chunk"), col("doc_id").as("a"), col("sh").as("sa"))
    val b = chunks.select(col("k"), col("chunk"), col("doc_id").as("b"), col("sh").as("sb"))
    a.join(b, Seq("k", "chunk"))
      .where(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn("dist", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .where(col("dist") <= 3)
      .select(col("a"), col("b"), col("dist"))
      .orderBy(col("a"), col("b"))
  }

  /** EXACT n-gram Jaccard near-dup (builder prompt's dedup list names it
    * next to MinHash, which only ESTIMATES it): banded-LSH candidates,
    * then |A∩B| / |A∪B| over each doc's DISTINCT 8-gram shingle-hash SET.
    * Kept integer-exact — the gate outputs (common, nA, nB) and filters
    * J ≥ 0.5 as 3·common ≥ nA+nB, so no float ever faces the oracle. At
    * scale: candidates are O(N·bands) from the LSH equi-join, the shingle
    * join is an equi-join on (hash), both shuffle-partitioned. */
  /** (a, b, common, na, nb) shingle overlap over the LSH shortlist — the
    * shared engine of q46 (Jaccard) and q92 (containment). */
  /** The banded-LSH candidate pair frame over the staged signatures —
    * the shared step of q46's exact engine and q115's eval (built ONCE
    * per query; review: the eval used to run it twice, once inside each
    * leg). LAZY on the warm path (optimization round): both sides of the
    * band self-join are the SAME canonical subplan over the staged
    * parquet, so ReuseExchange computes the (band, key) shuffle once —
    * the previous two eager `trackedCheckpoint`s bought nothing the
    * reused exchange doesn't, at the cost of two driver barriers per
    * query (the q18 `pairsFromSigs` path has always run this shape
    * checkpoint-free). The cold shingle-stage build, which reads the
    * frame three times, checkpoints its OWN handle inside the closure
    * ([[shingleOverlapFrom]]). */
  private def bandedCandidates(spark: SparkSession, sfDir: String): DataFrame = {
    GraftRegistrar.ensure(spark)
    val bands = sigsDf(spark, sfDir)
      .select(col("doc_id"),
        posexplode(TextOps.bandKeys(col("sigs"))).as(Seq("band", "key")))
    bands.select(col("band"), col("key"), col("doc_id").as("a"))
      .join(bands.select(col("band"), col("key"), col("doc_id").as("b")), Seq("band", "key"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b")).dropDuplicates("a", "b")
  }

  private def shingleOverlap(spark: SparkSession, sfDir: String): DataFrame =
    shingleOverlapFrom(spark, sfDir, bandedCandidates(spark, sfDir))

  /** q46's exact-Jaccard machinery over a prebuilt (checkpointed)
    * candidate frame — candidates have NO n_match threshold applied
    * (Jaccard decides). */
  private def shingleOverlapFrom(spark: SparkSession, sfDir: String,
                                 cand: DataFrame): DataFrame = {
    // shingle sets are computed ONLY for LSH-shortlisted docs: the
    // broadcast semi-join lands BEFORE the shingle explode, so the md5
    // pass runs over the few hundred candidates, not the whole corpus
    // (~100× less explode/hash/distinct work; counts for non-candidates
    // are never used by the output, so values are unchanged). STAGED once
    // per input fingerprint next to the signatures (VERDICT r3 #5: the
    // explode+md5+distinct pass used to be recomputed per run) — the
    // candidate set is fully determined by the staged signatures and the
    // banding constants already in the key, so the bytes are
    // deterministic and every gate hash is unchanged. Warm path: the LSH
    // candidate join plus three joins over parquet.
    val shc = StageCache.getOrPublish(spark,
        stageCacheDir(sfDir, "jaccard_shingles")) {
      // ONE-TIME cold build: materialize a local candidate handle so the
      // two union branches below read rows, not two more band self-joins
      // (the warm path stays lazy — see bandedCandidates)
      val candCk = cand.trackedCheckpoint
      val candDocs = candCk.select(col("a").as("doc_id"))
        .union(candCk.select(col("b").as("doc_id"))).distinct()
      docs(spark, sfDir)
        .join(candDocs.hint("broadcast"), Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          explode(expr("sequence(1, greatest(length(text) - 7, 1))")).as("p"), col("text"))
        .select(col("doc_id"),
          (conv(substring(md5(expr("substring(text, p, 8)")), 1, 15), 16, 10)
            .cast("bigint") % lit(TextOps.MinhashP)).as("h"))
        .distinct()
    }
    // per-candidate-doc shingle SET in ONE exchange (the same doc_id
    // aggregation the separate `counts` frame already paid), then the
    // pair overlap is a codegen'd array_intersect over the two ≤L-element
    // sets — the previous shape shuffled the exploded (b, h) stream into
    // an equi-join plus a (a, b) count exchange, i.e. two corpus-sliver
    // exchanges more, to compute the same integers. `shc` is distinct per
    // (doc_id, h) by construction, so set size ≡ the old count(*) and
    // |A∩B| ≡ the old join-count; zero-overlap pairs now surface with
    // common = 0 where the inner join dropped them — every consumer
    // filters on a common-positive predicate, so outputs are unchanged
    // (gated by ShingleContainmentSpec's exhaustive all-pairs
    // recomputation and the q46/q92/q115 oracle rows).
    val sets = shc.groupBy(col("doc_id")).agg(collect_set(col("h")).as("hs"))
    cand
      .join(sets.select(col("doc_id").as("a"), col("hs").as("ha")), Seq("a"))
      .join(sets.select(col("doc_id").as("b"), col("hs").as("hb")), Seq("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("ha"), col("hb"))).cast("long").as("common"),
        size(col("ha")).cast("long").as("na"),
        size(col("hb")).cast("long").as("nb"))
  }

  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame =
    shingleOverlap(spark, sfDir)
      .where(col("common") * 3 >= col("na") + col("nb")) // J ≥ 0.5, integer-exact
      .select(col("a"), col("b"), col("common"), col("na"), col("nb"))
      .orderBy(col("a"), col("b"))

  /** q92 shingle CONTAINMENT (Broder 1997's other resemblance measure):
    * max(|A∩B|/|A|, |A∩B|/|B|) = common/min(na,nb) — the subset-duplication
    * detector (a doc quoted wholesale inside a larger one scores high
    * containment at LOW Jaccard, so a Jaccard-only dedup misses it).
    * Integer-exact: `cont_bp = common·10⁴ div least(na,nb)`. Candidate
    * recall caveat, stated for the record: the shortlist is the Jaccard
    * LSH banding, which under-recalls extreme small-inside-large pairs —
    * the production fix at 10^12 docs is banding on the SMALLER doc's
    * shingles; over this corpus's planted near-identical dups the
    * shortlist is exhaustive (every output pair of the exhaustive-scan
    * spec appears). */
  val ContainmentBp = 9000L

  /** q95 cross-modal dedup agreement: of the q18 TEXT near-dup pairs, how
    * many land in the same SEMANTIC seed cell (the q78 quantizer)? The
    * calibration report a pipeline runs before trusting either signal
    * alone — low agreement means the MinHash and embedding views of
    * "duplicate" measure different things and thresholds need re-tuning.
    * Scale shape: the pair table is the staged q18 output, cells are READ
    * from the staged write-time-bucketed assignment ([[EmbQueries
    * .ivfStore]] — ADVICE r4 #2: recomputing seedAssigned here was a
    * corpus-wide window pass the doc claimed was staged) — two id-equi
    * joins against pair-count-sized frames and a one-row rollup; the
    * corpus-sized passes are the staged inputs themselves. */
  def modalAgreement(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = minhashPairs(spark, sfDir).select(col("a"), col("b"))
    val cells = EmbQueries.ivfStore(spark, sfDir)
      .select(col("vec_id"), col("cell"))
    pairs
      .join(cells.select(col("vec_id").as("a"), col("cell").as("cell_a")), Seq("a"))
      .join(cells.select(col("vec_id").as("b"), col("cell").as("cell_b")), Seq("b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("cell_a") === col("cell_b"), 1L).otherwise(0L))
          .as("n_same_cell"))
      .withColumn("agree_bp", expr("n_same_cell * 10000 div n_pairs"))
  }

  def shingleContainment(spark: SparkSession, sfDir: String): DataFrame =
    shingleOverlap(spark, sfDir)
      .withColumn("cont_bp", expr("common * 10000 div least(na, nb)"))
      .where(col("cont_bp") >= ContainmentBp)
      .select(col("a"), col("b"), col("common"), col("na"), col("nb"),
        col("cont_bp"))
      .orderBy(col("a"), col("b"))

  /** BPE-ish subword token counting next to the whitespace count (builder
    * prompt: "token counting (whitespace + a BPE-ish regex)"). The pattern
    * is a GPT-2-style word-piece splitter restricted to constructs with
    * identical semantics in java.util.regex and RE2 (no lookarounds). */
  val BpePattern = "'[a-z]{1,2}| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9']+"

  /** the synthetic docs are pure space-separated words (n_bpe would equal
    * n_ws) — a deterministic punctuated/numeric tail makes the subword
    * split actually diverge from the whitespace count under the oracle. */
  def bpeTokens(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .withColumn("t", concat(col("text"), lit(" it's v"),
        col("doc_id").cast("string"), lit(".0, (beta)!")))
      .select(col("doc_id"),
        regexp_count(col("t"), lit(BpePattern)).as("n_bpe"),
        TextOps.tokenCount(col("t")).as("n_ws"))
      .orderBy(col("doc_id"))

  /** q115 dedup refine-agreement eval — the near-dup twin of q87's ANN
    * recall certificate: precision/recall of the q18 MinHash-signature
    * refine against the q46 exact-Jaccard (J ≥ 0.5) refine, integer bp.
    * Both legs refine the SAME banded candidate set (q18 thresholds sig
    * agreement, q46 computes exact shingle Jaccard), so this evaluates
    * exactly the question a pipeline tunes: how well does cheap signature
    * agreement predict the exact-Jaccard verdict? (Band recall itself is
    * the separate caveat documented at q46/q92 and discharged by the
    * exhaustive spec.) A release runs this before trusting the
    * signature-only path at full scale.
    *
    * Scale shape: the banded candidate frame is built ONCE
    * ([[bandedCandidates]]) and BOTH verdicts are evaluated as flags on
    * one pass over it; the signature and shingle inputs are staged
    * tables shared with q17/q46; every join and the one-row rollup run
    * over pair-table-sized frames only. */
  def dedupEval(spark: SparkSession, sfDir: String): DataFrame = {
    // ONE candidate build feeds both refines (the shared heavy step —
    // running each leg's public query would execute it twice), and both
    // verdicts are evaluated as FLAGS on one pass over the candidate
    // pairs (optimization round: the previous shape materialized each
    // leg's surviving pairs separately and full-outer-joined them — one
    // extra pair-frame shuffle plus duplicated candidate-join chains to
    // compute the same three counts; a pair is "in" a leg iff its flag
    // holds, so the flag sums are the leg counts by construction).
    val cand = bandedCandidates(spark, sfDir)
    val sigs = sigsDf(spark, sfDir)
    shingleOverlapFrom(spark, sfDir, cand) // every cand pair, with common/na/nb
      .join(sigs.select(col("doc_id").as("a"), col("sigs").as("sa")), Seq("a"))
      .join(sigs.select(col("doc_id").as("b"), col("sigs").as("sb")), Seq("b"))
      .select(
        (TextOps.sigMatches(col("sa"), col("sb")) >= TextOps.MatchThreshold)
          .as("lsh"),
        (col("common") * 3 >= col("na") + col("nb")).as("ex"))
      .agg(sum(when(col("lsh"), 1L).otherwise(0L)).as("n_lsh"),
        sum(when(col("ex"), 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("lsh") && col("ex"), 1L).otherwise(0L)).as("n_both"))
      .select(col("n_lsh"), col("n_exact"), col("n_both"),
        expr("n_both * 10000 DIV n_lsh").as("precision_bp"),
        expr("n_both * 10000 DIV n_exact").as("recall_bp"))
  }

  /** q112 tokenizer fertility by language — the tokenizer-parity metric a
    * multilingual release reports (fertility = subword tokens per
    * whitespace word; a tokenizer trained on English-heavy data splits
    * other languages into MORE subwords, so the same context window holds
    * less of their text and per-token pricing taxes them more). Per lang:
    * doc count, subword-token / word / char mass, fertility in
    * cent-tokens-per-word (`tokens·100 div words`, integer) and chars per
    * subword token ×100. Token counting is q43's pair: the [[BpePattern]]
    * GPT-2-style splitter (identical semantics in java.util.regex and
    * RE2) next to the whitespace count, over the same punctuated-tail
    * text so the subword split genuinely diverges from whitespace.
    *
    * Scale shape (10^12 docs): counting is a map-side codegen'd
    * projection (regexp_count — no explode, the token ARRAY never
    * materializes); the corpus faces ONE ≤langs-group partial-agg
    * exchange. */
  def tokenFertility(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .withColumn("t", concat(col("text"), lit(" it's v"),
        col("doc_id").cast("string"), lit(".0, (beta)!")))
      .select(col("lang"),
        regexp_count(col("t"), lit(BpePattern)).cast("long").as("n_bpe"),
        TextOps.tokenCount(col("t")).cast("long").as("n_ws"),
        length(col("t")).cast("long").as("n_chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bpe")).as("tokens"),
        sum(col("n_ws")).as("words"), sum(col("n_chars")).as("chars"))
      .select(col("lang"), col("n_docs"), col("tokens"), col("words"),
        col("chars"),
        expr("tokens * 100 DIV words").as("fertility_c"),
        expr("chars * 100 DIV tokens").as("chars_per_tok_c"))
      .orderBy(col("lang"))

  /** html → extracted text, gated per url (BASELINE.json input_hint:
    * "per-row invariant vs the reference: byte-identical extracted text per
    * url"): run the extraction over the html BINARY column and prove both
    * the md5 of the extracted bytes AND exact equality with the stored
    * `text` column, per document. */
  def extractText(spark: SparkSession, sfDir: String): DataFrame =
    Pages.documentsPages(spark, sfDir)
      .withColumn("extracted", graft.ops.ExtractText.extract(col("html")))
      .select(col("doc_id"), col("url"),
        md5(col("extracted")).as("ext_md5"),
        (col("extracted") === col("text")).as("exact"))
      .orderBy(col("doc_id"))

  /** winnowing document fingerprints (rolling Rabin hash + window-min
    * selection) — the gate aggregates each doc's fingerprint SET, every
    * packed (pos,hash) value exact against the SQL mirror. */
  def winnowFingerprints(spark: SparkSession, sfDir: String): DataFrame = {
    GraftRegistrar.ensure(spark)
    docs(spark, sfDir)
      .select(col("doc_id"),
        explode(call_function("winnow_fp", col("text"))).as("packed"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"), min(col("packed")).as("min_fp"),
        max(col("packed")).as("max_fp"), sum(col("packed")).as("sum_fp"))
      .orderBy(col("doc_id"))
  }

  /** q101 per-language term-count floor and output size. */
  val TermTopK = 10
  val TermMinDf = 5L
  val LiftScale = 1000000L

  /** q101 distinctive terms per language — the corpus-exploration report
    * (Monroe et al.'s "fightin' words" idea, integer-surrogate form)
    * behind every per-slice data card: which terms characterize a
    * language slice relative to the whole corpus. Lift in ppm =
    * `df_lang·10⁶ div df_global` — 10⁶ exactly when a term appears ONLY
    * in that language, lower the more it is shared; a min-df floor kills
    * singleton noise. All integer: `df_lang ≤ 10¹²` keeps the product
    * under 2⁶³ at the full target scale.
    *
    * Scale shape (10^12 docs): the token stream explodes ONCE into the
    * (lang, term, doc) pair-dedup groupBy — the stream's only exchange
    * (the q60 two-stage template; df is a DISTINCT-doc count, so dedup
    * first, then count pairs). df_lang and df_global are rollups over
    * the deduped-pair resp. vocabulary-sized frames; the lang⊳global
    * join is vocab×vocab (AQE-broadcast when it fits); the per-lang
    * top-K is `row_number ≤ K` adjacent to its Window — Spark 4 plans a
    * WindowGroupLimit partial top-k before the exchange, so 5 languages
    * never become 5 reducers (the q52 pattern). */
  def distinctiveTerms(spark: SparkSession, sfDir: String): DataFrame = {
    // materialize the df table ONCE: dfGlobal and the join's left leg are
    // both its consumers, and an unmaterialized lineage would re-run the
    // corpus explode per consumer (spec-gated: the final plan re-explodes
    // nothing).
    val dfLang = termDfOf(docs(spark, sfDir)).trackedCheckpoint
    val dfGlobal = dfLang.groupBy(col("term"))
      .agg(sum(col("df_lang")).as("df_global"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("lift_ppm").desc, col("df_lang").desc, col("term"))
    dfLang.where(col("df_lang") >= TermMinDf)
      .join(dfGlobal, Seq("term"))
      .withColumn("lift_ppm", expr(s"(df_lang * $LiftScale) DIV df_global"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= TermTopK)
      .select(col("lang"), col("rank"), col("term"), col("df_lang"),
        col("df_global"), col("lift_ppm"))
      .orderBy(col("lang"), col("rank"))
  }

  /** The expensive pass of [[distinctiveTerms]] PRE-checkpoint (the plan
    * hook, per the bloomRollupOf convention): token stream → ONE explode →
    * (lang, term, doc) pair-dedup (the stream's first exchange) →
    * (lang, term) df rollup over the deduped pairs. */
  private[graft] def termDfOf(d: DataFrame): DataFrame =
    d.select(col("lang"), explode(split(col("text"), " ")).as("term"),
        col("doc_id"))
      .distinct()
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("df_lang"))

  /** q102 duplicate-mass-by-domain report — the crawl-ops twin of q77's
    * cluster-size histogram: WHERE does the duplicate mass come from?
    * Boilerplate mirrors, syndicated feeds and scraper farms concentrate
    * near-dups in a few registrable domains, and this is the report a
    * crawl planner reads before re-weighting or blocklisting sources
    * (q71's blocklist is its downstream consumer). Per registrable
    * domain: volume, docs in ≥2-member near-dup families (the STAGED
    * q36/q55 label table — a doc carries a label iff it is in some
    * family), family count, dup share in basis points, and the modal
    * duplicating host under a deterministic (n_dup DESC, host) tie-break.
    *
    * Scale shape (10^12 docs): the label table is pair-graph-sized
    * (≪ corpus) and staged once per input fingerprint, so the LEFT join
    * is corpus × small (AQE broadcasts it); host/domain derive map-side
    * from the url; the per-(domain, host) partial-agg is the corpus's
    * only exchange, and the modal-host window runs over the ALREADY
    * aggregated host-sized frame (q98's shape), never the corpus. */
  def dupDomains(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = minhashLabels(spark, sfDir) // staged (u, label)
    // ONE column-pruned corpus pass: the BROADCAST label join prunes the
    // corpus down to the labeled docs, so every dup-side frame below is
    // label-table-sized (host/domain would come from the url in
    // production — the join exists for exactly that reason; the pruned
    // output carries them).
    val lab = docs(spark, sfDir)
      .select(col("doc_id"),
        concat(lit("h"), pmod(col("doc_id"), lit(97)).cast("string"),
          lit(".example."), tld3(col("doc_id"))).as("host"),
        concat(lit("example."), tld3(col("doc_id"))).as("domain"))
      .join(broadcast(labels), col("doc_id") === labels("u"))
      // label-table-sized, but TWO consumers below — materialize so the
      // corpus scan behind it runs exactly once (the q101 lesson)
      .trackedCheckpoint
    val wm = Window.partitionBy(col("domain"))
      .orderBy(col("h_dup").desc, col("host"))
    val modal = lab.groupBy(col("domain"), col("host"))
      .agg(count(lit(1)).as("h_dup"))
      .withColumn("rk", row_number().over(wm))
      .where(col("rk") === 1)
      .select(col("domain"), col("host").as("top_dup_host"),
        col("h_dup").as("top_host_dup"))
    val dupStats = lab.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_dup"),
        countDistinct(col("label")).as("n_groups"),
        min(col("doc_id")).as("min_dup_doc"))
    // the second corpus pass is the denominator census: map-side domain
    // projection, one partial-agg exchange, output |domains| rows
    docs(spark, sfDir)
      .groupBy(concat(lit("example."), tld3(col("doc_id"))).as("domain"))
      .agg(count(lit(1)).as("n_docs"))
      .join(dupStats, Seq("domain"), "left")
      .join(modal, Seq("domain"), "left")
      .select(col("domain"), col("n_docs"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        expr("coalesce(n_dup, 0L) * 10000 DIV n_docs").as("dup_bp"),
        coalesce(col("n_groups"), lit(0L)).as("n_groups"),
        col("min_dup_doc"), col("top_dup_host"), col("top_host_dup"))
      .orderBy(col("domain"))
  }

  /** The q71/q75 host-dimension TLD arm (doc_id mod 3 → com/org/net). */
  private[graft] def tld3(docId: Column): Column =
    when(pmod(docId, lit(3)) === 0, "com")
      .when(pmod(docId, lit(3)) === 1, "org").otherwise("net")

  /** The full q71/q94 host synthesis (`h{id%97}.example.{tld}`) — one
    * Spark-side definition for sites deriving a host from a doc/node id
    * (q106, q111; the DuckDB mirrors spell it inline per oracle). */
  private[graft] def hostCol(docId: Column): Column =
    concat(lit("h"), pmod(docId, lit(97)).cast("string"),
      lit(".example."), tld3(docId))

  /** q103 vocabulary frequency spectrum — the Zipf census a corpus runs
    * before sizing a tokenizer vocabulary or a frequency-based filter
    * (q61's consumer view): for each power-of-two term-frequency bucket
    * (bucket = ⌊log₂ cnt⌋+1 via `length(bin(cnt))`, the q61 integer
    * idiom — no float log), how many distinct terms live there and how
    * much token mass they carry, with exact min/max counts and the
    * lexicographic min term as value pins. The singleton bucket measures
    * hapax mass (Heaps-law head), the top buckets the stopword mass the
    * BPE trainer will merge first.
    *
    * Scale shape (10^12 docs): the token stream explodes ONCE into the
    * term-count partial agg — the corpus's only exchange (map-side
    * combine collapses the Zipf head before the shuffle); the spectrum
    * rollup aggregates the vocabulary-sized count table into ≤64 rows. */
  def vocabSpectrum(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .withColumn("bucket", length(bin(col("cnt"))))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_terms"), sum(col("cnt")).as("tokens"),
        min(col("cnt")).as("min_cnt"), max(col("cnt")).as("max_cnt"),
        min(col("term")).as("min_term"))
      .orderBy(col("bucket"))

  val KwTopK = 3

  /** q107 per-doc keyword extraction — the doc-level feature every
    * indexing / topical-labeling / routing stage derives (q101 is the
    * per-SLICE distinctiveness report; this is its per-DOCUMENT twin):
    * each document's top-[[KwTopK]] terms by integer score
    * `tf·10⁶ div df`. Per fixed corpus size N that ordering IS the
    * tf·idf ordering under linear idf (tf·(N/df) = N·(tf/df) — a
    * positive scalar multiple per doc), so no float log and no
    * N-dependent overflow: tf·10⁶ stays ≪ Long.Max at any corpus size
    * (score is corpus-size-free, unlike tf·(N·10⁶ div df) which
    * overflows at N = 10^12). Ties break (score desc, term asc); docs
    * with < K distinct terms zero-fill.
    *
    * Scale shape (10^12 docs): the token stream explodes ONCE into the
    * (doc, term) tf partial agg — materialized ([[docTfOf]] hook,
    * trackedCheckpoint) because BOTH the df rollup and the score join
    * consume it (the q101 lesson: an unmaterialized lineage re-runs the
    * corpus explode per consumer). The df rollup and the term-keyed
    * score join are exchanges over the already-paired table; the
    * per-doc top-K is `row_number ≤ K` adjacent to its Window →
    * WindowGroupLimit partial top-k (billions of tiny groups, q75's
    * shape), and the closing pivot aggregates ≤K-row groups. */
  def docKeywords(spark: SparkSession, sfDir: String): DataFrame = {
    val tf = docTfOf(docs(spark, sfDir)).trackedCheckpoint
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    val top = tf.join(dfreq, Seq("term"))
      .withColumn("score", expr(s"(tf * $LiftScale) DIV df"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= KwTopK)
    top.groupBy(col("doc_id"))
      .agg(
        max(when(col("rank") === 1, col("term"))).as("k1"),
        max(when(col("rank") === 1, col("score"))).as("v1"),
        max(when(col("rank") === 2, col("term"))).as("k2"),
        max(when(col("rank") === 2, col("score"))).as("v2"),
        max(when(col("rank") === 3, col("term"))).as("k3"),
        max(when(col("rank") === 3, col("score"))).as("v3"))
      .select(col("doc_id"),
        coalesce(col("k1"), lit("")).as("kw1"),
        coalesce(col("v1"), lit(0L)).as("s1"),
        coalesce(col("k2"), lit("")).as("kw2"),
        coalesce(col("v2"), lit(0L)).as("s2"),
        coalesce(col("k3"), lit("")).as("kw3"),
        coalesce(col("v3"), lit(0L)).as("s3"))
      .orderBy(col("doc_id"))
  }

  /** The expensive pass of [[docKeywords]] PRE-checkpoint (plan hook, per
    * the bloomRollupOf convention): ONE explode → (doc, term) tf partial
    * agg — the corpus stream's only Generate and only corpus-sized
    * exchange. */
  private[graft] def docTfOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
}

object TextOracles {
  import TextOps._

  /** q67: same rational BM25 — only BIGINT products and IEEE + * / in the
    * same operation order as the Spark plan, so the double score is
    * bit-identical. The CTE chain is shared with the q85 hybrid oracle. */
  private def bm25Ctes: String = {
    val ts = TextQueries.Bm25Terms
    val tfDefs = ts.indices.map(i =>
      s"len(list_filter(a, x -> x = '${ts(i)}')) AS tf$i").mkString(",\n  ")
    val dfDefs = ts.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(",\n  ")
    val termSum = ts.indices.map(i =>
      s"""(CAST(n_docs*2 - df$i*2 + 1 AS DOUBLE) / CAST(df$i*2 + 1 AS DOUBLE))
         | * (CAST(tf$i*sum_dl*20 AS DOUBLE)
         |    / CAST(tf$i*sum_dl*8 + sum_dl*3 + dl*n_docs*9 AS DOUBLE))"""
        .stripMargin).mkString("\n  + ")
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
       |tf AS (SELECT doc_id, len(a) AS dl,
       |  $tfDefs FROM toks),
       |s AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
       |  $dfDefs FROM tf),
       |sc AS (SELECT doc_id, dl, tf0, tf1, tf2,
       |  $termSum AS score
       |  FROM tf, s)""".stripMargin
  }

  val bm25Rank: String =
    s"""WITH $bm25Ctes
       |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
       |       doc_id, dl, tf0, tf1, tf2, score
       |FROM sc ORDER BY score DESC, doc_id LIMIT ${TextQueries.Bm25TopK}"""
      .stripMargin

  /** q85 mirror: the same BM25 score chain and the q20-proven sequential
    * cosine fold feed integer RRF — `10⁹ // (k0 + rank)` — so the fused
    * ordering is float-free on both sides. */
  val hybridRank: String = {
    val k = TextQueries.HybridK
    val k0 = TextQueries.RrfK0
    s"""WITH $bm25Ctes,
       |lex AS (
       |  SELECT doc_id,
       |         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS lex_rank
       |  FROM sc ORDER BY score DESC, doc_id LIMIT $k),
       |e AS (SELECT vec_id, embedding,
       |             sqrt(${EmbOracles.dotSql("embedding", "embedding")}) AS norm
       |      FROM embeddings),
       |p AS (SELECT embedding AS qemb, norm AS qnorm FROM e WHERE vec_id = 0),
       |cosr AS (SELECT e.vec_id,
       |                ${EmbOracles.dotSql("e.embedding", "p.qemb")} / (p.qnorm * e.norm) AS cos
       |         FROM e CROSS JOIN p),
       |sem AS (
       |  SELECT vec_id AS doc_id,
       |         CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INT) AS sem_rank
       |  FROM cosr ORDER BY cos DESC, vec_id LIMIT $k),
       |fused AS (
       |  SELECT COALESCE(l.doc_id, m.doc_id) AS doc_id,
       |         COALESCE(l.lex_rank, 0) AS lex_rank,
       |         COALESCE(m.sem_rank, 0) AS sem_rank
       |  FROM lex l FULL OUTER JOIN sem m ON l.doc_id = m.doc_id),
       |scored AS (
       |  SELECT doc_id, lex_rank, sem_rank,
       |         CAST(CASE WHEN lex_rank > 0 THEN 1000000000 // ($k0 + lex_rank) ELSE 0 END
       |            + CASE WHEN sem_rank > 0 THEN 1000000000 // ($k0 + sem_rank) ELSE 0 END
       |           AS BIGINT) AS rrf_nano
       |  FROM fused)
       |SELECT CAST(row_number() OVER (ORDER BY rrf_nano DESC, doc_id) AS INT) AS rank,
       |       doc_id, lex_rank, sem_rank, rrf_nano
       |FROM scored ORDER BY rrf_nano DESC, doc_id LIMIT ${TextQueries.HybridTop}"""
      .stripMargin
  }

  val postingLookup: String = {
    val terms = TextQueries.Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |p AS (SELECT term, doc_id, count(*) AS tf FROM toks
       |      WHERE term IN ($terms) GROUP BY term, doc_id)
       |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,
       |       CAST(max(tf) AS BIGINT) AS max_tf,
       |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
       |FROM p GROUP BY term ORDER BY term""".stripMargin
  }

  /** q81 mirror: same staged BIGINT floor divisions in the same order —
    * lift equality is by construction, not float luck. */
  val collocations: String =
    s"""WITH t AS (SELECT string_split(text, ' ') AS a FROM documents),
       |u AS (SELECT unnest(a) AS w FROM t),
       |uc AS (SELECT w, count(*) AS cw FROM u GROUP BY w),
       |ti AS (SELECT a, unnest(generate_series(1, len(a) - 1)) AS i FROM t),
       |bg AS (SELECT a[CAST(i AS INTEGER)] AS g1, a[CAST(i + 1 AS INTEGER)] AS g2 FROM ti),
       |bc AS (SELECT g1, g2, count(*) AS c FROM bg GROUP BY g1, g2),
       |tot AS (SELECT (SELECT CAST(sum(cw) AS BIGINT) FROM uc) AS n,
       |               (SELECT CAST(sum(c) AS BIGINT) FROM bc) AS m),
       |sc AS (
       |  SELECT g1, g2, c AS c_bigram, ca.cw AS c_left, cb.cw AS c_right,
       |    (((((c * n) // ca.cw) * n) // cb.cw) * ${TextQueries.ColloScale}) // m AS score
       |  FROM bc JOIN uc ca ON bc.g1 = ca.w JOIN uc cb ON bc.g2 = cb.w, tot
       |  WHERE c >= ${TextQueries.ColloMinCount})
       |SELECT CAST(row_number() OVER (ORDER BY score DESC, g1, g2) AS INT) AS rank,
       |       g1, g2, c_bigram, c_left, c_right, score
       |FROM sc ORDER BY score DESC, g1, g2 LIMIT ${TextQueries.ColloTopK}"""
      .stripMargin

  /** q84 mirror: the plain EXACT threshold query — the sketch prefilter
    * must be invisible in the output (never-undercount + exact refine). */
  val cmHeavy: String =
    s"""WITH t AS (SELECT string_split(text, ' ') AS a FROM documents),
       |ti AS (SELECT a, unnest(generate_series(1, len(a) - 1)) AS i FROM t),
       |b AS (SELECT a[CAST(i AS INTEGER)] || ' ' || a[CAST(i + 1 AS INTEGER)] AS g FROM ti)
       |SELECT g, count(*) AS c FROM b GROUP BY g
       |HAVING count(*) >= ${TextQueries.CmHeavyMin} ORDER BY g""".stripMargin

  val heavyHitters: String =
    s"""WITH t AS (SELECT string_split(text, ' ') AS a FROM documents),
       |f AS (SELECT a FROM t WHERE len(a) >= 3),
       |g AS (SELECT array_to_string(
       |        list_slice(a, CAST(s AS INTEGER), CAST(s + 2 AS INTEGER)), ' ') AS g
       |      FROM f, unnest(generate_series(1, len(a) - 2)) AS u(s)),
       |c AS (SELECT g, count(*) AS c FROM g GROUP BY g)
       |SELECT CAST(row_number() OVER (ORDER BY c DESC, g) AS INT) AS rank, g, c
       |FROM c ORDER BY c DESC, g LIMIT ${TextQueries.HeavyK}""".stripMargin

  /** q86 mirror: straight off the parquet — the WARC write→parse round
    * trip on the Spark side must reproduce these values byte-exactly
    * (same warc_epoch chain as the q70 crawl-diff oracle). */
  val warcIngest: String =
    """SELECT doc_id,
      |  'https://example.org/d/' || CAST(doc_id AS VARCHAR) AS url,
      |  1704067200 + (CAST(doc_id AS BIGINT) * 7919) % 31536000 AS warc_epoch,
      |  CAST(octet_length(encode('<html>' || text || '</html>')) AS BIGINT) AS content_length,
      |  md5('<html>' || text || '</html>') AS payload_md5
      |FROM documents ORDER BY doc_id""".stripMargin

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
    s"""WITH sigs AS (${sigsSql("documents")})
       |SELECT doc_id,
       |  min(CASE WHEN j = 0 THEN sig END) AS sig_a,
       |  min(CASE WHEN j = 63 THEN sig END) AS sig_b,
       |  min(CASE WHEN j = 127 THEN sig END) AS sig_c,
       |  CAST(sum(sig) AS BIGINT) AS sig_sum
       |FROM sigs GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** banded-LSH near-dup pair mirror: band key = comma-joined 4-row slice
    * (string_agg ORDER BY j ≡ Spark's array slice order). */
  private def pairsCte: String =
    s"""sigs AS (${sigsSql("documents")}),
       |bands AS (
       |  SELECT doc_id, CAST(j // ${BandRows} AS INTEGER) AS band,
       |         string_agg(CAST(sig AS VARCHAR), ',' ORDER BY j) AS key
       |  FROM sigs GROUP BY doc_id, j // ${BandRows}),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |pairs AS (
       |  SELECT c.a, c.b, CAST(sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS BIGINT) AS n_match
       |  FROM cand c
       |  JOIN sigs sa ON sa.doc_id = c.a
       |  JOIN sigs sb ON sb.doc_id = c.b AND sb.j = sa.j
       |  GROUP BY c.a, c.b
       |  HAVING sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) >= ${MatchThreshold})""".stripMargin

  val minhashPairs: String =
    s"""WITH ${pairsCte}
       |SELECT a, b, n_match FROM pairs ORDER BY a, b""".stripMargin

  /** q95 mirror: the q18 pair chain joined to the shared seed-assignment
    * chain ([[EmbOracles.seedAssignCtes]] — CTE name sets are disjoint),
    * one-row agreement rollup. */
  val modalAgreement: String =
    s"""WITH ${pairsCte},
       |${EmbOracles.seedAssignCtes},
       |pc AS (SELECT p.a, p.b, ca.cell AS cell_a, cb.cell AS cell_b
       |       FROM pairs p
       |       JOIN assign0 ca ON ca.vec_id = p.a
       |       JOIN assign0 cb ON cb.vec_id = p.b)
       |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(sum(CASE WHEN cell_a = cell_b THEN 1 ELSE 0 END) AS BIGINT) AS n_same_cell,
       |       CAST((sum(CASE WHEN cell_a = cell_b THEN 1 ELSE 0 END) * 10000) // count(*)
       |         AS BIGINT) AS agree_bp
       |FROM pc""".stripMargin

  /** q91 mirror: the q18 pair chain + the shared q79 split CASE on both
    * ends ([[QualityQueries.splitCaseSql]] — single source). */
  val splitLeakage: String = {
    def splitOf(c: String) =
      QualityQueries.splitCaseSql(s"md5(CAST($c AS VARCHAR))")
    s"""WITH ${pairsCte}
       |SELECT a, b, n_match,
       |       ${splitOf("a")} AS split_a,
       |       ${splitOf("b")} AS split_b,
       |       (${splitOf("a")}) <> (${splitOf("b")}) AS leak
       |FROM pairs ORDER BY a, b""".stripMargin
  }

  /** connected components of the pair graph via recursive transitive
    * closure; label = component-min doc_id (≡ the Spark min-propagation
    * fixed point). */
  val minhashGroups: String =
    s"""WITH RECURSIVE ${pairsCte},
       |sym AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b, a FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, v FROM sym
       |  UNION
       |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
       |lbl AS (SELECT u, LEAST(u, min(v)) AS label FROM reach GROUP BY u)
       |SELECT label, count(*) AS n, min(u) AS min_doc, max(u) AS max_doc
       |FROM lbl GROUP BY label ORDER BY label""".stripMargin

  /** cluster-size histogram: same recursive closure, one more rollup. */
  val dupGroupHistogram: String =
    s"""WITH RECURSIVE ${pairsCte},
       |sym AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b, a FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, v FROM sym
       |  UNION
       |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
       |lbl AS (SELECT u, LEAST(u, min(v)) AS label FROM reach GROUP BY u),
       |g AS (SELECT label, count(*) AS sz FROM lbl GROUP BY label)
       |SELECT sz, count(*) AS n_groups, min(label) AS min_label,
       |       max(label) AS max_label
       |FROM g GROUP BY sz ORDER BY sz""".stripMargin

  /** keep-best per component: same recursive closure as minhashGroups,
    * then per-label argmax by (n_chars DESC, doc_id). */
  val canonicalDocs: String =
    s"""WITH RECURSIVE ${pairsCte},
       |sym AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b, a FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, v FROM sym
       |  UNION
       |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
       |lbl AS (SELECT u, LEAST(u, min(v)) AS label FROM reach GROUP BY u),
       |m AS (SELECT l.label, l.u, d.n_chars FROM lbl l
       |      JOIN documents d ON d.doc_id = l.u),
       |k AS (SELECT label, u, n_chars,
       |        ROW_NUMBER() OVER (PARTITION BY label
       |          ORDER BY n_chars DESC, u) AS rk FROM m),
       |sz AS (SELECT label, count(*) AS n_members FROM m GROUP BY label)
       |SELECT k.label, k.u AS keep_doc, k.n_chars AS keep_chars,
       |       sz.n_members, sz.n_members - 1 AS n_dropped
       |FROM k JOIN sz USING (label) WHERE rk = 1 ORDER BY k.label""".stripMargin

  val simhash: String =
    s"""SELECT doc_id, simhash FROM (${simhashSql("documents")}) ORDER BY doc_id""".stripMargin

  val simhashNeardup: String =
    s"""WITH s AS (${simhashSql("documents")}),
       |u AS (SELECT doc_id, simhash,
       |        CAST(simhash AS HUGEINT)
       |          + CASE WHEN simhash < 0 THEN CAST('18446744073709551616' AS HUGEINT)
       |                 ELSE CAST(0 AS HUGEINT) END AS us
       |      FROM s),
       |ch AS (SELECT doc_id, simhash, k,
       |         CAST((us // CASE k WHEN 0 THEN CAST(1 AS HUGEINT)
       |                            WHEN 1 THEN CAST(65536 AS HUGEINT)
       |                            WHEN 2 THEN CAST(4294967296 AS HUGEINT)
       |                            ELSE CAST(281474976710656 AS HUGEINT) END) % 65536 AS BIGINT) AS chunk
       |       FROM u CROSS JOIN generate_series(0, 3) g(k)),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       |                x.simhash AS sa, y.simhash AS sb
       |         FROM ch x JOIN ch y
       |           ON x.k = y.k AND x.chunk = y.chunk AND x.doc_id < y.doc_id)
       |SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS dist
       |FROM cand WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY a, b""".stripMargin

  val bpeTokens: String = {
    val pat = TextQueries.BpePattern.replace("'", "''")
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$pat')) AS INTEGER) AS n_bpe,
       |  CAST(length(string_split_regex(trim(t), '\\s+')) AS INTEGER) AS n_ws
       |FROM (SELECT doc_id,
       |        text || ' it''s v' || CAST(doc_id AS VARCHAR) || '.0, (beta)!' AS t
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** q112 mirror: q43's token-count pair (DuckDB's RE2 must agree with
    * java.util.regex on the restricted pattern) rolled up per language. */
  val tokenFertility: String = {
    val pat = TextQueries.BpePattern.replace("'", "''")
    s"""WITH d AS (SELECT lang,
       |    text || ' it''s v' || CAST(doc_id AS VARCHAR) || '.0, (beta)!' AS t
       |  FROM documents),
       |f AS (SELECT lang,
       |    CAST(len(regexp_extract_all(t, '$pat')) AS BIGINT) AS n_bpe,
       |    CAST(len(string_split_regex(trim(t), '\\s+')) AS BIGINT) AS n_ws,
       |    CAST(length(t) AS BIGINT) AS n_chars FROM d)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_bpe) AS BIGINT) AS tokens,
       |  CAST(sum(n_ws) AS BIGINT) AS words,
       |  CAST(sum(n_chars) AS BIGINT) AS chars,
       |  CAST(sum(n_bpe) * 100 // sum(n_ws) AS BIGINT) AS fertility_c,
       |  CAST(sum(n_chars) * 100 // sum(n_bpe) AS BIGINT) AS chars_per_tok_c
       |FROM f GROUP BY lang ORDER BY lang""".stripMargin
  }

  val winnowFingerprints: String =
    s"""SELECT doc_id, n_fp, min_fp, max_fp, sum_fp
       |FROM (${graft.ops.WinnowFp.winnowSql("documents")})
       |ORDER BY doc_id""".stripMargin

  /** exact n-gram Jaccard mirror: same shingle hashes (distinct per doc),
    * same banded candidates, integer 3·common ≥ nA+nB threshold. */
  private def shingleOverlapCtes: String =
    s"""sigs AS (${sigsSql("documents")}),
       |bands AS (
       |  SELECT doc_id, CAST(j // ${BandRows} AS INTEGER) AS band,
       |         string_agg(CAST(sig AS VARCHAR), ',' ORDER BY j) AS key
       |  FROM sigs GROUP BY doc_id, j // ${BandRows}),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |sh AS (SELECT DISTINCT doc_id, h FROM (${shingleHashSql("documents")})),
       |counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |common AS (
       |  SELECT c.a, c.b, count(*) AS common
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.a
       |  JOIN sh sb ON sb.doc_id = c.b AND sb.h = sa.h
       |  GROUP BY c.a, c.b)""".stripMargin

  val ngramJaccard: String =
    s"""WITH $shingleOverlapCtes
       |SELECT m.a, m.b, m.common, ca.n AS na, cb.n AS nb
       |FROM common m
       |JOIN counts ca ON ca.doc_id = m.a
       |JOIN counts cb ON cb.doc_id = m.b
       |WHERE m.common * 3 >= ca.n + cb.n
       |ORDER BY m.a, m.b""".stripMargin

  /** q92 mirror: same overlap chain, containment numerator over the
    * smaller set (`least`), same 9000 bp threshold. */
  val shingleContainment: String =
    s"""WITH $shingleOverlapCtes
       |SELECT m.a, m.b, m.common, ca.n AS na, cb.n AS nb,
       |       CAST((m.common * 10000) // least(ca.n, cb.n) AS BIGINT) AS cont_bp
       |FROM common m
       |JOIN counts ca ON ca.doc_id = m.a
       |JOIN counts cb ON cb.doc_id = m.b
       |WHERE (m.common * 10000) // least(ca.n, cb.n) >= ${TextQueries.ContainmentBp}
       |ORDER BY m.a, m.b""".stripMargin

  /** the same extraction chain over the same derived html bytes; `exact`
    * asserts byte identity with the stored text per url. */
  val extractText: String = {
    val ext = graft.ops.ExtractText.extractSql("encode('<html>' || text || '</html>')")
    s"""SELECT doc_id, 'https://example.org/d/' || CAST(doc_id AS VARCHAR) AS url,
       |  md5(extracted) AS ext_md5, extracted = text AS exact
       |FROM (SELECT doc_id, text, $ext AS extracted FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** q101 mirror: same dedup-first df chain, same integer lift, same
    * (lift desc, df desc, term) tie-break. */
  val distinctiveTerms: String =
    s"""WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS term, doc_id
       |           FROM documents),
       |p AS (SELECT DISTINCT lang, term, doc_id FROM t),
       |dl AS (SELECT lang, term, count(*) AS df_lang FROM p GROUP BY 1, 2),
       |dg AS (SELECT term, CAST(sum(df_lang) AS BIGINT) AS df_global
       |       FROM dl GROUP BY term),
       |sc AS (SELECT lang, dl.term, df_lang, df_global,
       |         (df_lang * ${TextQueries.LiftScale}) // df_global AS lift_ppm
       |       FROM dl JOIN dg ON dl.term = dg.term
       |       WHERE df_lang >= ${TextQueries.TermMinDf}),
       |r AS (SELECT lang, term, df_lang, df_global, lift_ppm,
       |        row_number() OVER (PARTITION BY lang
       |          ORDER BY lift_ppm DESC, df_lang DESC, term) AS rank
       |      FROM sc)
       |SELECT lang, CAST(rank AS INTEGER) AS rank, term, df_lang, df_global,
       |       lift_ppm
       |FROM r WHERE rank <= ${TextQueries.TermTopK}
       |ORDER BY lang, rank""".stripMargin

  /** q102 mirror: same recursive closure as q77, same q71/q75 host
    * dimension, same LEFT-join zero fills and modal tie-break. */
  val dupDomains: String =
    s"""WITH RECURSIVE ${pairsCte},
       |sym AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b, a FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, v FROM sym
       |  UNION
       |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
       |lbl AS (SELECT u, LEAST(u, min(v)) AS label FROM reach GROUP BY u),
       |hosts AS (SELECT doc_id,
       |    'h' || CAST(doc_id % 97 AS VARCHAR) || '.example.' ||
       |      CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END AS host,
       |    'example.' ||
       |      CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END AS domain
       |  FROM documents),
       |lab AS (SELECT h.doc_id, h.host, h.domain, l.label
       |        FROM hosts h JOIN lbl l ON l.u = h.doc_id),
       |hh AS (SELECT domain, host, count(*) AS h_dup FROM lab GROUP BY 1, 2),
       |mo AS (SELECT domain, host, h_dup,
       |         row_number() OVER (PARTITION BY domain
       |           ORDER BY h_dup DESC, host) AS rk FROM hh),
       |ds AS (SELECT domain, count(*) AS n_dup,
       |         count(DISTINCT label) AS n_groups,
       |         min(doc_id) AS min_dup_doc FROM lab GROUP BY domain),
       |tot AS (SELECT domain, count(*) AS n_docs FROM hosts GROUP BY domain)
       |SELECT t.domain, t.n_docs,
       |       COALESCE(ds.n_dup, 0) AS n_dup,
       |       COALESCE(ds.n_dup, 0) * 10000 // t.n_docs AS dup_bp,
       |       COALESCE(ds.n_groups, 0) AS n_groups, ds.min_dup_doc,
       |       m.host AS top_dup_host, m.h_dup AS top_host_dup
       |FROM tot t
       |LEFT JOIN ds ON ds.domain = t.domain
       |LEFT JOIN (SELECT domain, host, h_dup FROM mo WHERE rk = 1) m
       |  ON m.domain = t.domain
       |ORDER BY t.domain""".stripMargin

  /** q103 mirror: same single term-count pass, same `length(bin(cnt))`
    * power-of-two bucket (the q61 idiom). */
  val vocabSpectrum: String =
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      |v AS (SELECT term, count(*) AS cnt FROM w GROUP BY term),
      |b AS (SELECT term, cnt,
      |        CAST(length(format('{:b}', cnt)) AS INTEGER) AS bucket FROM v)
      |SELECT bucket, count(*) AS n_terms, CAST(sum(cnt) AS BIGINT) AS tokens,
      |       min(cnt) AS min_cnt, max(cnt) AS max_cnt, min(term) AS min_term
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  /** q115 mirror: both leg statements embedded verbatim as scoped derived
    * tables (each carries its own WITH chain — the q87 idiom), full-outer
    * joined and rolled up to the same one-row agreement report. */
  val dedupEval: String =
    s"""WITH l AS (SELECT a, b, 1 AS il FROM ($minhashPairs) tl),
       |e AS (SELECT a, b, 1 AS ie FROM ($ngramJaccard) te),
       |j AS (SELECT il, ie FROM l FULL JOIN e ON l.a = e.a AND l.b = e.b)
       |SELECT CAST(sum(COALESCE(il, 0)) AS BIGINT) AS n_lsh,
       |  CAST(sum(COALESCE(ie, 0)) AS BIGINT) AS n_exact,
       |  CAST(sum(CASE WHEN il IS NOT NULL AND ie IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
       |  CAST(sum(CASE WHEN il IS NOT NULL AND ie IS NOT NULL THEN 1 ELSE 0 END) * 10000
       |    // sum(COALESCE(il, 0)) AS BIGINT) AS precision_bp,
       |  CAST(sum(CASE WHEN il IS NOT NULL AND ie IS NOT NULL THEN 1 ELSE 0 END) * 10000
       |    // sum(COALESCE(ie, 0)) AS BIGINT) AS recall_bp
       |FROM j""".stripMargin

  /** q107 mirror: same tf/df passes, same integer `tf·10⁶ // df` score,
    * same (score desc, term asc) tie-break and rank-pivot. */
  val docKeywords: String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |             FROM documents),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |       FROM tok GROUP BY doc_id, term),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |s AS (SELECT doc_id, tf.term AS term,
       |        CAST(tf * ${TextQueries.LiftScale} // df AS BIGINT) AS score
       |      FROM tf JOIN df ON tf.term = df.term),
       |r AS (SELECT doc_id, term, score,
       |        row_number() OVER (PARTITION BY doc_id
       |          ORDER BY score DESC, term) AS rn FROM s)
       |SELECT doc_id,
       |  COALESCE(max(CASE WHEN rn = 1 THEN term END), '') AS kw1,
       |  CAST(COALESCE(max(CASE WHEN rn = 1 THEN score END), 0) AS BIGINT) AS s1,
       |  COALESCE(max(CASE WHEN rn = 2 THEN term END), '') AS kw2,
       |  CAST(COALESCE(max(CASE WHEN rn = 2 THEN score END), 0) AS BIGINT) AS s2,
       |  COALESCE(max(CASE WHEN rn = 3 THEN term END), '') AS kw3,
       |  CAST(COALESCE(max(CASE WHEN rn = 3 THEN score END), 0) AS BIGINT) AS s3
       |FROM r WHERE rn <= ${TextQueries.KwTopK}
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
