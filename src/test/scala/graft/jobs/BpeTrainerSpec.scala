package graft.jobs

import graft.sql.SparkTestBase
import scala.collection.mutable

/** The distributed BPE trainer against an independent single-threaded
  * reference implementation (same tie-break: pair freq desc, left asc,
  * right asc) on the Sennrich et al. 2016 canonical corpus
  * {low:5, lower:2, newest:6, widest:3}. */
class BpeTrainerSpec extends SparkTestBase {

  private val End = BpeTrainer.EndMark

  // --- independent reference: plain Scala, no Spark -----------------
  private def refMerge(syms: List[String], l: String, r: String): List[String] =
    syms match {
      case a :: b :: rest if a == l && b == r => (l + r) :: refMerge(rest, l, r)
      case a :: rest => a :: refMerge(rest, l, r)
      case Nil => Nil
    }

  private def refTrain(vocab: Map[String, Long], rounds: Int, minFreq: Long)
      : (List[(String, String, Long)], Map[String, List[String]]) = {
    var state: Map[String, List[String]] =
      vocab.map { case (w, _) => w -> (w.map(_.toString).toList :+ End) }
    val rules = mutable.ListBuffer[(String, String, Long)]()
    var go = true
    var i = 0
    while (i < rounds && go) {
      val counts = mutable.Map[(String, String), Long]().withDefaultValue(0L)
      state.foreach { case (w, syms) =>
        syms.zip(syms.tail).foreach(p => counts(p) += vocab(w))
      }
      if (counts.isEmpty) go = false
      else {
        val ((l, r), pf) = counts.toSeq
          .sortBy { case ((l, r), pf) => (-pf, l, r) }.head
        if (pf < minFreq) go = false
        else {
          rules += ((l, r, pf))
          state = state.map { case (w, s) => w -> refMerge(s, l, r) }
          i += 1
        }
      }
    }
    (rules.toList, state)
  }

  test("distributed trainer matches the single-threaded reference on the paper corpus") {
    import spark.implicits._
    // Sennrich et al. §3.2 example vocabulary, realized as a corpus
    val vocab = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val text = vocab.toSeq.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")

    val rounds = 10
    val (rules, words) = BpeTrainer.train(docs, rounds, minPairFreq = 2L)
    val (refRules, refState) = refTrain(vocab, rounds, minFreq = 2L)

    assert(rules.map(m => (m.left, m.right, m.pairFreq)) === refRules,
      "learned merge sequence diverged from the reference")
    assert(rules.head.pairFreq === 9L) // (e, s): newest 6 + widest 3
    val state = words.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(state === refState, "final symbol table diverged")
    // the tokenizer-apply invariant: replaying the rules on any training
    // word reproduces the trainer's final segmentation
    vocab.keys.foreach { w =>
      assert(BpeTrainer.encodeWord(w, rules).toList === refState(w),
        s"encodeWord($w) != trained state")
    }
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
  }

  test("mergePair is greedy left-to-right non-overlapping") {
    assert(BpeTrainer.mergePair(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(BpeTrainer.mergePair(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(BpeTrainer.mergePair(Seq("x", "a", "a"), "a", "a") === Seq("x", "aa"))
    assert(BpeTrainer.mergePair(Seq("a"), "a", "a") === Seq("a"))
  }

  test("trainer stops when the best pair falls under minPairFreq") {
    import spark.implicits._
    val docs = Seq((0L, "ab ab cd")).toDF("doc_id", "text")
    // pairs: (a,b)=2, (b,</w>)=2, (c,d)=1, (d,</w>)=1 …
    val (rules, _) = BpeTrainer.train(docs, rounds = 50, minPairFreq = 2L)
    assert(rules.nonEmpty)
    assert(rules.forall(_.pairFreq >= 2L))
    assert(rules.size < 50, "must stop before the round budget")
    org.apache.spark.sql.GraftCheckpoints.releaseAll()
  }
}
