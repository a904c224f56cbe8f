package graft.functions

import scala.collection.mutable

/** Byte-pair-encoding tokenizer (Sennrich et al., ACL'16 — the subword
  * vocabulary scheme under modern LM tokenizers), fully DETERMINISTIC:
  * the merge choice breaks ties by (count desc, left symbol asc, right
  * symbol asc) where classic implementations fall back on hash order, so
  * training is reproducible across runs and JVMs — the property every
  * other oracle-checked operator in this engine is built on.
  *
  * The division of labor at scale: word COUNTING is distributed (a
  * groupBy over the corpus), training runs on the collected
  * (word, count) vocabulary — bounded by the vocab cap, NOT the corpus
  * size, which is what makes the driver step legitimate — and ENCODING
  * is distributed again (each distinct word encodes once, then a
  * broadcast join fans the subword splits back over the token stream).
  */
object Bpe {

  type Merge = (String, String)

  /** One greedy left-to-right application of a single merge rule. */
  def applyMerge(syms: Array[String], m: Merge): Array[String] = {
    if (syms.length < 2) return syms
    val out = mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Split a word into single-character symbols. */
  def chars(word: String): Array[String] = word.map(_.toString).toArray

  /** Train `nMerges` merge rules from a weighted vocabulary. Each round
    * counts adjacent symbol pairs over the current splits (weighted by
    * word frequency), merges the winner everywhere, and records it. */
  def train(wordCounts: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    var words: Seq[(Array[String], Long)] =
      wordCounts.map { case (w, c) => (chars(w), c) }
    val merges = mutable.ArrayBuffer[Merge]()
    var done = false
    while (merges.size < nMerges && !done) {
      val pairCounts = mutable.Map[Merge, Long]().withDefaultValue(0L)
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts((syms(i), syms(i + 1))) += c
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (applyMerge(syms, best), c) }
      }
    }
    merges.toSeq
  }

  /** Encode a word by replaying the merge rules in training order. */
  def encode(word: String, merges: Seq[Merge]): Array[String] = {
    var syms = chars(word)
    for (m <- merges) syms = applyMerge(syms, m)
    syms
  }
}
