package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** bpe_encode(text, merges) -> array<string>: byte-pair-encoding subword
  * tokenization with a TRAINED merge table (Sennrich et al. 2016,
  * arXiv:1508.07909) — the real LLM-pipeline tokenizer, not the regex proxy.
  * The text is lowercased and split on ASCII whitespace; each word starts as
  * single-character symbols and adjacent symbol pairs are merged in rank
  * order until no ranked pair remains. Concatenating the output tokens
  * reproduces the input with whitespace removed — the round-trip identity
  * the q88 oracle pins.
  *
  * The merge table rides in the expression (a plan literal — serialized once
  * per task like any plan): fine up to tens of thousands of merges; a
  * full-production vocab would move to a broadcast variable behind the same
  * kernel. Like the sketch kernels this is CodegenFallback on purpose — the
  * per-row work is a compiled loop, not an expression tree.
  */
case class BpeEncode(child: Expression, merges: Seq[String]) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  // "left right" merge lines -> rank map, built once per task
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    var i = 0
    merges.foreach { line =>
      if (m.putIfAbsent(line, Integer.valueOf(i)) == null) i += 1
    }
    m
  }

  // Java regex \\s: [ \\t\\n\\x0B\\f\\r] - the same set the oracle-side
  // regexp_replace removes, so the round-trip identity is self-consistent
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def encodeWord(word: String, out: java.util.ArrayList[UTF8String]): Unit = {
    // pathological unbroken runs (minified JS, base64 blobs) would make the
    // merge loop O(L^2); real tokenizers cap per-word input the same way
    // (e.g. WordPiece max_input_chars_per_word). Emitting the run as ONE
    // token preserves the round-trip identity — no characters are lost.
    if (word.length > BpeEncode.maxWordChars) {
      out.add(UTF8String.fromString(word)); return
    }
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) { // split into code points, not chars
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(word.substring(i, i + n))
      i += n
    }
    var done = syms.size < 2
    while (!done) {
      // lowest-rank adjacent pair present in this word
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = rank.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        // merge EVERY occurrence of the chosen pair, left to right
        val a = syms.get(bestAt); val b = syms.get(bestAt + 1)
        val next = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == a && syms.get(k + 1) == b) {
            next.add(a + b); k += 2
          } else { next.add(syms.get(k)); k += 1 }
        }
        syms = next
        done = syms.size < 2
      }
    }
    var t = 0
    while (t < syms.size) { out.add(UTF8String.fromString(syms.get(t))); t += 1 }
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val out = new java.util.ArrayList[UTF8String](text.length / 4 + 4)
    var i = 0
    while (i < text.length) {
      while (i < text.length && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < text.length && !isWs(text.charAt(i))) i += 1
      if (i > start) encodeWord(text.substring(start, i), out)
    }
    new GenericArrayData(out.toArray[AnyRef](new Array[AnyRef](out.size)))
  }
  override protected def withNewChildInternal(c: Expression): BpeEncode = copy(child = c)
}
object BpeEncode {
  /** Per-word merge-loop cap (chars); longer runs pass through whole. */
  val maxWordChars = 1000
}

/** Driver-local BPE merge training over a (word, weight) frequency table —
  * the bounded-sample fit [[graft.nodes.BpeTokenizerNode]] runs. Tokenizer
  * TRAINING is a single-node job on a capped sample in every real pipeline
  * (the corpus-scale work is application, which the kernel above
  * distributes); determinism: ties break by (count desc, pair asc).
  */
object BpeTrain {
  def train(wordFreq: Seq[(String, Long)], numMerges: Int): Seq[String] = {
    // word -> mutable symbol list, parallel weight array
    val words = wordFreq.map { case (w, _) =>
      val syms = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        syms += w.substring(i, i + n)
        i += n
      }
      syms
    }.toArray
    val weight = wordFreq.map(_._2).toArray
    val merges = scala.collection.mutable.ArrayBuffer[String]()
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < words.length) {
        val s = words(wi)
        var j = 0
        while (j < s.length - 1) {
          val k = (s(j), s(j + 1))
          counts(k) = counts.getOrElse(k, 0L) + weight(wi)
          j += 1
        }
        wi += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (bestPair, bestCount) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) } // count desc, pair asc
        if (bestCount < 2) exhausted = true // nothing repeats: merging is noise
        else {
          merges += s"${bestPair._1} ${bestPair._2}"
          wi = 0
          while (wi < words.length) {
            val s = words(wi)
            var j = 0
            while (j < s.length - 1) {
              if (s(j) == bestPair._1 && s(j + 1) == bestPair._2) {
                s(j) = bestPair._1 + bestPair._2
                s.remove(j + 1)
              } else j += 1
            }
            wi += 1
          }
        }
      }
      m += 1
    }
    merges.toSeq
  }
}
