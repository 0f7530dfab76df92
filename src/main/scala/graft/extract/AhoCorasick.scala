package graft.extract

import scala.collection.mutable

/** Serializable Aho-Corasick automaton for dictionary mention detection
  * (SURVEY.md X4). Built once on the driver, `sparkContext.broadcast` to
  * executors, invoked inside typed mapPartitions — the Spark-native stand-in
  * for the reference's LLM grounding of concept names
  * (/root/reference/kg-builder/internal/llm/llm.go:56-166 trusts LLM strings;
  * we match against an explicit alias dictionary).
  *
  * Matching is case-sensitive (case variants are separate dictionary entries
  * from the alias table) and word-boundary-gated: a hit is valid only if the
  * characters adjacent to it are non-alphanumeric or absent.
  *
  * Transitions for ASCII (<128) are a flat direct-address int array
  * (nodes × 128) — the scan is a tight array walk, no hashing or boxing on
  * the hot path; rare non-ASCII chars fall back to per-node hash maps.
  */
final class AhoCorasick private (
    val patterns: Array[String],
    ascii: Array[Int],           // [node * 128 + char] -> next node or -1
    wide: Array[Map[Char, Int]], // non-ASCII children per node
    fail: Array[Int],
    outputs: Array[Array[Int]]) extends Serializable {

  /** [start, end) span of `patterns(patIdx)` in the searched text. */
  final case class Hit(start: Int, end: Int, patIdx: Int) {
    def surface: String = patterns(patIdx)
  }

  // ASCII word class, matching the oracle-facing boundaryRegex
  // ([^A-Za-z0-9]) exactly — one boundary definition across both engines
  // (full-Unicode isLetterOrDigit would reject an alias next to an accented
  // char that the regex accepts).
  @inline private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  @inline private def child(s: Int, c: Char): Int =
    if (c < 128) ascii(s * 128 + c)
    else wide(s).getOrElse(c, -1)

  @inline private def step(state: Int, c: Char): Int = {
    var s = state
    var nxt = child(s, c)
    while (nxt < 0 && s != 0) { s = fail(s); nxt = child(s, c) }
    if (nxt < 0) 0 else nxt
  }

  /** All word-boundary-valid hits, in text order. */
  def findAll(text: String): Vector[Hit] = {
    val out = Vector.newBuilder[Hit]
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      state = step(state, text.charAt(i))
      val os = outputs(state)
      if (os.length > 0) {
        var j = 0
        while (j < os.length) {
          val patIdx = os(j)
          val start = i + 1 - patterns(patIdx).length
          val end = i + 1
          val okLeft = start == 0 || !isWord(text.charAt(start - 1))
          val okRight = end == n || !isWord(text.charAt(end))
          if (okLeft && okRight) out += Hit(start, end, patIdx)
          j += 1
        }
      }
      i += 1
    }
    out.result()
  }

  /** Leftmost-longest non-overlapping hit selection — resolves containments
    * like "Neural Networks" ⊂ "Convolutional Neural Networks". */
  def leftmostLongest(text: String): Vector[Hit] = {
    val hits = findAll(text).sortBy(h => (h.start, -(h.end - h.start)))
    val out = Vector.newBuilder[Hit]
    var lastEnd = -1
    for (h <- hits) if (h.start >= lastEnd) { out += h; lastEnd = h.end }
    out.result()
  }

  /** True iff ANY pattern occurs in `text` as a plain substring (no word
    * boundary gating) — the automaton equivalent of
    * `patterns.exists(text.contains)`, in ONE O(|text|) pass instead of one
    * scan per pattern. Early-exits at the first hit. */
  def containsAnySubstring(text: String): Boolean = {
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      state = step(state, text.charAt(i))
      if (outputs(state).length > 0) return true
      i += 1
    }
    false
  }

  def contains(s: String): Boolean = {
    var state = 0
    var i = 0
    while (i < s.length) { state = step(state, s.charAt(i)); i += 1 }
    outputs(state).exists(p => patterns(p).length == s.length)
  }
}

object AhoCorasick {
  def apply(patternsIn: Iterable[String]): AhoCorasick = {
    val patterns = patternsIn.toArray.distinct.filter(_.nonEmpty)
    val children = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val outputsB = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { c =>
        node = children(node).getOrElseUpdate(c, {
          children += mutable.HashMap.empty[Char, Int]
          outputsB += Nil
          children.length - 1
        })
      }
      outputsB(node) = pi :: outputsB(node)
    }
    val n = children.length
    val fail = Array.fill(n)(0)
    val queue = mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (c, v) =>
        queue.enqueue(v)
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(v) = if (children(f).contains(c) && children(f)(c) != v) children(f)(c) else 0
        outputsB(v) = outputsB(v) ++ outputsB(fail(v))
      }
    }
    val ascii = Array.fill(n * 128)(-1)
    val wide = Array.fill[Map[Char, Int]](n)(Map.empty)
    var i = 0
    while (i < n) {
      children(i).foreach { case (c, v) =>
        if (c < 128) ascii(i * 128 + c) = v
        else wide(i) = wide(i) + (c -> v)
      }
      i += 1
    }
    new AhoCorasick(patterns, ascii, wide, fail, outputsB.map(_.toArray).toArray)
  }
}
