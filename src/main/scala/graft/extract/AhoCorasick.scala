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
  */
final class AhoCorasick private (
    val patterns: Array[String],
    children: Array[mutable.HashMap[Char, Int]],
    fail: Array[Int],
    outputs: Array[List[Int]]) extends Serializable {

  /** [start, end) span of `patterns(patIdx)` in the searched text. */
  final case class Hit(start: Int, end: Int, patIdx: Int) {
    def surface: String = patterns(patIdx)
  }

  @inline private def isWord(c: Char): Boolean = Character.isLetterOrDigit(c)

  /** All word-boundary-valid hits, in text order. */
  def findAll(text: String): Vector[Hit] = {
    val out = Vector.newBuilder[Hit]
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      var s = state
      while (s != 0 && !children(s).contains(c)) s = fail(s)
      state = children(s).getOrElse(c, 0)
      var o = outputs(state)
      while (o.nonEmpty) {
        val patIdx = o.head
        val start = i + 1 - patterns(patIdx).length
        val end = i + 1
        val okLeft = start == 0 || !isWord(text.charAt(start - 1))
        val okRight = end == n || !isWord(text.charAt(end))
        if (okLeft && okRight) out += Hit(start, end, patIdx)
        o = o.tail
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

  def contains(s: String): Boolean = {
    var state = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var st = state
      while (st != 0 && !children(st).contains(c)) st = fail(st)
      state = children(st).getOrElse(c, 0)
      i += 1
    }
    outputs(state).exists(p => patterns(p).length == s.length)
  }
}

object AhoCorasick {
  def apply(patternsIn: Iterable[String]): AhoCorasick = {
    val patterns = patternsIn.toArray.distinct.filter(_.nonEmpty)
    val children = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val outputsB = mutable.ArrayBuffer(List.empty[Int])
    // goto trie
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
    // failure links (BFS)
    val fail = Array.fill(children.length)(0)
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
    new AhoCorasick(patterns, children.toArray, fail, outputsB.toArray)
  }
}
