package graft.extract

import scala.collection.mutable

/** Byte-level Aho-Corasick — the UTF-8 twin of [[AhoCorasick]], built for the
  * zero-materialization extraction path ([[ExtractTriplesExpr]]).
  *
  * Why a second automaton: the typed kernel decodes every span text from the
  * columnar UTF-8 bytes Spark already holds into a Java String (a byte[] →
  * char[] widening copy, 2 bytes/char) before [[AhoCorasick]] walks chars.
  * At 16 concurrent executor threads on one socket that decode traffic is
  * pure DRAM-bandwidth overhead — the corpus-scale job is bandwidth-bound,
  * not compute-bound (the bare kernel probe scales 1.0 at 4→16 while the
  * pipeline doesn't). This automaton walks the UTF-8 bytes directly, so the
  * hot loop never materializes a String, char[], or Scala collection.
  *
  * Semantics parity with the char automaton (proven by ByteParitySpec):
  *  - Transitions are over unsigned bytes (flat nodes×256 int table; no
  *    boxing, no hashing — same direct-address design as the ASCII fast path
  *    of [[AhoCorasick]]).
  *  - Word boundaries use the same ASCII class [A-Za-z0-9]. UTF-8 lead and
  *    continuation bytes are ≥ 0x80, hence non-word — exactly how the char
  *    automaton classifies every non-ASCII char, so boundary verdicts agree.
  *  - Hits carry BYTE offsets. Both hit ends fall on pattern-byte boundaries,
  *    so slicing the original bytes at hit offsets can never split a UTF-8
  *    sequence: subject/object/predicate slices are byte-identical to the
  *    char kernel's substrings.
  *  - leftmostLongest orders by (start, -length) in bytes. Byte offsets are
  *    a strictly monotone image of char offsets, and two hits with the SAME
  *    start are textual prefixes of one another (so their byte-length and
  *    char-length orders always agree) — the selection is therefore
  *    identical to the char automaton's for ANY pattern set, non-ASCII
  *    included (pinned by ExtractExprParitySpec's hostile-unicode corpus).
  */
final class ByteAhoCorasick private (
    val patterns: Array[String],
    trans: Array[Int],           // [node * 256 + byte] -> next node or -1
    fail: Array[Int],
    outputs: Array[Array[Int]],
    patByteLen: Array[Int]) extends Serializable {

  /** UTF8-byte surfaces of `patterns`, for zero-decode emission. Rebuilt
    * lazily after deserialization (cheap: dictionary-scale). */
  @transient lazy val patternBytes: Array[Array[Byte]] =
    patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** [startByte, endByte) of `patterns(patIdx)` in the searched bytes. */
  final case class Hit(start: Int, end: Int, patIdx: Int)

  @inline private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  @inline private def step(state: Int, b: Byte): Int = {
    val c = b & 0xff
    var s = state
    var nxt = trans(s * 256 + c)
    while (nxt < 0 && s != 0) { s = fail(s); nxt = trans(s * 256 + c) }
    if (nxt < 0) 0 else nxt
  }

  /** All word-boundary-valid hits over `bytes[0, n)`, in text order. */
  def findAll(bytes: Array[Byte], n: Int): Vector[Hit] = {
    val out = Vector.newBuilder[Hit]
    var state = 0
    var i = 0
    while (i < n) {
      state = step(state, bytes(i))
      val os = outputs(state)
      if (os.length > 0) {
        var j = 0
        while (j < os.length) {
          val patIdx = os(j)
          val start = i + 1 - patByteLen(patIdx)
          val end = i + 1
          val okLeft = start == 0 || !isWord(bytes(start - 1))
          val okRight = end == n || !isWord(bytes(end))
          if (okLeft && okRight) out += Hit(start, end, patIdx)
          j += 1
        }
      }
      i += 1
    }
    out.result()
  }

  /** Leftmost-longest non-overlapping selection — same rule as
    * [[AhoCorasick.leftmostLongest]]. */
  def leftmostLongest(bytes: Array[Byte], n: Int): Vector[Hit] = {
    val hits = findAll(bytes, n).sortBy(h => (h.start, -(h.end - h.start)))
    val out = Vector.newBuilder[Hit]
    var lastEnd = -1
    for (h <- hits) if (h.start >= lastEnd) { out += h; lastEnd = h.end }
    out.result()
  }
}

object ByteAhoCorasick {
  def apply(patternsIn: Iterable[String]): ByteAhoCorasick = {
    val patterns = patternsIn.toArray.distinct.filter(_.nonEmpty)
    val patBytes = patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val children = mutable.ArrayBuffer(mutable.HashMap.empty[Int, Int])
    val outputsB = mutable.ArrayBuffer(List.empty[Int])
    patBytes.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { b =>
        val c = b & 0xff
        node = children(node).getOrElseUpdate(c, {
          children += mutable.HashMap.empty[Int, Int]
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
    val trans = Array.fill(n * 256)(-1)
    var i = 0
    while (i < n) {
      children(i).foreach { case (c, v) => trans(i * 256 + c) = v }
      i += 1
    }
    new ByteAhoCorasick(patterns, trans, fail,
      outputsB.map(_.toArray).toArray, patBytes.map(_.length))
  }
}
