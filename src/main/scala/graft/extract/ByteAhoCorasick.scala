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

  /** Shared immutable UTF8String per pattern — emitting a hit's surface is
    * a pointer store instead of a per-row wrapper allocation. */
  @transient lazy val patternUtf8: Array[org.apache.spark.unsafe.types.UTF8String] =
    patternBytes.map(org.apache.spark.unsafe.types.UTF8String.fromBytes)

  /** [startByte, endByte) of `patterns(patIdx)` in the searched bytes. */
  final case class Hit(start: Int, end: Int, patIdx: Int)

  @inline private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  // the build resolves every fail chain into the table (dense goto), so a
  // step is ONE array load — the former per-byte fail-link walk on misses
  // is gone from the hot loop (r07)
  @inline private def step(state: Int, b: Byte): Int =
    trans(state * 256 + (b & 0xff))

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

  /** Allocation-free twin of [[leftmostLongest]] for the per-span hot loop
    * of [[ExtractTriplesExpr]]: finds all word-boundary-valid hits into the
    * reusable `sc` arrays, stably sorts them by the same (start asc, byte
    * length desc) key, and greedily keeps non-overlapping hits in place.
    * On return `sc.starts/ends/pats[0 until sc.n]` hold the selection in
    * text order; returns `sc.n`. The old path allocated a Vector builder,
    * a Hit object per raw hit and a boxed sort key per hit for EVERY text
    * span — on a DRAM-bandwidth-bound scan (see class scaladoc) that
    * allocation traffic is pure overhead. Equality with [[leftmostLongest]]
    * is property-pinned by ByteParitySpec. */
  def leftmostLongestInto(bytes: Array[Byte], len: Int, sc: MatchScratch): Int =
    leftmostLongestInto(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET.toLong, len, sc)

  /** Base+offset twin of the byte[] overload, scanning IN PLACE over any
    * memory Spark hands us (on-heap byte[] region of a ColumnVector /
    * UnsafeRow, or off-heap with base=null) via `Platform.getByte` — the
    * caller no longer pays a full `UTF8String.getBytes` copy of every span
    * text just to scan it (r07; the scan reads each byte exactly once
    * either way, the copy was pure extra DRAM traffic). The scanned memory
    * must stay live for the duration of the call only — emitted slices are
    * copied by the caller. */
  def leftmostLongestInto(base: AnyRef, off: Long, len: Int, sc: MatchScratch): Int = {
    import org.apache.spark.unsafe.Platform
    var starts = sc.starts; var ends = sc.ends; var pats = sc.pats
    var m = 0
    var state = 0
    var i = 0
    while (i < len) {
      state = step(state, Platform.getByte(base, off + i))
      val os = outputs(state)
      if (os.length > 0) {
        var j = 0
        while (j < os.length) {
          val patIdx = os(j)
          val start = i + 1 - patByteLen(patIdx)
          val okLeft = start == 0 || !isWord(Platform.getByte(base, off + start - 1))
          val okRight = i + 1 == len || !isWord(Platform.getByte(base, off + i + 1))
          if (okLeft && okRight) {
            if (m == starts.length) {
              sc.grow(); starts = sc.starts; ends = sc.ends; pats = sc.pats
            }
            starts(m) = start; ends(m) = i + 1; pats(m) = patIdx; m += 1
          }
          j += 1
        }
      }
      i += 1
    }
    // stable insertion sort by (start asc, length desc) — identical key to
    // leftmostLongest's sortBy. findAll emits in end order, which is nearly
    // start order, so shifts are rare and the sort is near-linear. (Ties on
    // the full key are impossible: same start + same length = same byte
    // span = same pattern, and patterns are distinct.)
    var a = 1
    while (a < m) {
      val s0 = starts(a); val e0 = ends(a); val p0 = pats(a); val l0 = e0 - s0
      var b = a - 1
      while (b >= 0 && (starts(b) > s0 || (starts(b) == s0 && ends(b) - starts(b) < l0))) {
        starts(b + 1) = starts(b); ends(b + 1) = ends(b); pats(b + 1) = pats(b)
        b -= 1
      }
      starts(b + 1) = s0; ends(b + 1) = e0; pats(b + 1) = p0
      a += 1
    }
    // greedy non-overlap selection, compacted in place
    var k = 0
    var lastEnd = -1
    var c = 0
    while (c < m) {
      if (starts(c) >= lastEnd) {
        starts(k) = starts(c); ends(k) = ends(c); pats(k) = pats(c)
        lastEnd = ends(c); k += 1
      }
      c += 1
    }
    sc.n = k
    k
  }
}

/** Reusable parallel-array hit buffers for [[ByteAhoCorasick.leftmostLongestInto]]
  * — one per thread (see ExtractTriplesExpr's ThreadLocal), never shared. */
final class MatchScratch {
  var starts = new Array[Int](16)
  var ends = new Array[Int](16)
  var pats = new Array[Int](16)
  var n = 0
  def grow(): Unit = {
    starts = java.util.Arrays.copyOf(starts, starts.length * 2)
    ends = java.util.Arrays.copyOf(ends, ends.length * 2)
    pats = java.util.Arrays.copyOf(pats, pats.length * 2)
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
    // dense goto: resolve missing transitions through the fail links ONCE at
    // build time (BFS order guarantees fail(s) is already resolved), so the
    // scan's step() is a single table load with no fail-chain loop. Same
    // next-state function by construction; table size unchanged.
    var c0 = 0
    while (c0 < 256) { // root: missing byte stays at root
      if (trans(c0) < 0) trans(c0) = 0
      c0 += 1
    }
    val bfs = mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach(bfs.enqueue(_))
    while (bfs.nonEmpty) {
      val u = bfs.dequeue()
      var c = 0
      while (c < 256) {
        if (trans(u * 256 + c) < 0) trans(u * 256 + c) = trans(fail(u) * 256 + c)
        c += 1
      }
      children(u).valuesIterator.foreach(bfs.enqueue(_))
    }
    new ByteAhoCorasick(patterns, trans, fail,
      outputsB.map(_.toArray).toArray, patBytes.map(_.length))
  }
}
