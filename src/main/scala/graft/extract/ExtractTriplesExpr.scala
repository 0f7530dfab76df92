package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `extract_triples(spans)` — the OpenIE extraction kernel (SURVEY.md X1/X2)
  * as a native Catalyst expression over the raw `spans` array, the
  * zero-materialization twin of [[Extract.docTriples]].
  *
  * Motivation (measured, BENCH.md round 6): the corpus-scale job is
  * DRAM-bandwidth-bound at high thread counts on one socket — the bare
  * extraction kernel scales 1.00 at 4→16 threads while the pipeline's
  * extract stage scaled ~0.63, and GC is ~1% of CPU, so the gap is the
  * memory traffic of the typed path: decode UnsafeRow → Doc/Span objects
  * (every span text widened byte[]→char[]), run the char kernel, then
  * re-encode RawTriple objects → UnsafeRow. This expression walks the UTF-8
  * bytes Spark already holds ([[ByteAhoCorasick]]), emits InternalRows
  * directly, and composes into whole-stage codegen via `doGenCode` (a static
  * call with plan-referenced automata), eliminating both object-mode
  * boundaries and the widening copies.
  *
  * Semantics are byte-for-byte those of [[Extract.docTriples]] (same
  * leftmost-longest dictionary path, open predicate-grammar path, trim and
  * punctuation rules, media-provenance threading, conf constants); parity is
  * pinned by ExtractExprParitySpec across ASCII, non-ASCII and media-span
  * corpora. The automata ship via `Broadcast` (once per executor), not as
  * plan literals — see `doGenCode`.
  */
case class ExtractTriplesExpr(
    child: Expression,
    dict: org.apache.spark.broadcast.Broadcast[ByteAhoCorasick],
    preds: org.apache.spark.broadcast.Broadcast[ByteAhoCorasick]) extends UnaryExpression {

  override def dataType: DataType = ExtractTriplesExpr.outType
  override def nullable: Boolean = false

  // exactly the 4-field Span shape: compute reads structs with
  // getStruct(idx, 4), so a narrower struct must be rejected here rather
  // than silently read with the wrong field count
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.length == 4 &&
          st(0).dataType == StringType && st(1).dataType == StringType &&
          st(2).dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"extract_triples requires array<struct<kind:string,text:string,media_ref:string,offset:int>>, got ${other.sql}")
  }

  // a null spans array (schema-legal: parquet arrays are nullable) yields
  // zero triples on BOTH paths: compute null-guards, and eval is overridden
  // so the interpreted path doesn't short-circuit to null before compute —
  // keeping the nullable=false declaration honest under codegen, where
  // defineCodeGen passes the child value through unchecked
  override def eval(input: InternalRow): Any =
    ExtractTriplesExpr.compute(
      child.eval(input).asInstanceOf[ArrayData], dict.value, preds.value)

  override protected def nullSafeEval(input: Any): Any =
    ExtractTriplesExpr.compute(input.asInstanceOf[ArrayData], dict.value, preds.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the automata ride a Broadcast, NOT the serialized plan: embedding them
    // as plan literals inflated every stage's task binary by the automaton
    // size (observed 3.6 MiB "large task binary" warnings) — the broadcast
    // ships them to each executor exactly once, torrent-style, and the plan
    // stays bytes-small. The generated code dereferences the broadcast once
    // per projection instance, not per row.
    val bcClass = classOf[org.apache.spark.broadcast.Broadcast[_]].getName
    val acClass = classOf[ByteAhoCorasick].getName
    val dictRef = ctx.addReferenceObj("dictBc", dict, bcClass)
    val predRef = ctx.addReferenceObj("predBc", preds, bcClass)
    val dictLocal = ctx.addMutableState(acClass, "dictAc",
      v => s"$v = ($acClass) $dictRef.value();")
    val predLocal = ctx.addMutableState(acClass, "predAc",
      v => s"$v = ($acClass) $predRef.value();")
    defineCodeGen(ctx, ev, c =>
      s"graft.extract.ExtractTriplesExpr.compute($c, $dictLocal, $predLocal)")
  }

  override protected def withNewChildInternal(newChild: Expression): ExtractTriplesExpr =
    copy(child = newChild)
  override def prettyName: String = "extract_triples"
}

object ExtractTriplesExpr {

  /** RawTriple minus doc_id (the caller projects doc_id alongside). */
  val outType: ArrayType = ArrayType(StructType(Seq(
    StructField("span_idx", IntegerType, nullable = false),
    StructField("subj", StringType, nullable = false),
    StructField("pred", StringType, nullable = false),
    StructField("obj", StringType, nullable = false),
    StructField("subj_grounded", BooleanType, nullable = false),
    StructField("obj_grounded", BooleanType, nullable = false),
    StructField("media_ref", StringType, nullable = false),
    StructField("conf", DoubleType, nullable = false))), containsNull = false)

  private val MEDIA = UTF8String.fromString("media")
  private val EMPTY = UTF8String.fromString("")
  // confidence constants pre-boxed once (java.lang.Double has no box cache —
  // the old code allocated a fresh box per emitted row)
  private val ConfDict: java.lang.Double = 1.0
  private val ConfOpen: java.lang.Double = 0.8
  private val TRUE: java.lang.Boolean = java.lang.Boolean.TRUE
  private val FALSE: java.lang.Boolean = java.lang.Boolean.FALSE
  @inline private def box(b: Boolean): java.lang.Boolean = if (b) TRUE else FALSE
  private val EmptyResult = new GenericArrayData(Array.empty[Any])

  /** Per-thread reusable buffers: automaton hit arrays for both automata
    * plus the output row accumulator. Expression evaluation is single-
    * threaded per task, so a ThreadLocal is race-free; one get() per doc. */
  private final class Scratch {
    val dictHits = new MatchScratch
    val predHits = new MatchScratch
    var rows = new Array[InternalRow](8)
    var nRows = 0
    def addRow(r: InternalRow): Unit = {
      if (nRows == rows.length) rows = java.util.Arrays.copyOf(rows, rows.length * 2)
      rows(nRows) = r; nRows += 1
    }
  }
  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  import org.apache.spark.unsafe.Platform

  @inline private def trimWs(base: AnyRef, off: Long, from0: Int, until0: Int): (Int, Int) = {
    // String.trim semantics: strip chars <= ' ' from both ends (in UTF-8
    // those code points are single bytes, so the byte test is exact)
    var from = from0; var until = until0
    while (from < until && (Platform.getByte(base, off + from) & 0xff) <= 0x20) from += 1
    while (until > from && (Platform.getByte(base, off + until - 1) & 0xff) <= 0x20) until -= 1
    (from, until)
  }

  @inline private def trimPunct(base: AnyRef, off: Long, from0: Int, until0: Int): (Int, Int) = {
    // Extract.trimPunct: left strips [ ,;], right strips [ .,;]
    var from = from0; var until = until0
    while (from < until && {
      val c = Platform.getByte(base, off + from); c == ' ' || c == ',' || c == ';'
    }) from += 1
    while (until > from && {
      val c = Platform.getByte(base, off + until - 1)
      c == ' ' || c == '.' || c == ',' || c == ';'
    }) until -= 1
    (from, until)
  }

  /** Copy-on-emit slice: emitted rows outlive the (reused) scan buffers, so
    * the emitted slice owns a private array — but ONLY emitted slices pay a
    * copy now, not every scanned span (see compute). */
  @inline private def slice(base: AnyRef, off: Long, from: Int, until: Int): UTF8String = {
    val n = until - from
    val arr = new Array[Byte](n)
    Platform.copyMemory(base, off + from, arr, Platform.BYTE_ARRAY_OFFSET.toLong, n.toLong)
    UTF8String.fromBytes(arr)
  }

  /** Static kernel target for interpreted eval AND generated code.
    * Semantics identical to the pre-scratch implementation (pinned by
    * ExtractExprParitySpec against the typed kernel); the per-span work is
    * now allocation-free — hits land in reusable parallel int arrays
    * (ByteAhoCorasick.leftmostLongestInto), pattern surfaces are shared
    * UTF8Strings, and conf/bool boxes are cached. */
  def compute(spans: ArrayData, dict: ByteAhoCorasick, preds: ByteAhoCorasick): ArrayData = {
    if (spans == null) return EmptyResult // null array = no spans, both paths
    val sc = scratch.get()
    sc.nRows = 0
    // lastMedia is cloned out of the (possibly reused) input buffer; the
    // emitted rows outlive this eval call inside Generate
    var lastMedia: UTF8String = EMPTY
    val n = spans.numElements()
    var idx = 0
    while (idx < n) {
      val sp = spans.getStruct(idx, 4)
      if (sp != null) { // null span elements are schema-legal; skip them
        val kind = sp.getUTF8String(0)
        if (kind != null && kind.equals(MEDIA)) {
          val m = sp.getUTF8String(2)
          lastMedia = if (m == null) EMPTY else m.clone()
        } else {
          val text = sp.getUTF8String(1)
          if (text != null) {
            // scan IN PLACE over the bytes Spark already holds (ColumnVector
            // buffer / UnsafeRow region): the former per-span getBytes
            // compaction copied EVERY scanned byte before reading it — pure
            // DRAM traffic on a bandwidth-bound kernel. Only emitted slices
            // copy now (they must outlive the reused scan buffers).
            val base = text.getBaseObject
            val off = text.getBaseOffset
            val len = text.numBytes()
            val nm = dict.leftmostLongestInto(base, off, len, sc.dictHits)
            val dh = sc.dictHits
            if (nm >= 2) {
              val (pf, pu) = trimWs(base, off, dh.ends(0), dh.starts(nm - 1))
              sc.addRow(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                Array[Any](idx,
                  dict.patternUtf8(dh.pats(0)),
                  slice(base, off, pf, pu),
                  dict.patternUtf8(dh.pats(nm - 1)),
                  TRUE, TRUE, lastMedia, ConfDict)))
            } else {
              val np = preds.leftmostLongestInto(base, off, len, sc.predHits)
              if (np > 0) {
                val ph = sc.predHits
                val pStart = ph.starts(0); val pEnd = ph.ends(0)
                val subjIsMention = nm > 0 && dh.ends(0) <= pStart
                val objIsMention = nm > 0 && dh.starts(0) >= pEnd
                val subj =
                  if (subjIsMention) dict.patternUtf8(dh.pats(0))
                  else { val (f, u) = trimPunct(base, off, 0, pStart); slice(base, off, f, u) }
                val obj =
                  if (objIsMention) dict.patternUtf8(dh.pats(0))
                  else { val (f, u) = trimPunct(base, off, pEnd, len); slice(base, off, f, u) }
                if (subj.numBytes() > 0 && obj.numBytes() > 0)
                  sc.addRow(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                    Array[Any](idx, subj,
                      preds.patternUtf8(ph.pats(0)),
                      obj, box(subjIsMention), box(objIsMention), lastMedia, ConfOpen)))
              }
            }
          }
        }
      }
      idx += 1
    }
    if (sc.nRows == 0) EmptyResult
    else {
      val arr = new Array[Any](sc.nRows)
      System.arraycopy(sc.rows, 0, arr, 0, sc.nRows)
      new GenericArrayData(arr)
    }
  }

  def extractTriples(
      spans: Column,
      dict: org.apache.spark.broadcast.Broadcast[ByteAhoCorasick],
      preds: org.apache.spark.broadcast.Broadcast[ByteAhoCorasick]): Column =
    Bridge.column(ExtractTriplesExpr(Bridge.expression(spans), dict, preds))
}
