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

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.length >= 3 &&
          st(0).dataType == StringType && st(1).dataType == StringType &&
          st(2).dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"extract_triples requires array<struct<kind:string,text:string,media_ref:string,...>>, got ${other.sql}")
  }

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

  @inline private def trimWs(b: Array[Byte], from0: Int, until0: Int): (Int, Int) = {
    // String.trim semantics: strip chars <= ' ' from both ends (in UTF-8
    // those code points are single bytes, so the byte test is exact)
    var from = from0; var until = until0
    while (from < until && (b(from) & 0xff) <= 0x20) from += 1
    while (until > from && (b(until - 1) & 0xff) <= 0x20) until -= 1
    (from, until)
  }

  @inline private def trimPunct(b: Array[Byte], from0: Int, until0: Int): (Int, Int) = {
    // Extract.trimPunct: left strips [ ,;], right strips [ .,;]
    var from = from0; var until = until0
    while (from < until && {
      val c = b(from); c == ' ' || c == ',' || c == ';'
    }) from += 1
    while (until > from && {
      val c = b(until - 1); c == ' ' || c == '.' || c == ',' || c == ';'
    }) until -= 1
    (from, until)
  }

  @inline private def slice(b: Array[Byte], from: Int, until: Int): UTF8String =
    UTF8String.fromBytes(b, from, until - from)

  /** Static kernel target for interpreted eval AND generated code. */
  def compute(spans: ArrayData, dict: ByteAhoCorasick, preds: ByteAhoCorasick): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    // lastMedia is cloned out of the (possibly reused) input buffer; the
    // emitted rows outlive this eval call inside Generate
    var lastMedia: UTF8String = EMPTY
    val n = spans.numElements()
    var idx = 0
    while (idx < n) {
      val sp = spans.getStruct(idx, 4)
      val kind = sp.getUTF8String(0)
      if (kind != null && kind.equals(MEDIA)) {
        val m = sp.getUTF8String(2)
        lastMedia = if (m == null) EMPTY else m.clone()
      } else {
        val text = sp.getUTF8String(1)
        if (text != null) {
          // compact copy of this span's bytes (UnsafeRow-backed strings are
          // offset views, so getBytes copies exactly once); all emitted
          // slices wrap THIS private array — no further copies
          val bytes = text.getBytes
          val len = bytes.length
          val ms = dict.leftmostLongest(bytes, len)
          if (ms.length >= 2) {
            val s = ms.head
            val o = ms.last
            val (pf, pu) = trimWs(bytes, s.end, o.start)
            out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](idx,
                UTF8String.fromBytes(dict.patternBytes(s.patIdx)),
                slice(bytes, pf, pu),
                UTF8String.fromBytes(dict.patternBytes(o.patIdx)),
                true, true, lastMedia, 1.0))
          } else {
            val ps = preds.leftmostLongest(bytes, len)
            if (ps.nonEmpty) {
              val p = ps.head
              val m1 = if (ms.nonEmpty) ms.head else null
              val subjIsMention = m1 != null && m1.end <= p.start
              val objIsMention = m1 != null && m1.start >= p.end
              val subj =
                if (subjIsMention) UTF8String.fromBytes(dict.patternBytes(m1.patIdx))
                else { val (f, u) = trimPunct(bytes, 0, p.start); slice(bytes, f, u) }
              val obj =
                if (objIsMention) UTF8String.fromBytes(dict.patternBytes(m1.patIdx))
                else { val (f, u) = trimPunct(bytes, p.end, len); slice(bytes, f, u) }
              if (subj.numBytes() > 0 && obj.numBytes() > 0)
                out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                  Array[Any](idx, subj,
                    UTF8String.fromBytes(preds.patternBytes(p.patIdx)),
                    obj, subjIsMention, objIsMention, lastMedia, 0.8))
            }
          }
        }
      }
      idx += 1
    }
    new GenericArrayData(out.toArray)
  }

  def extractTriples(
      spans: Column,
      dict: org.apache.spark.broadcast.Broadcast[ByteAhoCorasick],
      preds: org.apache.spark.broadcast.Broadcast[ByteAhoCorasick]): Column =
    Bridge.column(ExtractTriplesExpr(Bridge.expression(spans), dict, preds))
}
