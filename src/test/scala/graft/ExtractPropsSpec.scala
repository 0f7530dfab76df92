package graft

import graft.extract.{AhoCorasick, Extract}
import graft.model.{Doc, Span}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Adversarial property tests for the extraction kernel (SURVEY.md §5 item
  * 2). The deterministic corpus honors a friendly contract — one sentence
  * per span, subject-first — but the kernel must stay SAFE off-contract:
  * hostile spans (nested/overlapping aliases, predicate-grammar hits inside
  * entity names, multi-sentence spans, unicode, empty text, media runs)
  * must never crash it, never produce duplicate triples for a span, never
  * mutate the span sequence (the input_hint span invariant), and must keep
  * provenance (span_idx, media_ref) exact. GoldenParitySpec covers the
  * friendly corpus; this suite covers everything else.
  */
class ExtractPropsSpec extends AnyFunSuite {

  // hostile dictionary: nested ("Machine" ⊂ "Machine Learning" ⊂ context),
  // overlapping, an alias IDENTICAL to a predicate ("uses"), non-ASCII
  // (wide automaton path), and punctuation-bearing names
  private val aliases = Seq(
    "AI", "Machine Learning", "Learning", "Machine",
    "Deep Learning", "Deep Learning Systems",
    "uses", // alias == predicate-grammar entry
    "Ångström Synthesis", "中文概念",
    "Named Entity Recognition (NER)")
  private val preds = Seq("is a", "uses", "extends", "is related to", "supports")
  private val noise = Seq("the", "frob", "42", "—", "naïve", "x.y", ";", "")

  private val ac = AhoCorasick(aliases)
  private val pc = AhoCorasick(preds)

  private val token: Gen[String] = Gen.frequency(
    4 -> Gen.oneOf(aliases), 3 -> Gen.oneOf(preds), 3 -> Gen.oneOf(noise))
  private val sentence: Gen[String] = for {
    n <- Gen.choose(0, 10)
    ws <- Gen.listOfN(n, token)
    // multi-sentence tails break the one-sentence-per-span contract
    end <- Gen.oneOf(".", "!", "", ". Machine Learning uses AI.")
  } yield (ws.mkString(" ") + end).trim
  private val span: Gen[Span] = Gen.frequency(
    5 -> (for { t <- sentence; off <- Gen.choose(0, 1000) }
      yield Span("text", t, "", off)),
    2 -> (for { m <- Gen.oneOf("img-1", "vid-2", ""); off <- Gen.choose(0, 1000) }
      yield Span("media", "", m, off)))
  private val doc: Gen[Doc] = for {
    id <- Gen.choose(0, 10000).map(i => s"doc-$i")
    k <- Gen.choose(0, 8)
    sps <- Gen.listOfN(k, span)
  } yield Doc(id, sps)

  test("hostile docs: no crash, ≤1 triple per span, exact provenance, span sequence untouched") {
    for (d <- Check.samples(doc, 400)) {
      val before = d.spans.map(s => (s.kind, s.text, s.media_ref, s.offset))
      val ts = Extract.docTriples(d, ac, pc).toVector // must not throw
      val after = d.spans.map(s => (s.kind, s.text, s.media_ref, s.offset))
      assert(before == after, "extraction must never rewrite the span sequence")
      assert(ts.groupBy(_.span_idx).values.forall(_.size == 1),
        s"duplicate triples for one span: $ts")
      for (t <- ts) {
        assert(t.doc_id == d.doc_id)
        assert(t.span_idx >= 0 && t.span_idx < d.spans.length)
        assert(d.spans(t.span_idx).kind == "text", "triples only from text spans")
        // media provenance = nearest PRECEDING media span, exactly
        val expected = d.spans.take(t.span_idx).reverse
          .find(_.kind == "media").map(_.media_ref).getOrElse("")
        assert(t.media_ref == expected,
          s"media_ref '${t.media_ref}' != nearest preceding '$expected'")
        assert(t.subj.nonEmpty && t.obj.nonEmpty && t.pred != null)
        // grounded endpoints are verbatim dictionary surfaces
        if (t.subj_grounded) assert(aliases.contains(t.subj), t.subj)
        if (t.obj_grounded) assert(aliases.contains(t.obj), t.obj)
      }
    }
  }

  test("hostile docs: extraction is deterministic (same doc → same triples)") {
    for (d <- Check.samples(doc, 150)) {
      val a = Extract.docTriples(d, ac, pc).toVector
      val b = Extract.docTriples(d, ac, pc).toVector
      assert(a == b)
    }
  }

  test("hostile text: leftmost-longest hits are in-bounds, verbatim, non-overlapping") {
    for (d <- Check.samples(doc, 200); sp <- d.spans if sp.kind == "text") {
      val hs = ac.leftmostLongest(sp.text)
      hs.foreach { h =>
        assert(h.start >= 0 && h.end <= sp.text.length && h.start < h.end)
        assert(sp.text.substring(h.start, h.end) == h.surface)
      }
      hs.iterator.sliding(2).withPartial(false).foreach { w =>
        assert(w(0).end <= w(1).start, s"overlap in $hs on '${sp.text}'")
      }
    }
  }

  test("degenerate docs: empty spans, empty text, media-only, alias==text") {
    val degenerates = Seq(
      Doc("d0", Nil),
      Doc("d1", Seq(Span("text", "", "", 0))),
      Doc("d2", Seq(Span("media", "", "m", 0), Span("media", "", "", 1))),
      Doc("d3", Seq(Span("text", "uses", "", 0))), // lone pred/alias token
      Doc("d4", Seq(Span("text", "Machine Learning", "", 0))),
      Doc("d5", Seq(Span("text", "中文概念 uses 中文概念.", "", 0))))
    for (d <- degenerates) {
      val ts = Extract.docTriples(d, ac, pc).toVector // no crash
      assert(ts.forall(t => t.subj.nonEmpty && t.obj.nonEmpty))
    }
    // the unicode self-relation extracts through the wide automaton path
    val zh = Extract.docTriples(degenerates.last, ac, pc).toVector
    assert(zh.map(t => (t.subj, t.pred, t.obj)) ==
      Vector(("中文概念", "uses", "中文概念")))
  }
}
