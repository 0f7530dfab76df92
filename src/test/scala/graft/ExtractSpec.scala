package graft

import graft.extract.{AhoCorasick, Extract}
import graft.model.{Doc, RawTriple, Span}

/** Mini-doc fixtures in the spirit of the reference's mock LLM closures
  * (/root/reference/kg-builder/internal/tests/graph/graph_test.go:41-75):
  * fixed inputs → exact expected triples. */
class ExtractSpec extends SparkSuite {
  import spark.implicits._

  private val dict = spark.sparkContext.broadcast(
    AhoCorasick(Seq("Machine Learning", "Artificial Intelligence", "Data Mining",
      "Neural Networks", "Convolutional Neural Networks", "machine learning")))
  private val preds = spark.sparkContext.broadcast(
    AhoCorasick(Seq("SubsetOf", "Uses", "Branch Of")))

  private def extract(docs: Doc*): Seq[RawTriple] =
    Extract.rawTriples(spark.createDataset(docs), dict, preds)
      .collect().toSeq.sortBy(t => (t.doc_id, t.span_idx))

  test("dictionary path: subj=first mention, obj=last, pred=verbatim middle") {
    val d = Doc("d1", Seq(Span("text", "Machine Learning SubsetOf Artificial Intelligence.", "", 0)))
    val Seq(t) = extract(d)
    assert((t.subj, t.pred, t.obj) == ("Machine Learning", "SubsetOf", "Artificial Intelligence"))
    assert(t.subj_grounded && t.obj_grounded && t.conf == 1.0)
  }

  test("template prefixes/suffixes are ignored; containment resolved") {
    val d = Doc("d2", Seq(
      Span("text", "It is documented that Convolutional Neural Networks Uses Neural Networks.", "", 0),
      Span("text", "Data Mining Branch Of machine learning, according to the survey.", "", 80)))
    val ts = extract(d)
    assert(ts.map(t => (t.subj, t.pred, t.obj)) == Seq(
      ("Convolutional Neural Networks", "Uses", "Neural Networks"),
      ("Data Mining", "Branch Of", "machine learning")))
  }

  test("mention inside predicate does not shift endpoints") {
    val d = Doc("d3", Seq(Span("text",
      "Artificial Intelligence Uses Data Mining Uses Machine Learning.", "", 0)))
    val Seq(t) = extract(d)
    assert((t.subj, t.obj) == ("Artificial Intelligence", "Machine Learning"))
    assert(t.pred == "Uses Data Mining Uses")
  }

  test("open path: ungrounded side becomes a candidate, grounded side kept") {
    val d = Doc("d4", Seq(
      Span("text", "Quantum Widgets SubsetOf Machine Learning.", "", 0),
      Span("text", "Machine Learning Uses gradient descent.", "", 50)))
    val ts = extract(d)
    assert(ts.map(t => (t.subj, t.subj_grounded, t.pred, t.obj, t.obj_grounded)) == Seq(
      ("Quantum Widgets", false, "SubsetOf", "Machine Learning", true),
      ("Machine Learning", true, "Uses", "gradient descent", false)))
    assert(ts.forall(_.conf == 0.8))
  }

  test("no mentions and no predicate grammar hit → nothing") {
    val d = Doc("d5", Seq(Span("text", "the quarterly budget was finalized.", "", 0)))
    assert(extract(d).isEmpty)
  }

  test("media spans carry through as provenance media_ref") {
    val d = Doc("d6", Seq(
      Span("media", "", "media://abc", 0),
      Span("text", "Machine Learning SubsetOf Artificial Intelligence.", "", 1),
      Span("media", "", "media://def", 60),
      Span("text", "Data Mining Uses Machine Learning.", "", 61)))
    val ts = extract(d)
    assert(ts.map(_.media_ref) == Seq("media://abc", "media://def"))
    assert(ts.map(_.span_idx) == Seq(1, 3))
  }
}
