package graft

import graft.link.EntityLink
import graft.model.RawTriple

class EntityLinkSpec extends SparkSuite {
  import spark.implicits._

  private def raw(rows: (String, String, String, String, Boolean, Boolean)*) =
    rows.zipWithIndex.map { case ((d, s, p, o, sg, og), i) =>
      RawTriple(d, i, s, p, o, sg, og, "", 1.0)
    }.toDS().toDF()

  private val aliases = Seq(
    ("Machine Learning", "Machine Learning", 1.0),
    ("machine learning", "Machine Learning", 0.7),
    ("ML", "Machine Learning", 0.6),
    ("Artificial Intelligence", "Artificial Intelligence", 1.0),
    // ambiguous alias: resolves by document context
    ("Mercury", "Mercury (planet)", 0.5),
    ("Mercury", "Mercury (element)", 0.5),
    ("Mercury (planet)", "Mercury (planet)", 1.0),
    ("Mercury (element)", "Mercury (element)", 1.0)
  ).toDF("alias", "canonical", "prior")

  private val docsText = Seq(
    ("da", "Machine Learning SubsetOf Artificial Intelligence."),
    ("db", "the planet orbit solar astronomy sky telescope."),
    ("db", "Mercury IsA planet."),
    ("dc", "the toxic metal element chemistry lab liquid."),
    ("dc", "Mercury IsA element.")
  ).toDF("doc_id", "text")

  test("exact and variant aliases resolve to canonical; scores carried") {
    val linked = EntityLink.link(spark,
      raw(("da", "machine learning", "SubsetOf", "Artificial Intelligence", true, true)),
      aliases, docsText)
    val r = linked.select("subj", "pred", "obj").as[(String, String, String)].collect()
    assert(r.toSeq == Seq(("Machine Learning", "SubsetOf", "Artificial Intelligence")))
  }

  test("ambiguous alias disambiguated by TF-IDF document context") {
    val linked = EntityLink.link(spark,
      raw(("db", "Mercury", "IsA", "Artificial Intelligence", true, true),
          ("dc", "Mercury", "IsA", "Machine Learning", true, true)),
      aliases, docsText)
    val bySubj = linked.select("doc_id", "subj").as[(String, String)].collect().toMap
    assert(bySubj("db") == "Mercury (planet)")
    assert(bySubj("dc") == "Mercury (element)")
  }

  test("single-ambiguity-doc corpus: zero IDF degrades to prior, never NaN") {
    // one doc hosting the only ambiguous mention → IDF is log(2/2)=0 for
    // every token, norms are 0 — the guard must keep cos at 0 (prior
    // decides, name tie-break), not 0/0 = NaN
    val oneDoc = Seq(("dz", "Mercury IsA thing.")).toDF("doc_id", "text")
    val linked = EntityLink.link(spark,
      raw(("dz", "Mercury", "IsA", "Machine Learning", true, true)), aliases, oneDoc)
    val row = linked.select("subj", "score").as[(String, Double)].collect()
    assert(row.length == 1)
    assert(!row(0)._2.isNaN, s"score must not be NaN: ${row(0)}")
    assert(row(0)._1 == "Mercury (element)") // equal priors → name asc
  }

  test("ungrounded candidates: valid enters as new entity, invalid drops the triple") {
    val linked = EntityLink.link(spark,
      raw(("da", "Gradient Descent", "UsedBy", "Machine Learning", false, true),
          ("da", "Xq#z", "UsedBy", "Machine Learning", false, true),
          ("da", "ab", "UsedBy", "Machine Learning", false, true)),
      aliases, docsText)
    val subjects = linked.select("subj").as[String].collect().toSet
    assert(subjects == Set("Gradient Descent"))
  }

  test("generic predicates are filtered before linking") {
    val linked = EntityLink.link(spark,
      raw(("da", "Machine Learning", "related to", "Artificial Intelligence", true, true),
          ("da", "Machine Learning", "", "Artificial Intelligence", true, true)),
      aliases, docsText)
    assert(linked.count() == 0)
  }
}
