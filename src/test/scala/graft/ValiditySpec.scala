package graft

import graft.extract.Validity
import org.apache.spark.sql.functions.col

/** Ports every branch of isValidConcept / isValidRelationship
  * (/root/reference/kg-builder/internal/graph/graph.go:225-265,317-336). */
class ValiditySpec extends SparkSuite {
  import spark.implicits._

  private def validNames(in: Seq[String]): Set[String] =
    in.toDF("name").filter(Validity.validName(col("name"))).as[String].collect().toSet

  private def validPreds(in: Seq[String]): Set[String] =
    in.toDF("p").filter(Validity.validPred(col("p"))).as[String].collect().toSet

  test("name: empty and short rejected") {
    assert(validNames(Seq("", "ab", "abc", "AI")) == Set("abc"))
  }

  test("name: special characters rejected (exact reference charset)") {
    val bad = Seq("Xq#z", "a(b)", "semi;colon", "q'uote", "back`tick", "Zz@k",
      "under_score", "pipe|name", "br[ack]et")
    assert(validNames(bad).isEmpty)
    // hyphen, parens-free unicode, digits are fine
    assert(validNames(Seq("Human-Computer Interaction", "Web 2 Era")) ==
      Set("Human-Computer Interaction", "Web 2 Era"))
  }

  test("name: >2-word all-capitalized rejected, two-word kept") {
    assert(validNames(Seq("Qzw Vbn Mlk Jhg", "Quantum Flux Hyper")) == Set.empty)
    assert(validNames(Seq("Machine Learning", "Theory of Mind", "big data trends")) ==
      Set("Machine Learning", "Theory of Mind", "big data trends"))
  }

  test("pred: empty / generic / 'No relationship' rejected, case-sensitively") {
    assert(validPreds(Seq("", "  ", "related to", "is related to", "relates to",
      "No relationship")) == Set.empty)
    // the golden set contains 'Related To' / 'Related to' — the reference's
    // filter is exact-match, so these survive
    assert(validPreds(Seq("Related To", "Related to", "SubsetOf", "closely related to")) ==
      Set("Related To", "Related to", "SubsetOf", "closely related to"))
  }
}
