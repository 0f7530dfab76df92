package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's candidate-validity gates as pure Catalyst column
  * expressions (whole-stage-codegen friendly — no UDFs).
  *
  * isValidConcept: /root/reference/kg-builder/internal/graph/graph.go:225-265
  * isValidRelationship: graph.go:317-336; write-time guard neo4j.go:125-132;
  * empty-relation normalization llm.go:261-266.
  */
object Validity {

  /** Exact character set from graph.go:238. */
  val InvalidChars: String = "!@#$%^&*()_+={}[]|\\:;\"'<>,?/~`"

  val GenericPreds: Seq[String] = Seq("related to", "is related to", "relates to")

  /** isValidConcept name rules (the Relation rule lives in validPred):
    * non-empty, length ≥ 3, no invalid chars, and not an all-capitalized
    * multi-word (>2 words) phrase. */
  def validName(c: Column): Column = {
    val noInvalid = length(translate(c, InvalidChars, "")) === length(c)
    val words = filter(split(c, " "), w => length(w) > 0)
    val allCap = forall(words, w => substring(w, 1, 1).rlike("^[A-Z]$"))
    c.isNotNull && length(c) >= 3 && noInvalid && !(size(words) > 2 && allCap)
  }

  /** isValidRelationship + empty-relation normalization (F2/F4): predicate
    * must be non-null, non-empty, not "No relationship", not generic. */
  def validPred(c: Column): Column =
    c.isNotNull && length(trim(c)) > 0 && c =!= "No relationship" &&
      !c.isin(GenericPreds: _*) // exact match, as in the reference (graph.go:242-246)
}
