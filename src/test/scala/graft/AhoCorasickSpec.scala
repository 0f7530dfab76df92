package graft

import graft.extract.AhoCorasick
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class AhoCorasickSpec extends AnyFunSuite {

  test("finds all word-boundary matches incl. contained names") {
    val ac = AhoCorasick(Seq("Neural Networks", "Convolutional Neural Networks", "AI"))
    val hits = ac.findAll("Convolutional Neural Networks extend Neural Networks in AI.")
    assert(hits.map(_.surface) ==
      Vector("Convolutional Neural Networks", "Neural Networks", "Neural Networks", "AI"))
  }

  test("leftmost-longest resolves containment") {
    val ac = AhoCorasick(Seq("Neural Networks", "Convolutional Neural Networks"))
    val ll = ac.leftmostLongest("Convolutional Neural Networks are nets.")
    assert(ll.map(_.surface) == Vector("Convolutional Neural Networks"))
  }

  test("word boundary blocks partial-word hits") {
    val ac = AhoCorasick(Seq("AI", "Data"))
    assert(ac.findAll("said Datafication").isEmpty)
    assert(ac.findAll("the AI (Data) era").map(_.surface) == Vector("AI", "Data"))
  }

  test("contains is exact-membership") {
    val ac = AhoCorasick(Seq("Data Mining", "Data"))
    assert(ac.contains("Data Mining") && ac.contains("Data") && !ac.contains("Mining"))
  }

  /** Naive reference matcher for the property check. */
  private def naive(pats: Seq[String], text: String): Set[(Int, Int, String)] = {
    def isW(c: Char) = Character.isLetterOrDigit(c)
    (for {
      p <- pats.distinct if p.nonEmpty
      i <- 0 to (text.length - p.length)
      if text.regionMatches(i, p, 0, p.length)
      if i == 0 || !isW(text.charAt(i - 1))
      if i + p.length == text.length || !isW(text.charAt(i + p.length))
    } yield (i, i + p.length, p)).toSet
  }

  test("findAll agrees with naive matcher on random inputs") {
    val word = Gen.choose(1, 4).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'A', 'B')))
    val pat = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val gen = for {
      pats <- Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, pat))
      words <- Gen.choose(0, 12).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(word, Gen.oneOf(pats))))
    } yield (pats, words.mkString(" ") + ".")
    for ((pats, text) <- Check.samples(gen, 200)) {
      val ac = AhoCorasick(pats)
      assert(ac.findAll(text).map(h => (h.start, h.end, h.surface)).toSet ==
        naive(pats, text), s"pats=$pats text='$text'")
    }
  }
}

/** Seeded scalacheck sampling (no scalatestplus bridge in this sandbox). */
object Check {
  def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
}
