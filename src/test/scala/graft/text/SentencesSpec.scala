package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Referees for the sentence boundary rules (T179). */
class SentencesSpec extends AnyFunSuite {

  test("plain boundaries: terminal run + whitespace + opener; " +
      "lowercase continuation never splits") {
    assert(Sentences.split("One fish. Two fish. Red fish?") ==
      Seq("One fish.", "Two fish.", "Red fish?"))
    assert(Sentences.split("Really?! Yes. 42 is the answer.") ==
      Seq("Really?!", "Yes.", "42 is the answer."))
    // lowercase after the dot: not a boundary (ellipsis-style prose)
    assert(Sentences.split("wait. and see. Then go.") ==
      Seq("wait. and see.", "Then go."))
    // quotes and brackets open sentences
    assert(Sentences.split("He left. \"Stay,\" she said. (Nobody did.)")
      .head == "He left.")
  }

  test("decimals, versions, and no-whitespace dots never split") {
    assert(Sentences.split("Pi is 3.14159 exactly. Spark 4.1.2 runs.") ==
      Seq("Pi is 3.14159 exactly.", "Spark 4.1.2 runs."))
    assert(Sentences.split("See example.com today. Go.") ==
      Seq("See example.com today.", "Go."))
  }

  test("abbreviation guard: honorifics and dotted initialisms") {
    assert(Sentences.split("Dr. Kim spoke. Mr. Ito listened.") ==
      Seq("Dr. Kim spoke.", "Mr. Ito listened."))
    assert(Sentences.split("Results, e.g. Table 2, agree. Done.") ==
      Seq("Results, e.g. Table 2, agree.", "Done."))
    assert(Sentences.split("The U.S. Senate met. It voted.") ==
      Seq("The U.S. Senate met.", "It voted."))
    assert(Sentences.split("See Smith et al. Nobody replied.") ==
      Seq("See Smith et al. Nobody replied."))
    // an unlisted token splits normally even when short
    assert(Sentences.split("It was a cat. Dogs barked.") ==
      Seq("It was a cat.", "Dogs barked."))
  }

  test("terminal run at end of text always closes; empty and " +
      "punctuation-free inputs degrade") {
    assert(Sentences.split("Trailing etc.") == Seq("Trailing etc."))
    assert(Sentences.split("no terminal at all") ==
      Seq("no terminal at all"))
    assert(Sentences.split("") == Seq.empty)
    assert(Sentences.split("   ") == Seq.empty)
    assert(Sentences.split("...") == Seq("..."))
  }

  test("round trip: rejoining splits with single spaces reproduces " +
      "the collapsed input on seeded multi-sentence texts") {
    for (seed <- 0 until 100) {
      val rnd = new scala.util.Random(seed)
      val sents = (0 until 1 + rnd.nextInt(6)).map { k =>
        val words = (0 until 2 + rnd.nextInt(5)).map(w =>
          s"W${seed}k${k}w$w").mkString(" ")
        words + Seq(".", "?", "!").apply(rnd.nextInt(3))
      }
      val text = sents.mkString(" ")
      val got = Sentences.split(text)
      assert(got == sents, s"seed=$seed")
      assert(got.mkString(" ") == text, s"seed=$seed")
    }
  }
}
