package graft.multimodal

/** Block-level main-content extraction (q223, T132) — the jusText /
  * boilerpipe heuristic class, the STRUCTURAL complement to the
  * corpus-frequency boilerplate tier (T113/q204): T113 needs many
  * documents per source to vote a line out; this classifies a SINGLE
  * page's blocks from their own shape. Production pipelines run both
  * (structure first, frequency across the corpus after).
  *
  * Features per block (from the T118 scanner's [[Html.Block]]s):
  * link density = anchor chars / non-whitespace chars, stopword
  * density = stopword tokens / tokens, text length. Rules (the
  * jusText context-free pass, simplified to a documented fixed
  * parameterization):
  *
  *  - link density > 1/3            → BAD (navigation shape)
  *  - length ≥ 40 and stopword
  *    density ≥ 0.25                → GOOD (prose shape)
  *  - length < 15                   → BAD (fragment)
  *  - otherwise                     → undecided
  *
  * then the context pass: an undecided block is PROMOTED to good iff
  * an adjacent block is context-free good (jusText's neighbor
  * adoption, one step — headers and date lines hugging real prose
  * survive; short strings stranded between nav blocks die).
  *
  * Densities are per-row doubles (deterministic — no aggregation);
  * the classifier emits labels and the assembled content text, never
  * floats.
  */
object ContentExtract {

  /** A compact English function-word set — the stopword-density
    * feature only needs "does this read like prose", not a lexicon;
    * swap per-language sets in at deployment (the T89 language-ID
    * tier chooses which).
    */
  val Stopwords: Set[String] = Set(
    "the", "a", "an", "and", "or", "of", "to", "in", "it", "is",
    "was", "for", "on", "with", "as", "at", "by", "from", "that",
    "this", "be", "are", "were", "near", "over", "then", "while",
    "but", "not", "have", "has", "had", "its", "his", "her", "they",
    "we", "you", "i", "he", "she", "will", "would", "can", "could")

  final case class Classified(
      text: String,
      linkChars: Int,
      cls: String) // "good" | "bad" | "promoted"

  private def contextFree(b: Html.Block): String = {
    val nonWs = b.text.count(!Character.isWhitespace(_))
    val linkDensity =
      if (nonWs == 0) 0.0 else b.linkChars.toDouble / nonWs
    if (linkDensity > 1.0 / 3) "bad"
    else {
      val words = b.text.split("\\s+").filter(_.nonEmpty)
      val sd = if (words.isEmpty) 0.0
      else words.count(w => Stopwords(w.toLowerCase)).toDouble /
        words.length
      if (b.text.length >= 40 && sd >= 0.25) "good"
      else if (b.text.length < 15) "bad"
      else "undecided"
    }
  }

  def classify(blocks: Seq[Html.Block]): Seq[Classified] = {
    val ctx = blocks.map(contextFree)
    blocks.indices.map { i =>
      val cls = ctx(i) match {
        case "undecided" =>
          val adjGood = (i > 0 && ctx(i - 1) == "good") ||
            (i + 1 < ctx.length && ctx(i + 1) == "good")
          if (adjGood) "promoted" else "bad"
        case c => c
      }
      Classified(blocks(i).text, blocks(i).linkChars, cls)
    }
  }

  /** The extracted main content: good + promoted blocks in order. */
  def contentText(blocks: Seq[Html.Block]): String =
    classify(blocks).filter(c => c.cls != "bad").map(_.text)
      .mkString("\n")
}
