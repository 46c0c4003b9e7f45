package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Referees for chat-template rendering + loss-mask spans (q227,
  * T136): span arithmetic against a hand-tokenized rendering, the
  * truncation drop/clip rules, and the invariant that spans index
  * exactly the assistant content tokens.
  */
class ChatTemplateSpec extends AnyFunSuite {

  import ChatTemplate.{Turn, render, truncate}

  private val convo = Seq(
    Turn("system", "be brief"), // 2 + 2 + 1 = 5 tokens (0-4)
    Turn("user", "what is spark"), // 3 + 3 = 6 tokens (5-10)
    Turn("assistant", "a distributed engine"), // content at 13..15
    Turn("user", "thanks"),
    Turn("assistant", "you are welcome and good luck")) // at 23..28

  test("render: token counts and spans match a hand tokenization") {
    val r = render(convo)
    // verify against the actual whitespace tokenization of the text
    val toks = r.text.split("\\s+").filter(_.nonEmpty)
    assert(toks.length == r.nTokens)
    assert(r.nTokens == 5 + 6 + 6 + 4 + 9)
    assert(r.spans == Seq((13, 16), (23, 29)))
    // the spans index exactly the assistant content tokens
    assert(toks.slice(13, 16).toSeq ==
      Seq("a", "distributed", "engine"))
    assert(toks.slice(23, 29).toSeq ==
      Seq("you", "are", "welcome", "and", "good", "luck"))
    // template structure: marker + role first, end marker last
    assert(toks(0) == "<|im_start|>" && toks(1) == "system")
    assert(toks(4) == "<|im_end|>")
  }

  test("truncate: whole spans drop, straddling spans clip and count") {
    val r = render(convo)
    val full = truncate(r, 1000)
    assert(full.nKept == r.nTokens && full.nClipped == 0)
    assert(full.nTrainable == 3 + 6)
    val clip = truncate(r, 25) // cuts inside the second span
    assert(clip.nKept == 25 && clip.nClipped == 1)
    assert(clip.spans == Seq((13, 16), (23, 25)))
    assert(clip.nTrainable == 3 + 2)
    val drop = truncate(r, 20) // second span wholly past the cut
    assert(drop.spans == Seq((13, 16)) && drop.nClipped == 0)
    assert(drop.nTrainable == 3)
    val cut13 = truncate(r, 13) // cut lands ON a span start: drops
    assert(cut13.spans.isEmpty && cut13.nClipped == 0)
    val empty = truncate(render(Nil), 10)
    assert(empty.nKept == 0 && empty.spans.isEmpty)
  }
}
