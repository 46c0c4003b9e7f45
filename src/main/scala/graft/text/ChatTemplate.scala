package graft.text

/** Chat-template rendering + loss-mask spans (q227, T136) — the SFT
  * half of a training-data pipeline: conversations become model input
  * only after (a) rendering through a turn template, (b) locating the
  * ASSISTANT content as token spans (the loss mask — the model trains
  * on its own side of the dialog only), and (c) truncating to the
  * context length without silently corrupting the mask. Getting (c)
  * wrong — a span surviving past the truncation point, or a clipped
  * span still counted whole — trains on garbage; this layer makes the
  * span bookkeeping exact and auditable.
  *
  * Template (a fixed, documented ChatML-class shape):
  * `<|im_start|> <role>\n<content>\n<|im_end|>` per turn, newline-
  * joined. Tokenization is the engine's whitespace convention, so a
  * turn costs `3 + |content tokens|` (start marker, role, end
  * marker). Truncation keeps the first `maxLen` tokens: spans wholly
  * past the cut DROP, spans straddling it CLIP (and are counted —
  * the audit signal that the context length is eating answers).
  * Pure functions, never throw.
  */
object ChatTemplate {

  final case class Turn(role: String, content: String)

  final case class Rendered(
      text: String,
      nTokens: Int,
      spans: Seq[(Int, Int)]) // assistant-content token spans,
                              // half-open [start, end)

  final case class Truncated(
      nKept: Int,
      spans: Seq[(Int, Int)], // post-truncation spans (clipped)
      nClipped: Int,          // spans that straddled the cut
      nTrainable: Int)        // Σ span lengths after truncation

  def render(turns: Seq[Turn]): Rendered = {
    val sb = new StringBuilder
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var tok = 0
    turns.foreach { t =>
      if (sb.nonEmpty) sb += '\n'
      sb ++= "<|im_start|> " ++= t.role += '\n'
      val words = t.content.split("\\s+").filter(_.nonEmpty)
      tok += 2 // start marker + role
      if (t.role == "assistant")
        spans += ((tok, tok + words.length))
      tok += words.length
      sb ++= t.content ++= "\n<|im_end|>"
      tok += 1 // end marker
    }
    Rendered(sb.toString, tok, spans.toSeq)
  }

  def truncate(r: Rendered, maxLen: Int): Truncated = {
    val kept = math.min(r.nTokens, maxLen)
    var clipped = 0
    val out = r.spans.flatMap { case (s, e) =>
      if (s >= kept) None // wholly past the cut: dropped
      else if (e > kept) { clipped += 1; Some((s, kept)) }
      else Some((s, e))
    }
    Truncated(kept, out, clipped, out.map { case (s, e) => e - s }.sum)
  }
}
