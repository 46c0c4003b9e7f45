package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ops.Hashing

/** Text-analysis operators for large-scale document pipelines: token
  * counting, shingling, quality scoring, language-ID heuristics, and
  * rolling-hash fingerprints.
  *
  * All of these are pure Catalyst `Column` expressions built from
  * higher-order array functions — no UDFs — so they stay inside
  * whole-stage codegen and scale linearly with document bytes. At 100 TB
  * the cost is one narrow map stage over the corpus; nothing here
  * shuffles.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def words(c: Column): Column = split(c, "\\s+")

  def tokenCount(c: Column): Column = size(words(c)).cast("long")

  /** k-word shingles ("w1 w2 w3" strings). Empty array when the document
    * has fewer than k tokens (guard needed: Spark `sequence(1, n)` with
    * n < 1 counts *down*, unlike DuckDB's empty `range`).
    */
  def wordShingles(ws: Column, k: Int): Column =
    when(size(ws) >= k,
      transform(sequence(lit(1), size(ws) - (k - 1)),
        i => concat_ws(" ", slice(ws, i, lit(k)))))
      .otherwise(lit(Array.empty[String]))

  /** Distinct shingle set — the unit of Jaccard/minhash dedup. */
  def shingleSet(text: Column, k: Int = 3): Column =
    array_distinct(wordShingles(words(text), k))

  /** 32-bit hash per w-token sliding window — the exact-substring-dedup
    * unit (q150/q154): text reduces to fixed-width hashes before any
    * shuffle. Same below-w guard as [[wordShingles]].
    */
  def windowHashes(ws: Column, w: Int): Column =
    when(size(ws) >= w,
      transform(sequence(lit(1), size(ws) - (w - 1)),
        i => graft.ops.Hashing.hash32(concat_ws(" ", slice(ws, i, lit(w))))))
      .otherwise(lit(Array.empty[Long]))

  /** Adjacent token pairs as `struct(a, b)` — the collocation/PMI unit
    * (q148). Guard BEFORE the transform: Spark's `sequence(1, 0)` is the
    * DESCENDING [1, 0] (unlike DuckDB's empty `range`), so a one-token
    * array would evaluate `element_at(ws, 0)` and throw under ANSI.
    */
  def adjacentPairs(ws: Column): Column =
    when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => struct(element_at(ws, i).as("a"),
          element_at(ws, (i + 1).cast("int")).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))

  /** Fraction of tokens drawn from a stopword list (quality signal). */
  def stopwordRatio(ws: Column, stop: Seq[String]): Column =
    size(filter(ws, w => w.isin(stop: _*))).cast("double") / size(ws)

  /** Mean token length (quality signal). */
  def avgWordLen(ws: Column): Column =
    aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(ws)

  /** Rolling polynomial fingerprint over characters:
    * h = fold(h*31 + codepoint) mod P. Deterministic, order-sensitive,
    * and cheap — the classic document-fingerprint primitive.
    */
  def fingerprint(c: Column): Column =
    when(length(c) > 0,
      aggregate(
        sequence(lit(1), length(c)),
        lit(0L),
        (acc, i) => (acc * 31 + ascii(c.substr(i, lit(1)))) % Hashing.P))
      .otherwise(lit(0L))

  /** Hashed-feature buckets, fastText-style: each token hashes (same
    * rolling polynomial as [[fingerprint]]) into one of `buckets`
    * feature slots. Nested higher-order functions — stays inside
    * codegen, no UDF, zero shuffle.
    */
  def hashedBuckets(ws: Column, buckets: Int): Column =
    transform(ws, w => fingerprint(w) % buckets)

  /** Linear-model raw score over hashed features with a closed-form
    * integer weight table (`w(b) = b mod 201 − 100`, i.e. −100..100
    * scaled by 1/100): exact integer arithmetic until the caller's
    * final division, so engine-exact. A production deployment swaps
    * the formula for a broadcast learned-weight array; the pipeline
    * shape (token → bucket → weight → sum) is identical.
    */
  def hashedLinearScore(bucketsCol: Column): Column =
    aggregate(bucketsCol, lit(0L), (acc, b) => acc + (b % 201 - 100))

  /** Stopword profiles for the language-ID heuristic (public common-word
    * lists, a few per language).
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for"),
    "es" -> Seq("el", "los", "y", "es", "una", "que", "en", "por"),
    "fr" -> Seq("le", "les", "et", "est", "une", "que", "dans", "pour"),
  )

  /** Stopword-profile language ID: score = stopword hits per language,
    * winner = argmax (ties broken toward the lexicographically largest
    * language code — the struct-max tiebreak, identical in the oracle).
    * The "und" (undetermined) fallback is a zero-score sentinel struct in
    * the same array: it wins exactly when every profile scores 0
    * ('und' sorts above all language codes), and the whole decision is
    * ONE array_max instead of two (the guard+value form evaluated the
    * scoring array twice — measured 2× on the langid query).
    */
  def langIdHeuristic(text: Column): Column = {
    val ws = words(lower(text))
    val scored = LangStopwords.map { case (lang, stops) =>
      struct(
        size(filter(ws, w => w.isin(stops: _*))).as("score"),
        lit(lang).as("lang"))
    } :+ struct(lit(0).as("score"), lit("und").as("lang"))
    array_max(array(scored: _*)).getField("lang")
  }
}
