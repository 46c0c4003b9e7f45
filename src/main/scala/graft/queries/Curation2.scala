package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Common._
import graft.dedup.Dedup
import graft.ops.Hashing
import graft.text.TextFunctions._

/** Round-7 curation wave (SURVEY §2.7 T75–T79): deterministic
  * stratified splitting, asymmetric containment detection, a bigram LM
  * on the engine-exact logarithm, temperature-scaled mixture weights,
  * and a waterfill token-budget allocator.
  *
  * Determinism discipline inherited from round 7's structural fixes:
  * every emitted value is either an exact integer, an exact-integer-
  * derived double through correctly-rounded IEEE ops (cast + one
  * division, or sqrt — all identical across engines), or a
  * FixedLog.lnLat12 lattice point. The DeterminismGateSpec plan-walk
  * holds for the whole file by construction.
  */
object Curation2 {

  private val sqlWords = """regexp_split_to_array(text, '\s+')"""

  /** DuckDB twin of Hashing.hash32 over an expression. */
  private def sqlHash32(e: String) =
    s"CAST('0x' || substr(md5($e), 1, 8) AS BIGINT)"

  val qs: Seq[Q] = Seq(
    Q("q163_stratified_split",
      "deterministic stratified train/val/test split audit: every doc " +
        "hashes to a split (80/10/10) from a salted doc-id digest — " +
        "reproducible across runs, engines, and partitionings, no RNG " +
        "state — and the audit grid counts docs and token mass per " +
        "(source, length-bucket, split) cell, the table a data-mixing " +
        "decision actually reads. Narrow map + one grid-sized " +
        "aggregation: shuffle rows = cells, never docs",
      Some(s"""WITH d AS (SELECT doc_id, source,
            len($sqlWords) AS nt,
            ${sqlHash32("'sp:' || CAST(doc_id AS VARCHAR)")} % 100 AS h
          FROM documents),
        cells AS (SELECT source,
            CAST(least(nt // 32, 7) AS BIGINT) AS len_bucket,
            CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
                 ELSE 'test' END AS split,
            nt FROM d)
        SELECT source, len_bucket, split,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(nt) AS BIGINT) AS n_tokens
        FROM cells GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""),
      (s, d) => {
        val nt = size(words(col("text"))).cast("long")
        val h = Hashing.hash32(
          concat(lit("sp:"), col("doc_id").cast("string"))) % 100
        table(s, d, "documents")
          .select(col("source"),
            least(expr("size(split(text, '\\\\s+')) div 32"), lit(7))
              .cast("long").as("len_bucket"),
            when(h < 80, "train").when(h < 90, "val").otherwise("test")
              .as("split"),
            nt.as("nt"))
          .groupBy("source", "len_bucket", "split")
          .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
          .orderBy("source", "len_bucket", "split")
      }),

    Q("q164_containment_pairs",
      "asymmetric near-superset detection (quote/excerpt mining): " +
        "shingle CONTAINMENT |A∩B|/min(|A|,|B|) ≥ 0.5 — Jaccard-tuned " +
        "MinHash-LSH structurally MISSES a short doc embedded in a " +
        "long one (the union dominates, signatures diverge; the spec " +
        "plants exactly that case), so candidates come from a " +
        "GUARANTEED-RECALL overlap join instead: every doc probes with " +
        "its ⌊n/2⌋+1 smallest shingle hashes against the full " +
        "inverted index (prefix-filter lemma: overlap ≥ ⌈min/2⌉ " +
        "forces a shared element inside the smaller side's prefix), " +
        "then exact verification scores candidates only. The oracle " +
        "is an honest ALL-PAIRS brute force — the hash match IS the " +
        "recall proof. Shuffle = shingle-hash rows (id, 8-byte hash), " +
        "text never moves; the ≥ 0.5 threshold tests by exact integer " +
        "cross-multiplication",
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
        // The working set is HASHED shingle sets (8-byte longs — the
        // declared containment unit; a 32-bit collision perturbs both
        // engines identically, the q150 window-hash discipline), so
        // the one materialized frame is long-arrays, not strings.
        // localCheckpoint because FOUR consumers read it (index, probe
        // prefix, both verify joins) and column pruning pushes
        // differing projections below a repartition — plain
        // ReuseExchange is unavailable (measured: 4 corpus scans
        // without, 1 with — the q150 window-frame pattern).
        val hashes = Dedup.shingleFrame(table(s, d, "documents"),
            "doc_id", "text")
          .select(col("doc_id"), graft.functions.Hash32Arr
            .sortedDistinct(s, col("sh")).as("hs"))
          .localCheckpoint()
        // full inverted index (id, hash) — the honest floor, same row
        // class as q150's window hashes
        val idx = hashes.select(col("doc_id").as("i_id"),
          explode(col("hs")).as("h"))
        // probe side: the ⌊n/2⌋+1 smallest hashes per doc
        val pre = hashes.select(col("doc_id").as("p_id"),
          explode(expr("slice(hs, 1, size(hs) div 2 + 1)")).as("h"))
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

    Q("q165_bigram_logprob",
      "bigram-LM quality score on the engine-exact logarithm: add-one " +
        "P(w2|w1) = (c12+1)/(c1+V) fit on the train split (doc_id%10≠0)" +
        ", eval docs scored by avg bigram log-prob. The lnLat12 fold " +
        "runs on the DISTINCT (c12, c1) count-pair frame (bounded by " +
        "distinct count values², not by tokens) and broadcast-joins " +
        "back; sums are associative integer lattice addition",
      Some("""WITH w AS (SELECT doc_id,
            regexp_split_to_array(text, '\s+') AS ws FROM documents),
        bg AS (SELECT doc_id,
            unnest(list_transform(range(1, len(ws)),
              i -> [ws[CAST(i AS INT)], ws[CAST(i + 1 AS INT)]])) AS pr
          FROM w),
        b2 AS (SELECT doc_id, pr[1] AS w1, pr[2] AS w2 FROM bg
          WHERE length(pr[1]) > 0 AND length(pr[2]) > 0),
        c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM b2
          WHERE doc_id % 10 <> 0 GROUP BY 1, 2),
        c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM b2
          WHERE doc_id % 10 <> 0 GROUP BY 1),
        vv AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM (
          SELECT unnest(ws) AS w FROM w WHERE doc_id % 10 <> 0) u
          WHERE length(w) > 0),
        ev AS (SELECT e.doc_id,
            """ + graft.functions.FixedLog.lnLat12Sql(
              "COALESCE(c12.c12, 0) + 1",
              "COALESCE(c1.c1, 0) + vv.v") + """ AS lp
          FROM b2 e
          LEFT JOIN c12 ON e.w1 = c12.w1 AND e.w2 = c12.w2
          LEFT JOIN c1 ON e.w1 = c1.w1
          CROSS JOIN vv WHERE e.doc_id % 10 = 0)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
          CAST(SUM(lp) AS DOUBLE) /
            CAST(COUNT(*) * 1000000000000 AS DOUBLE) AS avg_logprob
        FROM ev GROUP BY doc_id ORDER BY doc_id"""),
      (s, d) => {
        val w = table(s, d, "documents")
          .select(col("doc_id"), words(col("text")).as("ws"))
        val b2 = w.select(col("doc_id"),
            explode(graft.text.TextFunctions.adjacentPairs(col("ws")))
              .as("p"))
          .filter(length(col("p.a")) > 0 && length(col("p.b")) > 0)
          .select(col("doc_id"), col("p.a").as("w1"), col("p.b").as("w2"))
        val train = b2.filter(col("doc_id") % 10 =!= 0)
        val c12 = train.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val c1 = train.groupBy("w1").agg(count(lit(1)).as("c1"))
        val vv = w.filter(col("doc_id") % 10 =!= 0)
          .select(explode(col("ws")).as("wd"))
          .filter(length(col("wd")) > 0)
          .agg(countDistinct("wd").as("v"))
        val ev = b2.filter(col("doc_id") % 10 === 0)
          .join(c12, Seq("w1", "w2"), "left")
          .join(c1, Seq("w1"), "left")
          .crossJoin(broadcast(vv))
          .select(col("doc_id"),
            (coalesce(col("c12"), lit(0L)) + 1).as("num"),
            (coalesce(col("c1"), lit(0L)) + col("v")).as("den"))
        // lnLat on the distinct count-pair frame only, broadcast back
        val lp = ev.select(col("num"), col("den")).distinct()
          .select(col("num").as("lnum"), col("den").as("lden"),
            graft.functions.FixedLog.lnLat12(col("num"), col("den"))
              .as("lp"))
        ev.join(broadcast(lp),
            col("num") === col("lnum") && col("den") === col("lden"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("slp"))
          .select(col("doc_id"), col("n_bigrams"),
            (col("slp").cast("double") /
              (col("n_bigrams") * lit(1000000000000L)).cast("double"))
              .as("avg_logprob"))
          .orderBy("doc_id")
      }),

    Q("q166_temperature_mix",
      "temperature-scaled mixture weights (α = 0.5): per-source " +
        "sampling shares ∝ √tokens — the standard multilingual/" +
        "multi-source rebalancing — plus a largest-remainder integer " +
        "allocation of a 1M-doc budget that sums EXACTLY to the " +
        "budget. √ is correctly-rounded IEEE (engine-identical); " +
        "weights land on the integer lattice via floor, so shares and " +
        "allocations are exact-integer-derived",
      Some(s"""WITH t AS (SELECT source,
            CAST(SUM(len($sqlWords)) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source),
        wl AS (SELECT source, n_tokens,
            CAST(floor(sqrt(CAST(n_tokens * 1000000 AS DOUBLE))) AS BIGINT)
              AS wlat FROM t),
        tot AS (SELECT CAST(SUM(wlat) AS BIGINT) AS sw FROM wl),
        base AS (SELECT source, n_tokens, wlat,
            CAST(wlat AS DOUBLE) / sw AS share,
            (1000000 * wlat) // sw AS alloc0,
            (1000000 * wlat) % sw AS rem
          FROM wl CROSS JOIN tot),
        r AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source)
            AS BIGINT) AS rr,
            1000000 - CAST(SUM(alloc0) OVER () AS BIGINT) AS short
          FROM base)
        SELECT source, n_tokens, wlat, share,
          CAST(alloc0 + CASE WHEN rr <= short THEN 1 ELSE 0 END AS BIGINT)
            AS alloc
        FROM r ORDER BY source"""),
      (s, d) => {
        // the grid is sources-sized (≤ dozens): the windows below run
        // on a bounded frame, never on the corpus
        val t = table(s, d, "documents")
          .select(col("source"), size(words(col("text"))).cast("long")
            .as("nt"))
          .groupBy("source").agg(sum(col("nt")).as("n_tokens"))
        val wl = t.select(col("source"), col("n_tokens"),
          floor(sqrt((col("n_tokens") * lit(1000000L)).cast("double")))
            .cast("long").as("wlat"))
        val tot = wl.agg(sum(col("wlat")).as("sw"))
        val base = wl.crossJoin(broadcast(tot))
          .select(col("source"), col("n_tokens"), col("wlat"),
            (col("wlat").cast("double") / col("sw").cast("double"))
              .as("share"),
            expr("(1000000 * wlat) DIV sw").as("alloc0"),
            expr("(1000000 * wlat) % sw").as("rem"))
        val r = base
          .withColumn("rr", row_number().over(
            Window.orderBy(col("rem").desc, col("source"))).cast("long"))
          .withColumn("short", lit(1000000L) - sum(col("alloc0")).over(
            Window.partitionBy()))
        r.select(col("source"), col("n_tokens"), col("wlat"), col("share"),
            (col("alloc0") + when(col("rr") <= col("short"), 1L)
              .otherwise(0L)).cast("long").as("alloc"))
          .orderBy("source")
      }),

    Q("q167_token_budget",
      "waterfill token-budget allocation (the Chinchilla-style " +
        "repeat-averse split): budget B = ⌊total/3⌋ tokens spread as " +
        "evenly as sources allow, capping at each source's " +
        "availability and re-levelling the excess — the unique L with " +
        "Σ min(avail, L) = B, found in ONE window pass over the " +
        "sources frame (prefix sums over avail ascending), allocations " +
        "exact integers summing to B (remainder to the lowest-avail " +
        "uncapped sources)",
      Some(s"""WITH t AS (SELECT source,
            CAST(SUM(len($sqlWords)) AS BIGINT) AS avail
          FROM documents GROUP BY source),
        tot AS (SELECT CAST(SUM(avail) AS BIGINT) // 3 AS b,
            CAST(COUNT(*) AS BIGINT) AS k FROM t),
        o AS (SELECT source, avail, b, k,
            CAST(ROW_NUMBER() OVER (ORDER BY avail, source) AS BIGINT) AS i,
            CAST(SUM(avail) OVER (ORDER BY avail, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS cum
          FROM t CROSS JOIN tot),
        f AS (SELECT *, (b - (cum - avail)) // (k - i + 1) AS lvl,
            (b - (cum - avail)) % (k - i + 1) AS xtra
          FROM o),
        pick AS (SELECT MIN(i) AS istar FROM f
          WHERE avail >= lvl + CASE WHEN xtra > 0 THEN 1 ELSE 0 END),
        lv AS (SELECT f.b, f.k, f.i AS istar, f.cum - f.avail AS cumbefore,
            (f.b - (f.cum - f.avail)) // (f.k - f.i + 1) AS lvl,
            (f.b - (f.cum - f.avail)) % (f.k - f.i + 1) AS extra
          FROM f JOIN pick ON f.i = pick.istar)
        SELECT o.source, o.avail,
          CAST(CASE WHEN o.i < lv.istar THEN o.avail
            WHEN o.i < lv.istar + lv.extra THEN lv.lvl + 1
            ELSE lv.lvl END AS BIGINT) AS alloc,
          o.i < lv.istar AS capped
        FROM o CROSS JOIN lv ORDER BY o.source"""),
      (s, d) => {
        val t = table(s, d, "documents")
          .select(col("source"), size(words(col("text"))).cast("long")
            .as("nt"))
          .groupBy("source").agg(sum(col("nt")).as("avail"))
        val tot = t.agg(expr("CAST(sum(avail) DIV 3 AS LONG)").as("b"),
          count(lit(1)).as("k"))
        val o = t.crossJoin(broadcast(tot))
          .withColumn("i", row_number().over(
            Window.orderBy(col("avail"), col("source"))).cast("long"))
          .withColumn("cum", sum(col("avail")).over(
            Window.orderBy(col("avail"), col("source"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        // istar predicate (round 8, ADVICE-r7): when the remainder is
        // non-zero the lowest-avail uncapped rows receive lvl+1, so a
        // row with avail == lvl exactly must stay CAPPED in that case
        // (avails {3,19}, B=7: istar must be the 19, allocs {3,4}) —
        // requiring avail ≥ lvl+1 whenever extra > 0 keeps alloc ≤
        // avail on every instance, not just the ones the hash gate saw
        val f = o.withColumn("lvl",
            expr("(b - (cum - avail)) DIV (k - i + 1)"))
          .withColumn("xtra", expr("(b - (cum - avail)) % (k - i + 1)"))
        val pick = f.filter(col("avail") >=
            col("lvl") + when(col("xtra") > 0, 1L).otherwise(0L))
          .agg(min(col("i")).as("istar"))
        val lv = f.join(broadcast(pick), col("i") === col("istar"))
          .select(col("istar"),
            expr("(b - (cum - avail)) DIV (k - i + 1)").as("lvl"),
            expr("(b - (cum - avail)) % (k - i + 1)").as("extra"))
        o.crossJoin(broadcast(lv))
          .select(col("source"), col("avail"),
            when(col("i") < col("istar"), col("avail"))
              .when(col("i") < col("istar") + col("extra"),
                col("lvl") + 1)
              .otherwise(col("lvl")).cast("long").as("alloc"),
            (col("i") < col("istar")).as("capped"))
          .orderBy("source")
      })
  )
}
