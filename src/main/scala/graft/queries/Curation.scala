package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Common._
import graft.ops.Hashing
import graft.text.TextFunctions._

/** Round-6 curation wave (SURVEY §2.7 T59–T63): data-driven domain
  * selection (DSIR), exact substring-level dedup (the Lee et al. 2021
  * "Deduplicating Training Data" shape), a deterministic spectral
  * projection for diversity mining, snapshot-precedence dedup, and a
  * classifier calibration sweep on the RunningTotal operator.
  *
  * Scale discipline shared by the file: model/feature tables are
  * bounded (1024 buckets, 64 dims, one row per distinct score) and
  * broadcast; the corpus is only ever scanned by narrow maps or
  * shuffled as fixed-width hashes — never as text or vectors.
  */
object Curation {

  private val B = 1024 // hashed-feature buckets (DSIR + classifier)
  private val W = 8    // substring-dedup window, in tokens

  val qs: Seq[Q] = Seq(
    Q("q149_dsir_weights",
      "DSIR-style importance weights: hashed-unigram LMs (1024 buckets) " +
        "fit on the target domain (lang=en) and on the raw pool; each " +
        "doc scores avg log(p_target/p_raw) over its token buckets — " +
        "the data-selection primitive behind importance resampling",
      Some(s"""WITH tok AS (SELECT doc_id, lang,
            CAST('0x' || substr(md5('b:' || w), 1, 8) AS BIGINT) % $B AS b
          FROM (SELECT doc_id, lang,
              unnest(regexp_split_to_array(text, '\\s+')) AS w
            FROM documents)),
        ct AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM tok
          WHERE lang = 'en' GROUP BY b),
        cr AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM tok GROUP BY b),
        tot AS (SELECT
            CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
            CAST(COUNT(*) AS BIGINT) AS nr FROM tok),
        lr AS (SELECT cr.b,
            CAST(ln((CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE)
                     * CAST(t.nr + $B AS DOUBLE)) /
                    (CAST(cr.cr + 1 AS DOUBLE)
                     * CAST(t.nt + $B AS DOUBLE)))
              AS DECIMAL(30,12)) AS lr
          FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN tot t)
        SELECT doc_id, COUNT(*) AS n_tokens,
          CAST(SUM(l.lr) AS DOUBLE) / COUNT(*) AS dsir_weight
        FROM tok JOIN lr l ON tok.b = l.b
        GROUP BY doc_id ORDER BY dsir_weight DESC, doc_id LIMIT 50"""),
      (s, d) => {
        // Importance resampling needs two n-gram LMs over the SAME
        // hashed feature space (Xie et al., DSIR). Both count tables
        // partial-aggregate map-side to ≤1024 rows — at 100 TB the
        // feature model is still one broadcast; only per-doc partial
        // sums shuffle. Determinism: the log-ratio is ONE ln() of an
        // exactly-computed rational (integer counts, products < 2^53
        // at this scale — the 100 TB variant moves the products onto
        // a decimal lattice first), rounded to DECIMAL(30,12) before
        // the associative decimal sum, same discipline as q100; the
        // final avg is a single IEEE division, identical cross-engine.
        val tok = table(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            explode(words(col("text"))).as("w"))
          .select(col("doc_id"), col("lang"),
            (hash32(concat(lit("b:"), col("w"))) % B).as("b"))
        val ct = tok.filter(col("lang") === "en")
          .groupBy("b").agg(count(lit(1)).as("ct"))
        val cr = tok.groupBy("b").agg(count(lit(1)).as("cr"))
        val tot = tok.agg(
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt"),
          count(lit(1)).as("nr"))
        val lr = cr.join(ct, Seq("b"), "left")
          .crossJoin(broadcast(tot))
          .select(col("b"),
            log(((coalesce(col("ct"), lit(0L)) + 1).cast("double")
                  * (col("nr") + B).cast("double")) /
                ((col("cr") + 1).cast("double")
                  * (col("nt") + B).cast("double")))
              .cast("decimal(30,12)").as("lr"))
        tok.join(broadcast(lr), Seq("b"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum(col("lr")).as("slr"))
          .select(col("doc_id"), col("n_tokens"),
            (col("slr").cast("double") / col("n_tokens")).as("dsir_weight"))
          .orderBy(col("dsir_weight").desc, col("doc_id")).limit(50)
      }),

    Q("q150_substring_dedup",
      s"exact substring-level dedup: every $W-token sliding window " +
        "rolls to a 32-bit hash; windows whose hash occurs in >1 " +
        "distinct doc mark duplicated spans — per-doc duplicated-window " +
        "counts for the 100 most contaminated docs",
      Some(s"""WITH t AS (SELECT doc_id,
            regexp_split_to_array(text, '\\s+') AS ws FROM documents),
        tt AS (SELECT doc_id, ws, len(ws) AS n FROM t WHERE len(ws) >= $W),
        w AS (SELECT doc_id,
            CAST('0x' || substr(md5(array_to_string(
              ws[CAST(i AS INT):CAST(i + ${W - 1} AS INT)], ' ')), 1, 8)
              AS BIGINT) AS wh
          FROM tt, LATERAL (SELECT unnest(generate_series(1, n - ${W - 1}))
            AS i) g),
        dup AS (SELECT wh FROM w GROUP BY wh
          HAVING COUNT(DISTINCT doc_id) > 1),
        pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup
          FROM w JOIN dup USING (wh) GROUP BY doc_id)
        SELECT tt.doc_id, CAST(tt.n - ${W - 1} AS BIGINT) AS n_windows,
          pd.n_dup
        FROM tt JOIN pd USING (doc_id)
        ORDER BY n_dup DESC, doc_id LIMIT 100"""),
      (s, d) => {
        // The suffix-array-free version of Lee et al.'s exact substring
        // dedup: the honest cost floor is one row PER TOKEN POSITION,
        // but that row is an 8-byte hash — text never shuffles, and the
        // window generation is a narrow codegen'd map (sequence →
        // slice → concat_ws → md5). The two shuffles (hash groupBy +
        // semi-join back) are both on that fixed-width column; at
        // 100 TB the groupBy partial-aggregates repeated windows
        // map-side and a Bloom gate (q107's operator) can pre-filter
        // the semi-join probe.
        val t = table(s, d, "documents")
          .select(col("doc_id"), words(col("text")).as("ws"))
          .filter(size(col("ws")) >= W)
        val wins = t.select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("ws")) - (W - 1)),
            i => hash32(concat_ws(" ", slice(col("ws"), i, lit(W))))))
            .as("wh"))
        val dup = wins.groupBy("wh")
          .agg(countDistinct("doc_id").as("nd"))
          .filter(col("nd") > 1).select("wh")
        val perDoc = wins.join(dup, Seq("wh"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
        t.select(col("doc_id"),
            (size(col("ws")) - (W - 1)).cast("long").as("n_windows"))
          .join(perDoc, Seq("doc_id"))
          .orderBy(col("n_dup").desc, col("doc_id")).limit(100)
      }),

    Q("q151_principal_projection",
      "top principal direction by unrolled power iteration on the " +
        "integer lattice (Gram matrix → 2 exact matvec rounds → " +
        "per-vector projection): the deterministic PCA step behind " +
        "spectral diversity mining — 20 most extreme vectors",
      Some("""WITH v AS (SELECT vec_id, label,
            CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        p AS (SELECT i.i AS di, j.j AS dj,
            CAST(round(e[CAST(i.i + 1 AS INT)] * e[CAST(j.j + 1 AS INT)]
              * 1000000000000.0) AS BIGINT) AS p
          FROM v, range(0, 64) i(i), range(0, 64) j(j) WHERE j.j >= i.i),
        gut AS (SELECT di, dj, CAST(SUM(p) AS BIGINT) AS glat
          FROM p GROUP BY di, dj),
        g2 AS (SELECT di, dj,
            CAST(round(CAST(glat AS DOUBLE) / 1000000.0) AS BIGINT) AS g
          FROM gut),
        gf AS (SELECT di, dj, g FROM g2
          UNION ALL SELECT dj AS di, di AS dj, g FROM g2 WHERE di <> dj),
        v1 AS (SELECT di AS i, CAST(SUM(g) AS BIGINT) AS x1
          FROM gf GROUP BY di),
        v2 AS (SELECT gf.di AS i,
            CAST(SUM(CAST(gf.g AS HUGEINT) * v1.x1) AS HUGEINT) AS x2
          FROM gf JOIN v1 ON gf.dj = v1.i GROUP BY gf.di),
        proj AS (SELECT v.vec_id, v.label,
            CAST(SUM(CAST(CAST(round(e[CAST(dm.i + 1 AS INT)]
              * 1000000.0) AS BIGINT) AS HUGEINT) * v2.x2)
              AS DECIMAL(38,0)) AS proj
          FROM v, range(0, 64) dm(i) JOIN v2 ON dm.i = v2.i
          GROUP BY v.vec_id, v.label)
        SELECT vec_id, label, proj FROM proj
        ORDER BY abs(proj) DESC, vec_id LIMIT 20"""),
      (s, d) => {
        // Power iteration without a driver: the Gram pass is the ONE
        // corpus-sized job (GramMatrixAgg — a single ~16 KB state row
        // per map partition, q142's flat-shuffle story); both matvec
        // rounds run on the 64×64 lattice frame and every later join
        // side is broadcast-bounded (≤4096 rows). The iteration stays
        // on integers end to end — Gram entries rescaled to the 1e-6
        // lattice (one exact double division + half-away round, both
        // engines identical), matvecs in DECIMAL(38,0) — so the
        // projection is engine-exact with NO transcendental anywhere,
        // the same trick as q143's integer PageRank. Two rounds of
        // G·1 suffice for a selection direction (documented, like
        // q144's unrolled BPE rounds); more rounds would renormalize
        // on the lattice between steps. The per-vector projection is
        // a zero-shuffle narrow fold: v2 rides in as ONE broadcast
        // array row, zip_with/aggregate keep it inside codegen.
        val v = table(s, d, "embeddings")
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("e"))
        val gm = v
          .agg(graft.functions.GramMatrixAgg.gram(s, col("e"), 64).as("gm"))
          .select(explode(col("gm.g")).as("x"))
          .select(col("x.di").as("di"), col("x.dj").as("dj"),
            round(col("x.s").cast("double") / 1e6).cast("long").as("g"))
        val gf = gm.union(gm.filter(col("di") =!= col("dj"))
          .select(col("dj").as("di"), col("di").as("dj"), col("g")))
        val v1 = gf.groupBy("di").agg(sum(col("g")).as("x1"))
          .select(col("di").as("j"), col("x1"))
        val v2 = gf.join(broadcast(v1), col("dj") === col("j"))
          .groupBy("di")
          .agg(sum(col("g").cast(DecimalType(38, 0)) * col("x1")).as("x2"))
        // v2 as one ordered array row (64 entries — bounded by dims)
        val v2arr = v2
          .agg(array_sort(collect_list(struct(col("di"), col("x2")))).as("sx"))
          .select(transform(col("sx"), x => x.getField("x2")).as("pc"))
        v.crossJoin(broadcast(v2arr))
          .select(col("vec_id"), col("label"),
            aggregate(
              zip_with(
                transform(col("e"),
                  x => round(x * 1e6).cast(DecimalType(38, 0))),
                col("pc"), (a, b) => a * b),
              lit(0).cast(DecimalType(38, 0)),
              (acc, x) => (acc + x).cast(DecimalType(38, 0)))
              .as("proj"))
          .orderBy(abs(col("proj")).desc, col("vec_id")).limit(20)
      }),

    Q("q152_precedence_dedup",
      "snapshot-precedence dedup: docs sharing an 8-token prefix digest " +
        "collapse to the copy from the lowest-indexed source (earliest " +
        "snapshot wins, doc_id tiebreak); output = survivorship matrix " +
        "kept_source × dropped_source",
      Some("""WITH g AS (SELECT doc_id, source,
            CAST(substr(source, 4) AS INT) AS prio,
            md5(array_to_string(
              regexp_split_to_array(text, '\s+')[1:8], ' ')) AS dg
          FROM documents),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY dg
            ORDER BY prio, doc_id) AS rn FROM g),
        k AS (SELECT dg, source AS kept_source FROM r WHERE rn = 1)
        SELECT k.kept_source, r.source AS dropped_source,
          CAST(COUNT(*) AS BIGINT) AS n_dropped
        FROM r JOIN k ON r.dg = k.dg WHERE r.rn > 1
        GROUP BY 1, 2 ORDER BY 1, 2"""),
      (s, d) => {
        // The CommonCrawl-style cross-snapshot rule: content seen in an
        // earlier dump wins; later copies drop, and the survivorship
        // matrix is the audit artifact (which snapshot pairs actually
        // collide). One shuffle on the 16-byte digest; the row_number
        // tier is the same partitioned-top-1 shape the TopK strategy
        // heaps — no per-group sort materializes the full groups.
        val g = table(s, d, "documents")
          .select(col("doc_id"), col("source"),
            substring(col("source"), 4, 10).cast("int").as("prio"),
            md5(encode(concat_ws(" ", slice(words(col("text")), 1, 8)),
              "UTF-8")).as("dg"))
        val r = g.withColumn("rn", row_number().over(
          Window.partitionBy("dg").orderBy(col("prio"), col("doc_id"))))
        val k = r.filter(col("rn") === 1)
          .select(col("dg"), col("source").as("kept_source"))
        r.filter(col("rn") > 1)
          .select(col("dg"), col("source").as("dropped_source"))
          .join(k, Seq("dg"))
          .groupBy("kept_source", "dropped_source")
          .agg(count(lit(1)).as("n_dropped"))
          .orderBy("kept_source", "dropped_source")
      }),

    Q("q153_roc_sweep",
      "classifier calibration sweep: q131's hashed linear scorer vs " +
        "the lang=en weak label — per-distinct-score cumulative TP/FP " +
        "(a full ROC/PR curve in one pass) via the global RunningTotal " +
        "operator",
      Some(s"""WITH toks AS (SELECT doc_id, lang,
            regexp_split_to_array(text, '\\s+') AS ws FROM documents),
        w AS (SELECT doc_id, lang,
            list_transform(ws, t ->
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(1, length(t)+1),
                  i -> CAST(ascii(substr(t, CAST(i AS INT), 1)) AS BIGINT))),
                (a, b) -> (a*31 + b) % ${Hashing.P}) % $B) AS buckets
          FROM toks),
        sc AS (SELECT
            CAST(list_sum(list_transform(buckets, b -> b % 201 - 100))
              AS BIGINT) AS score,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
          FROM w),
        g AS (SELECT score, CAST(SUM(pos) AS BIGINT) AS n_pos,
            CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n_neg
          FROM sc GROUP BY score)
        SELECT score,
          CAST(SUM(n_pos) OVER (ORDER BY score DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_tp,
          CAST(SUM(n_neg) OVER (ORDER BY score DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_fp,
          CAST(SUM(n_pos) OVER (ORDER BY score DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            / (SUM(n_pos) OVER (ORDER BY score DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               + SUM(n_neg) OVER (ORDER BY score DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
            AS prec
        FROM g ORDER BY score DESC"""),
      (s, d) => {
        // Threshold selection needs the whole precision/recall curve,
        // not one operating point. Scoring is q131's zero-shuffle
        // codegen map; the curve is computed on the per-distinct-score
        // frame (bounded by the score range, NOT the corpus), and the
        // two global running sums plan onto RunningTotalExec via the
        // auto-route — no single-partition WindowExec even though the
        // frame is global. All-integer cumulative counts; the one
        // division per row is IEEE-identical cross-engine.
        val scored = table(s, d, "documents").select(
          hashedLinearScore(hashedBuckets(words(col("text")), B))
            .as("score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
        val byScore = scored.groupBy("score")
          .agg(sum(col("pos")).as("n_pos"),
            (count(lit(1)) - sum(col("pos"))).as("n_neg"))
        val w = Window.orderBy(col("score").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byScore.select(col("score"),
            sum(col("n_pos")).over(w).as("cum_tp"),
            sum(col("n_neg")).over(w).as("cum_fp"))
          .withColumn("prec",
            col("cum_tp").cast("double") / (col("cum_tp") + col("cum_fp")))
          .orderBy(col("score").desc)
      })
  )
}
