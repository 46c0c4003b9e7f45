package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Common._
import graft.dedup.Dedup
import graft.ops.Hashing
import graft.text.TextFunctions._

/** Round-7 audit wave 2 (SURVEY §2.7 T84–T86): operator-tuning and
  * sketch-accuracy meters — the LSH band-count tuning curve, a KMV
  * distinct-cardinality estimate audited against exact, and a
  * deterministic log2 length histogram (the heavy-tail profile linear
  * buckets hide).
  */
object Audit2 {

  private val sqlWords = """regexp_split_to_array(text, '\s+')"""
  private val P = Hashing.P
  private def sqlShingles(ws: String) =
    s"list_distinct(list_transform(range(1, len($ws)-1), i -> array_to_string(($ws)[i:i+2], ' ')))"
  private def sqlHash32(e: String) =
    s"CAST('0x' || substr(md5($e), 1, 8) AS BIGINT)"

  val qs: Seq[Q] = Seq(
    Q("q172_band_sweep",
      "LSH band-count tuning curve: candidate-pair mass under the " +
        "first b of 4 MinHash bands, for b = 1..4 — the recall/cost " +
        "dial read BEFORE committing a banding config to a 100 TB " +
        "sweep. ONE banded self-join total (not one per b): each " +
        "pair reduces to its MINIMUM matching band index, the " +
        "min-index histogram prefix-sums to the cumulative curve — " +
        "a 4-row frame through the RunningTotal-class window",
      Some(s"""WITH w AS (SELECT doc_id, $sqlWords AS ws FROM documents),
        sh AS (SELECT doc_id, ${sqlShingles("ws")} AS sh FROM w),
        sg AS (SELECT doc_id, ${(0 until 8).map(j =>
          s"list_min(list_transform(sh, s -> (${sqlHash32("s")} % $P * " +
            s"${Hashing.HashA(j)} + ${Hashing.HashB(j)}) % $P)) AS h$j")
            .mkString(", ")} FROM sh),
        bands AS (SELECT doc_id,
          unnest([h0*$P+h1, h2*$P+h3, h4*$P+h5, h6*$P+h7]) AS bv,
          unnest([0, 1, 2, 3]) AS bi FROM sg),
        pmin AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
            CAST(MIN(a.bi) AS BIGINT) AS min_bi
          FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv
            AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        hist AS (SELECT min_bi, CAST(COUNT(*) AS BIGINT) AS n
          FROM pmin GROUP BY min_bi),
        grid AS (SELECT unnest(range(4)) AS bi)
        SELECT CAST(g.bi + 1 AS BIGINT) AS n_bands,
          CAST(SUM(COALESCE(h.n, 0)) OVER (ORDER BY g.bi
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS n_pairs
        FROM grid g LEFT JOIN hist h ON g.bi = h.min_bi
        ORDER BY n_bands"""),
      (s, d) => {
        val sh = Dedup.shingleFrame(table(s, d, "documents"),
          "doc_id", "text")
        val bands = sh.select(col("doc_id"),
            posexplode(graft.functions.GraftFunctions
              .minhashBands(s, col("sh"))))
          .toDF("doc_id", "bi", "bv")
        val pmin = bands.as("a").join(bands.as("b").hint("merge"),
            col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
              col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .agg(min(col("a.bi")).cast("long").as("min_bi"))
        val hist = pmin.groupBy("min_bi").agg(count(lit(1)).as("n"))
        s.range(4).select(col("id").as("bi"))
          .join(hist, col("bi") === col("min_bi"), "left")
          .select(col("bi"), coalesce(col("n"), lit(0L)).as("n"))
          .withColumn("n_pairs", sum(col("n")).over(
            Window.orderBy("bi").rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
          .select((col("bi") + 1).cast("long").as("n_bands"),
            col("n_pairs"))
          .orderBy("n_bands")
      }),

    Q("q173_kmv_cardinality",
      "KMV (k-minimum-values) distinct-cardinality audit: estimate " +
        "the corpus' distinct-shingle count from only the k = 256 " +
        "smallest shingle hashes — est = (k−1)·2³²/h_k on the integer " +
        "lattice — next to the EXACT count, plus the error in ppm. " +
        "The estimator's scale story: bounded state (256 hashes) " +
        "through a TakeOrdered heap regardless of corpus size, where " +
        "the exact count pays a full distinct shuffle — the audit " +
        "certifies when the cheap path is trustworthy",
      Some(s"""WITH w AS (SELECT doc_id, $sqlWords AS ws FROM documents),
        sh AS (SELECT DISTINCT unnest(${sqlShingles("ws")}) AS s FROM w),
        hs AS (SELECT DISTINCT ${sqlHash32("s")} AS h FROM sh),
        exact AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM hs),
        kmv AS (SELECT CAST(h AS BIGINT) AS hk,
            CAST(ROW_NUMBER() OVER (ORDER BY h) AS BIGINT) AS r
          FROM hs ORDER BY h LIMIT 256),
        top AS (SELECT hk, r FROM kmv WHERE r = 256)
        SELECT e.n_exact, t.r AS k, t.hk AS h_k,
          CAST(255 * 4294967296 // t.hk AS BIGINT) AS n_est,
          CAST(abs(255 * 4294967296 // t.hk - e.n_exact) * 1000000
            // e.n_exact AS BIGINT) AS err_ppm
        FROM exact e CROSS JOIN top t"""),
      (s, d) => {
        // distinct HASH space (not strings): the estimator is defined
        // on the hash universe, so a 32-bit collision affects exact
        // and estimate identically in both engines
        val hs = Dedup.shingleFrame(table(s, d, "documents"),
            "doc_id", "text")
          .select(explode(col("sh")).as("s"))
          .select(Hashing.hash32(col("s")).as("h"))
          .distinct()
          .localCheckpoint() // two consumers: exact count + KMV heap
        val exact = hs.agg(count(lit(1)).as("n_exact"))
        // TakeOrdered heap: 256 rows to the driver-side merge, the
        // bounded-state path that replaces the full distinct at scale
        val kmv = hs.orderBy("h").limit(256)
          .withColumn("r", row_number().over(Window.orderBy("h"))
            .cast("long"))
          .filter(col("r") === 256)
          .select(col("h").as("hk"), col("r"))
        exact.crossJoin(broadcast(kmv))
          .select(col("n_exact"), col("r").as("k"), col("hk").as("h_k"),
            expr("CAST(255 * 4294967296L DIV hk AS LONG)").as("n_est"),
            expr("CAST(abs(255 * 4294967296L DIV hk - n_exact) * " +
              "1000000L DIV n_exact AS LONG)").as("err_ppm"))
      }),

    Q("q174_log2_length_histogram",
      "heavy-tail length profile: per-source doc counts in LOG2 " +
        "token-length buckets (linear buckets flatten the tail that " +
        "decides packing efficiency and truncation loss). floor(log2) " +
        "computed EXACTLY as binary-digit length — never the " +
        "transcendental log2(), whose 1-ulp skew at exact powers of " +
        "two would flip buckets differently per engine",
      Some(s"""WITH d AS (SELECT source, len($sqlWords) AS nt
          FROM documents),
        b AS (SELECT source,
            CAST(length(printf('%b', nt)) - 1 AS BIGINT) AS log2_bucket
          FROM d WHERE nt > 0)
        SELECT source, log2_bucket, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM b GROUP BY 1, 2 ORDER BY 1, 2"""),
      (s, d) => {
        table(s, d, "documents")
          .select(col("source"), size(words(col("text"))).as("nt"))
          .filter(col("nt") > 0)
          // floor(log2(n)) = (binary digit count) - 1, exact integers
          .select(col("source"),
            (length(conv(col("nt").cast("string"), 10, 2)) - 1)
              .cast("long").as("log2_bucket"))
          .groupBy("source", "log2_bucket")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("source", "log2_bucket")
      })
  )
}
