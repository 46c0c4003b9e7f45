package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Common._
import graft.ops.Hashing
import graft.text.TextFunctions

/** Third wave of the relational/extension surface: unpivot (melt),
  * exact + approximate percentiles, deterministic hash sampling
  * (reproducible training-data subsets/splits), max_by/min_by argmax,
  * percent_rank/cume_dist, and TF-IDF keyword extraction.
  *
  * Scale notes: every query here is either a grouped aggregation with
  * map-side partial aggregation, a narrow per-row map, or a keyed window
  * whose partition count grows with the data (never a single global
  * partition). The only broadcast is q82's corpus-size N — one row.
  */
object Relational3 {

  val qs: Seq[Q] = Seq(
    Q("q70_hash_sample",
      "deterministic hash sample (md5 mod 20): reproducible 5% subset",
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
          ${sqlDsum("o_totalprice", 2)} AS revenue
        FROM orders
        WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),1,8) AS BIGINT) % 20 = 0
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      (s, d) => {
        // Hash-based sampling, not rand(): the subset is a pure function
        // of the key, so it is identical across runs, engines, and
        // cluster sizes — the property train/test splits and A/B
        // holdouts actually need. The filter is a narrow map evaluated
        // at the scan; no shuffle is added. (rand()-based sample() can't
        // be oracle-checked and re-draws on every retry of a task.)
        table(s, d, "orders")
          .filter(Hashing.hash32(col("o_orderkey").cast("string")) % 20 === 0)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("revenue"))
          .orderBy("o_orderpriority")
      }),

    Q("q77_unpivot",
      "unpivot (melt): wide per-priority measures to long (measure, value)",
      Some(s"""WITH agg AS (SELECT o_orderpriority,
          CAST(COUNT(*) AS DOUBLE) AS n_orders,
          ${sqlDsum("o_totalprice", 2)} AS revenue,
          ${sqlDavg("o_totalprice", 2)} AS avg_price
        FROM orders GROUP BY o_orderpriority)
        SELECT o_orderpriority, measure, value FROM agg
        UNPIVOT (value FOR measure IN (n_orders, revenue, avg_price))
        ORDER BY o_orderpriority, measure"""),
      (s, d) => table(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("double").as("n_orders"),
          dsum(col("o_totalprice"), 2).as("revenue"),
          davg(col("o_totalprice"), 2).as("avg_price"))
        .unpivot(Array(col("o_orderpriority")),
          Array(col("n_orders"), col("revenue"), col("avg_price")),
          "measure", "value")
        .orderBy("o_orderpriority", "measure")),

    Q("q78_percentiles",
      "exact interpolated p50/p95 + approx-sketch error-bound flags",
      Some("""SELECT o_orderpriority,
          quantile_cont(o_totalprice, 0.5) AS p50,
          quantile_cont(o_totalprice, 0.95) AS p95,
          COUNT(*) AS n, TRUE AS p50_ok, TRUE AS p95_ok
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      (s, d) => {
        // Exact percentile values are cross-engine checkable (both
        // engines interpolate lower + (upper-lower)*frac); the
        // percentile_approx sketch values are engine-specific, so —
        // as in q50 — the sketch is checked through a relative-error
        // flag that flips the row hash if it drifts past 5%.
        def ok(a: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
          abs(a - e) / e <= 0.05
        table(s, d, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            percentile(col("o_totalprice"), lit(0.5)).as("p50"),
            percentile(col("o_totalprice"), lit(0.95)).as("p95"),
            percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("a50"),
            percentile_approx(col("o_totalprice"), lit(0.95), lit(10000)).as("a95"),
            count(lit(1)).as("n"))
          .select(col("o_orderpriority"), col("p50"), col("p95"), col("n"),
            ok(col("a50"), col("p50")).as("p50_ok"),
            ok(col("a95"), col("p95")).as("p95_ok"))
          .orderBy("o_orderpriority")
      }),

    Q("q80_argmax",
      "max_by/min_by: extreme-balance customer per nation, struct tiebreak",
      Some("""WITH r AS (SELECT c_nationkey, c_custkey, c_acctbal,
          row_number() OVER (PARTITION BY c_nationkey
            ORDER BY c_acctbal DESC, c_custkey DESC) AS rd,
          row_number() OVER (PARTITION BY c_nationkey
            ORDER BY c_acctbal ASC, c_custkey ASC) AS ra
        FROM customer)
        SELECT c_nationkey,
          MAX(CASE WHEN rd = 1 THEN c_custkey END) AS top_cust,
          MAX(CASE WHEN rd = 1 THEN c_acctbal END) AS top_bal,
          MAX(CASE WHEN ra = 1 THEN c_custkey END) AS bottom_cust,
          MAX(CASE WHEN ra = 1 THEN c_acctbal END) AS bottom_bal
        FROM r GROUP BY c_nationkey ORDER BY c_nationkey"""),
      (s, d) => {
        // Native max_by/min_by (one aggregation, no window, no join-back)
        // with a struct ordering key so balance ties break on custkey —
        // deterministic where bare max_by(x, bal) would be "any max row".
        // The oracle expresses the same thing as two window passes.
        val key = struct(col("c_acctbal"), col("c_custkey"))
        table(s, d, "customer")
          .groupBy(col("c_nationkey"))
          .agg(
            max_by(col("c_custkey"), key).as("top_cust"),
            max(col("c_acctbal")).as("top_bal"),
            min_by(col("c_custkey"), key).as("bottom_cust"),
            min(col("c_acctbal")).as("bottom_bal"))
          .orderBy("c_nationkey")
      }),

    Q("q81_percent_rank",
      "percent_rank + cume_dist within order priority",
      Some("""SELECT o_orderkey, o_orderpriority,
          percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
        ORDER BY o_orderkey"""),
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"))
        table(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
          .orderBy("o_orderkey")
      }),

    Q("q84_stratified_sample",
      "stratified deterministic sample: 5 lowest-hash docs per language",
      Some("""WITH h AS (SELECT lang, doc_id,
          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8) AS BIGINT) AS h
        FROM documents),
        r AS (SELECT lang, doc_id, h, row_number()
            OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn FROM h)
        SELECT lang, doc_id, h FROM r WHERE rn <= 5
        ORDER BY lang, h, doc_id"""),
      (s, d) => {
        // Per-stratum reproducible sampling = top-k by key hash per
        // group: the hash makes the draw a pure function of the key
        // (stable across runs/engines/cluster sizes), the custom
        // TopKPerGroup heap operator bounds shuffle to ~groups×k rows
        // (map-side partial heaps), so sampling a 100 TB corpus moves
        // almost nothing.
        val h = table(s, d, "documents")
          .select(col("lang"), col("doc_id"),
            Hashing.hash32(col("doc_id").cast("string")).as("h"))
        graft.plans.TopK.perGroup(h, Seq("lang"),
            Seq(("h", true), ("doc_id", true)), k = 5)
          .orderBy("lang", "h", "doc_id")
      }),

    Q("q85_winsorize",
      "winsorization: clip order values at per-priority p5/p95, audit clips",
      Some(s"""WITH b AS (SELECT o_orderpriority,
          quantile_cont(o_totalprice, 0.05) AS lo,
          quantile_cont(o_totalprice, 0.95) AS hi
        FROM orders GROUP BY o_orderpriority)
        SELECT o.o_orderpriority, COUNT(*) AS n,
          CAST(COUNT(*) FILTER (WHERE o_totalprice < lo) AS BIGINT) AS n_lo,
          CAST(COUNT(*) FILTER (WHERE o_totalprice > hi) AS BIGINT) AS n_hi,
          ${sqlDsum("LEAST(GREATEST(o_totalprice, lo), hi)", 6)} AS clipped_sum
        FROM orders o JOIN b USING (o_orderpriority)
        GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority"""),
      (s, d) => {
        // Outlier clipping for training-data cleaning: per-group exact
        // percentile bounds join back as a GROUP-cardinality table
        // (bounded — broadcasting it is safe at any data scale, unlike
        // row-cardinality frames), then the clip is a narrow map.
        val orders = table(s, d, "orders")
        val bounds = orders.groupBy(col("o_orderpriority"))
          .agg(percentile(col("o_totalprice"), lit(0.05)).as("lo"),
            percentile(col("o_totalprice"), lit(0.95)).as("hi"))
        val clipped = least(greatest(col("o_totalprice"), col("lo")), col("hi"))
        // dsum scale 6, NOT 12: the clipped values are ~1e5 in magnitude,
        // where ulp ≈ 5e-11 exceeds a 1e-12 decimal grid — at scale 12
        // the engines' double→decimal casts (shortest-string vs exact
        // binary expansion) land on different grid points. Scale 6 keeps
        // the grid far above ulp, so both casts agree.
        orders.join(broadcast(bounds), "o_orderpriority")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("o_totalprice") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
            sum(when(col("o_totalprice") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
            dsum(clipped, 6).as("clipped_sum"))
          .orderBy("o_orderpriority")
      }),

    Q("q89_local_supplier_volume",
      "TPC-H Q5 shape: 6-table star join, revenue by nation within region",
      Some(s"""SELECT n_name, ${sqlDsum("l_extendedprice * (1 - l_discount)", 6)} AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name"""),
      (s, d) => {
        // The classic star-join composition at its full width: two fact
        // tables (orders, lineitem) shuffle-join on their keys; nation
        // and region are bounded dims (25/5 rows at every SF) joined by
        // broadcast; supplier joins on suppkey. The date filter pushes
        // to the orders scan; column pruning keeps the lineitem scan to
        // 4 of 11 columns. No hint anywhere — size estimates and AQE
        // pick the right strategy at any scale.
        val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))
        table(s, d, "customer")
          .join(table(s, d, "orders")
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
            col("c_custkey") === col("o_custkey"))
          .join(table(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
          .join(table(s, d, "supplier"),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(table(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
          .join(table(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(dsum(revenue, 6).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      }),

    Q("q90_trailing_window",
      "RANGE-frame window: 30-day trailing revenue per customer",
      Some(s"""SELECT o_orderkey, o_custkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) OVER (
            PARTITION BY o_custkey
            ORDER BY datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
            RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail_30d
        FROM orders ORDER BY o_orderkey"""),
      (s, d) => {
        // Value-based (RANGE) frame, not row-based: all orders of the
        // same customer within the trailing 29 days contribute, however
        // many rows that is. Spark range frames need a numeric ordering
        // key → days since a fixed epoch. Partitioned by customer, so
        // window state stays per-key bounded at any scale.
        val days = datediff(col("o_orderdate").cast("date"),
          lit("1990-01-01").cast("date"))
        val w = Window.partitionBy(col("o_custkey")).orderBy(days)
          .rangeBetween(-29, Window.currentRow)
        table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            dsumOver(col("o_totalprice"), 2, w).as("trail_30d"))
          .orderBy("o_orderkey")
      }),

    Q("q82_tfidf",
      "TF-IDF keyword extraction: top-3 terms per document",
      Some("""WITH t AS (SELECT doc_id,
          unnest(regexp_split_to_array(text, '\s+')) AS term FROM documents),
        t2 AS (SELECT doc_id, term FROM t WHERE term <> ''),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t2 GROUP BY 1, 2),
        dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM t2),
        scored AS (SELECT doc_id, tf.term, tf, df,
            tf * (CAST(n.n AS DOUBLE) / df) AS score
          FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term) AS BIGINT) AS rn FROM scored)
        SELECT doc_id, term, tf, df, score, rn FROM r
        WHERE rn <= 3 ORDER BY doc_id, rn"""),
      (s, d) => {
        // Two grouped aggregations (both map-side partial), one term-keyed
        // join, a doc-keyed top-k window. idf is the rational N/df (not
        // ln(N/df)): same ranking family, and integer-ratio double math
        // is bit-identical across engines where ln() parity is not
        // guaranteed. N joins in as a one-row broadcast, never a driver
        // round-trip.
        val terms = table(s, d, "documents")
          .select(col("doc_id"),
            explode(TextFunctions.words(col("text"))).as("term"))
          .filter(col("term") =!= "")
        val tf = terms.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = terms.agg(countDistinct(col("doc_id")).as("n"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        tf.join(dfreq, "term")
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("term"), col("tf"), col("df"),
            (col("tf") * (col("n").cast("double") / col("df"))).as("score"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .orderBy("doc_id", "rn")
      }),

    Q("q124_zorder_scan",
      "W6 z-order layout rewrite: write lineitem clustered on " +
        "(l_partkey, l_suppkey), read back with a two-column predicate — " +
        "the layout changes file boundaries, never rows, so the result " +
        "must hash-match the plain table (per-file range narrowing is " +
        "asserted in LayoutPropertySpec; this row makes W6 " +
        "driver-oracle-visible)",
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
          FROM lineitem WHERE l_partkey <= 40 AND l_suppkey <= 10
          ORDER BY l_orderkey, l_linenumber"""),
      (s, d) => {
        val cols = Seq("l_orderkey", "l_linenumber", "l_partkey",
          "l_suppkey", "l_quantity")
        val li = table(s, d, "lineitem").select(cols.map(col): _*)
        // layout pass: one range-partition shuffle, paid once at load
        val dest = new java.io.File(System.getProperty("java.io.tmpdir"),
          "graft_q124_" + d.replaceAll("[^0-9a-zA-Z]", "_")).getAbsolutePath
        graft.load.Warehouse.writeZOrdered(li, dest, "l_partkey", "l_suppkey", 8)
        // the two-column predicate parquet min-max pruning serves at scale
        s.read.parquet(dest)
          .filter(col("l_partkey") <= 40 && col("l_suppkey") <= 10)
          .orderBy("l_orderkey", "l_linenumber")
      }),

    Q("q129_scd2_merge",
      "SCD2 warehouse merge: a CDC batch (segment moves, balance " +
        "bumps, no-op re-sends, brand-new keys) merges into a current " +
        "dimension — changed rows close at the batch date and re-open " +
        "as the new current version, no-ops stay untouched; one " +
        "equi-join + narrow explode, batch side broadcastable",
      Some("""WITH dim AS (
          SELECT c_custkey AS k, c_mktsegment AS segment,
                 c_acctbal AS acctbal, '2024-01-01' AS valid_from,
                 CAST(NULL AS VARCHAR) AS valid_to
          FROM customer),
        batch AS (
          SELECT c_custkey AS k,
            CASE WHEN c_custkey % 7 = 0 THEN 'MOVED'
                 ELSE c_mktsegment END AS segment,
            CASE WHEN c_custkey % 11 = 0 THEN c_acctbal + 100
                 ELSE c_acctbal END AS acctbal
          FROM customer
          WHERE c_custkey % 7 = 0 OR c_custkey % 11 = 0 OR c_custkey % 5 = 0
          UNION ALL
          SELECT c_custkey + 1000000, 'NEW', c_acctbal FROM customer
          WHERE c_custkey % 13 = 0),
        changed AS (
          SELECT d.k FROM dim d JOIN batch b USING (k)
          WHERE d.segment IS DISTINCT FROM b.segment
             OR d.acctbal IS DISTINCT FROM b.acctbal),
        merged AS (
          SELECT k, segment, acctbal, valid_from, valid_to FROM dim
            WHERE k NOT IN (SELECT k FROM changed)
          UNION ALL
          SELECT k, segment, acctbal, valid_from, '2024-06-15' FROM dim
            WHERE k IN (SELECT k FROM changed)
          UNION ALL
          SELECT b.k, b.segment, b.acctbal, '2024-06-15',
                 CAST(NULL AS VARCHAR)
          FROM batch b LEFT JOIN dim d USING (k)
          WHERE d.k IS NULL OR b.k IN (SELECT k FROM changed))
        SELECT k, segment, acctbal, valid_from, valid_to,
               valid_to IS NULL AS is_current
        FROM merged ORDER BY k, valid_from"""),
      (s, d) => {
        val cust = table(s, d, "customer")
        val dim = cust.select(col("c_custkey").as("k"),
          col("c_mktsegment").as("segment"), col("c_acctbal").as("acctbal"),
          lit("2024-01-01").as("valid_from"),
          lit(null).cast("string").as("valid_to"))
        // the CDC batch: two real change families, one no-op family
        // (%5 re-sends unchanged values — must NOT open a new version),
        // and inserts under fresh keys
        val batch = cust
          .filter(col("c_custkey") % 7 === 0 || col("c_custkey") % 11 === 0 ||
            col("c_custkey") % 5 === 0)
          .select(col("c_custkey").as("k"),
            when(col("c_custkey") % 7 === 0, lit("MOVED"))
              .otherwise(col("c_mktsegment")).as("segment"),
            when(col("c_custkey") % 11 === 0, col("c_acctbal") + 100)
              .otherwise(col("c_acctbal")).as("acctbal"))
          .unionAll(cust.filter(col("c_custkey") % 13 === 0)
            .select((col("c_custkey") + 1000000).as("k"),
              lit("NEW").as("segment"), col("c_acctbal").as("acctbal")))
        graft.load.Warehouse
          .mergeScd2(dim, batch, "k", Seq("segment", "acctbal"), "2024-06-15")
          .withColumn("is_current", col("valid_to").isNull)
          .orderBy("k", "valid_from")
      }),

    Q("q130_heavy_hitters",
      "exact top-10 heavy hitters through a bounded-memory Misra-Gries " +
        "candidate pass (TypedImperativeAggregate, capacity 64): the " +
        "skewed item stream has ~30k distinct values but the sketch " +
        "shuffles at most 64 rows per partition; an exact counting " +
        "pass over the broadcast candidate set (a guaranteed superset " +
        "of every item above n/65) makes the result exact — the scale " +
        "trade is a second scan instead of a vocabulary-sized shuffle",
      Some("""WITH items AS (
          SELECT CASE WHEN l_orderkey % 2 = 0
                      THEN 'hot_' || CAST(l_partkey % 10 AS VARCHAR)
                      ELSE 'cold_' || CAST(l_orderkey AS VARCHAR) || '_' ||
                           CAST(l_linenumber AS VARCHAR) END AS item
          FROM lineitem)
        SELECT item, COUNT(*) AS n FROM items
        GROUP BY item ORDER BY n DESC, item LIMIT 10"""),
      (s, d) => {
        // half the rows concentrate on 10 hot items (~3k each), the
        // rest are near-unique cold keys — the regime MG exists for
        val items = table(s, d, "lineitem").select(
          when(col("l_orderkey") % 2 === 0,
            concat(lit("hot_"), (col("l_partkey") % 10).cast("string")))
            .otherwise(concat(lit("cold_"), col("l_orderkey").cast("string"),
              lit("_"), col("l_linenumber").cast("string"))).as("item"))
        val cands = items
          .agg(graft.functions.MisraGriesAgg
            .mgCandidates(s, col("item"), 64).as("c"))
          .select(explode(col("c")).as("item"))
        // exact pass: only candidate items survive the broadcast join,
        // so the count shuffle carries <= 64 distinct keys
        items.join(broadcast(cands), "item")
          .groupBy(col("item")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("item")).limit(10)
      }),

    Q("q135_approx_quantiles",
      "approximate percentile (GK sketch) with a rank-error audit, the " +
        "q50 HLL treatment applied to quantiles: exact p50/p90 are " +
        "oracle-checked directly, and the sketch's p90 is verified by " +
        "recomputing its true rank and flagging it within the n/accuracy " +
        "guarantee — if the sketch ever drifts past its bound the flag " +
        "flips and the row hash-fails, making the sketch driver-checkable",
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
          median(o_totalprice) AS exact_p50,
          quantile_cont(o_totalprice, 0.9) AS exact_p90,
          TRUE AS p90_rank_ok
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      (s, d) => {
        val o = table(s, d, "orders")
        val agg = o.groupBy(col("o_orderpriority")).agg(
          count(lit(1)).as("n"),
          median(col("o_totalprice")).as("exact_p50"),
          expr("percentile(o_totalprice, 0.9)").as("exact_p90"),
          expr("approx_percentile(o_totalprice, 0.9, 100)").as("ap90"))
        // rank audit: one extra pass counts values <= the sketch's
        // answer; GK with accuracy=100 guarantees rank within n/100
        val ranked = o
          .join(agg.select(col("o_orderpriority"), col("ap90")),
            "o_orderpriority")
          .groupBy(col("o_orderpriority"))
          .agg(count(when(col("o_totalprice") <= col("ap90"), 1))
            .as("rank_ap90"))
        agg.join(ranked, "o_orderpriority")
          .select(col("o_orderpriority"), col("n"), col("exact_p50"),
            col("exact_p90"),
            (abs(col("rank_ap90") - lit(0.9) * col("n")) <=
              col("n").cast("double") / 100 + 1).as("p90_rank_ok"))
          .orderBy("o_orderpriority")
      }),

    Q("q192_lateral_topk",
      "LATERAL correlated-subquery join (round 8): top-3 orders per " +
        "customer expressed as SQL-standard `, LATERAL (SELECT … WHERE " +
        "o_custkey = c.c_custkey ORDER BY … LIMIT 3)` — the per-row " +
        "subquery form analysts write; Spark's DecorrelateInnerQuery " +
        "rewrites it to the same join+window plan the TopK strategy " +
        "heap-routes, so the declarative form costs nothing vs the " +
        "hand-written row_number pipeline (q04's shape). DuckDB runs " +
        "the identical SQL text as the oracle",
      Some("""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
        WHERE c.c_custkey % 7 = 0
        ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey"""),
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("customer_lv")
        table(s, d, "orders").createOrReplaceTempView("orders_lv")
        s.sql("""
          SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          FROM customer_lv c, LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders_lv
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
          WHERE c.c_custkey % 7 = 0
          ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey""")
      })
  )
}
