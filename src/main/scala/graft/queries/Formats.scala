package graft.queries

import org.apache.spark.sql.functions._

import Common._

/** Round-7 format surface (SURVEY §2.5 widening): ORC and JSON-lines
  * round trips through the shared [[graft.load.Warehouse.writePath]]
  * entry point — the driver-checked proof that the engine's sink/source
  * story is format-plural (the reference is parquet-only; a library
  * user gets ORC's predicate pushdown and JSONL's interchange form for
  * free). Each round trip must hash-match the parquet-read oracle, so
  * the check covers type fidelity (longs, strings, dates), not just
  * writability.
  */
object Formats {

  val qs: Seq[Q] = Seq(
    Q("q181_orc_roundtrip",
      "ORC sink/source round trip via Warehouse.writePath: a lineitem " +
        "projection (long keys, 2-dp money on the cent lattice, a real " +
        "DATE column) written as ORC and read back — hash-matched " +
        "against DuckDB reading the ORIGINAL parquet, so ORC's type " +
        "mapping (incl. Date) is what's driver-certified",
      Some("""SELECT l_orderkey, l_linenumber,
          CAST(CASE WHEN l_extendedprice >= 0
            THEN floor(l_extendedprice * 100.0 + 0.5)
            ELSE ceil(l_extendedprice * 100.0 - 0.5) END AS BIGINT)
            AS price_cents,
          strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        FROM lineitem WHERE l_orderkey % 1000 = 0
        ORDER BY l_orderkey, l_linenumber"""),
      (s, d) => {
        val frame = table(s, d, "lineitem")
          .filter(col("l_orderkey") % 1000 === 0)
          .select(col("l_orderkey"), col("l_linenumber"),
            graft.similarity.Vectors.latScalar(col("l_extendedprice"), 100.0)
              .as("price_cents"),
            col("l_shipdate"))
        val dir = Common.scratchDir("orc_rt", d)
        graft.load.Warehouse.writePath(frame, s"file://$dir/t", "orc")
        s.read.orc(s"file://$dir/t")
          .select(col("l_orderkey"), col("l_linenumber"), col("price_cents"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
          .orderBy("l_orderkey", "l_linenumber")
      }),

    Q("q182_jsonl_roundtrip",
      "JSON-lines sink/source round trip via Warehouse.writePath: the " +
        "documents table written as JSONL and read back with its own " +
        "schema — longs and full UTF-8 text must survive the text " +
        "encoding byte-exactly (hash-matched against DuckDB on the " +
        "original parquet)",
      Some("""SELECT doc_id, text, lang, source, n_chars
        FROM documents ORDER BY doc_id"""),
      (s, d) => {
        val docs = table(s, d, "documents")
          .select("doc_id", "text", "lang", "source", "n_chars")
        val dir = Common.scratchDir("jsonl_rt", d)
        graft.load.Warehouse.writePath(docs, s"file://$dir/t", "json")
        s.read.schema(docs.schema).json(s"file://$dir/t")
          .orderBy("doc_id")
      })
  )
}
