package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.qbo._
import graft.qbo.Entities._

/** End-to-end QBO pipeline queries: fixture pages → declared-schema JSON
  * parse → stage (select/snake/rename/fill/astype) → warehouse cast
  * layer (SURVEY §3 E1-E3). These run the same code paths a live QBO
  * source would feed; the oracle side reconstructs the expected typed
  * output as a VALUES relation, making each pipeline a driver-checked
  * golden test.
  */
object QboPipelines {

  private def entity(s: SparkSession, name: String, pages: Seq[String],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    QboSource.entityFrame(s, name, pages, schema)

  def billsWarehouse(s: SparkSession): DataFrame =
    Bills.warehouse(Bills.stage(entity(s, "Bill", Fixtures.billPages, Schemas.bill)))
      .orderBy("id")

  def billPaymentsWarehouse(s: SparkSession): DataFrame =
    BillPayments.warehouse(BillPayments.stage(
      entity(s, "BillPayment", Fixtures.billPaymentPages, Schemas.billPayment)))
      .orderBy("id")

  def journalEntriesWarehouse(s: SparkSession): DataFrame =
    JournalEntries.warehouse(JournalEntries.stage(
      entity(s, "JournalEntry", Fixtures.journalEntryPages, Schemas.journalEntry)))
      .orderBy(col("id"), col("line_id").asc_nulls_first)

  def purchasesWarehouse(s: SparkSession): DataFrame =
    Purchases.warehouse(Purchases.stage(
      entity(s, "Purchase", Fixtures.purchasePages, Schemas.purchase)))
      .orderBy(col("id"), col("line_id"))

  def depositsWarehouse(s: SparkSession): DataFrame =
    Deposits.warehouse(Deposits.stage(
      entity(s, "Deposit", Fixtures.depositPages, Schemas.deposit)))
      .orderBy("id")

  def pnlWarehouse(s: SparkSession): DataFrame =
    Reports.ProfitAndLoss.warehouse(Reports.ProfitAndLoss.stage(
      Reports.ProfitAndLoss.flatten(s, Fixtures.pnlReports).toDF()))
      .orderBy("month", "category", "total_amount")

  def transactionListWarehouse(s: SparkSession): DataFrame =
    Reports.TransactionList.warehouse(
      Reports.TransactionList.parse(s, Fixtures.transactionListReport))
      .orderBy("date", "doc_num")

  def byVendorWarehouse(s: SparkSession): DataFrame =
    Reports.TransactionListByVendor.warehouse(
      Reports.TransactionListByVendor.parse(s, Fixtures.byVendorReport))
      .orderBy(col("vendor_id"), col("date").asc_nulls_first)

  /** Fixture Reports-API backend for the S7 paginated fetch loop: serves
    * the ByVendor report in two pages keyed on `start_position`, rejects
    * requests missing the pagination + `columns=` projection params the
    * reference sends (so the query FAILS if the fetch loop stops sending
    * them), and flags `hasMore` on every page but the last.
    */
  private final class PagedByVendorBackend extends QboReportsApi {
    def report(name: String, params: Seq[(String, String)]): String = {
      require(name == "TransactionListByVendor", name)
      val p = params.toMap
      require(p.get("columns").contains("Vendor ID, Vendor Name"), p)
      require(p.get("max_results").contains("100"), p)
      p("start_position").toInt match {
        case 1 =>
          Fixtures.byVendorReport.replaceFirst("\\{", "{\"hasMore\": true, ")
        case 101 => Fixtures.byVendorReportPage2
        case other => throw new IllegalArgumentException(
          s"fetch loop overran the terminal page: start_position=$other")
      }
    }
  }

  /** S7 end-to-end: paginated fetch (hasMore stop predicate, column
    * projection pushed to the server) → union-of-pages parse → W4.
    */
  def byVendorPagedWarehouse(s: SparkSession): DataFrame =
    Reports.TransactionListByVendor.warehouse(
      Reports.TransactionListByVendor.parsePages(s,
        Reports.Fetch.transactionListByVendor(new PagedByVendorBackend,
          "2015-01-01", "2024-03-31",
          columns = Some("Vendor ID, Vendor Name"))))
      .orderBy(col("vendor_id"), col("date").asc_nulls_first)

  /** W3 end-to-end: the Bill warehouse frame through the JDBC sink into
    * an embedded Derby database and back out through the JDBC source —
    * the same `toJdbc`/`fromJdbc` pair a live warehouse load uses. The
    * pid-scoped in-memory db name keeps concurrent bench/verify JVMs
    * isolated; overwrite mode makes repeat calls idempotent.
    */
  def billsJdbcRoundTrip(s: SparkSession): DataFrame = {
    val staged = billsWarehouse(s)
    val url = s"jdbc:derby:memory:graft_rt_p${ProcessHandle.current().pid()};create=true"
    graft.load.Warehouse.toJdbc(staged, url, "bills_wh")
    graft.load.Warehouse.fromJdbc(s, url, "bills_wh")
      .select(staged.columns.map(col).toSeq: _*)
      .orderBy("id")
  }

  /** W2 end-to-end: the Bill warehouse frame through the CSV debug sink
    * and back with the frame's own schema — proves the debug artifact
    * is faithful (quoting, nulls, timestamps), not just writable. The
    * scratch dir is pid-scoped and reset per call.
    */
  def billsCsvRoundTrip(s: SparkSession): DataFrame = {
    val staged = billsWarehouse(s)
    val path = Common.scratchDir("csv_rt", "bills")
    graft.load.Warehouse.debugCsv(staged, path)
    graft.load.Warehouse.fromDebugCsv(s, path, staged.schema)
      .select(staged.columns.map(col).toSeq: _*)
      .orderBy("id")
  }

  val qs: Seq[Q] = Seq(
    Q("qbo_vendor_spend",
      "downstream analytics across two QBO pipelines: billed vs paid per vendor",
      Some(s"""WITH bills AS (${Oracles.bills}),
        pays AS (${Oracles.billPayments})
        SELECT b.vendor_ref_name AS vendor_name,
          CAST(SUM(CAST(b.balance AS DECIMAL(30,6))) AS DOUBLE) AS total_billed,
          COALESCE(p.total_paid, 0.0) AS total_paid
        FROM bills b LEFT JOIN (
          SELECT vendor_ref_name,
            CAST(SUM(CAST(total_amt AS DECIMAL(30,6))) AS DOUBLE) AS total_paid
          FROM pays GROUP BY vendor_ref_name) p
          ON b.vendor_ref_name = p.vendor_ref_name
        GROUP BY b.vendor_ref_name, p.total_paid
        ORDER BY vendor_name"""),
      (s, _) => {
        val bills = billsWarehouse(s)
        val pays = billPaymentsWarehouse(s)
          .groupBy(col("vendor_ref_name"))
          .agg(Common.dsum(col("total_amt"), 6).as("total_paid"))
        bills
          .join(pays, Seq("vendor_ref_name"), "left")
          .groupBy(col("vendor_ref_name").as("vendor_name"), col("total_paid"))
          .agg(Common.dsum(col("balance"), 6).as("total_billed"))
          .select(col("vendor_name"), col("total_billed"),
            coalesce(col("total_paid"), lit(0.0)).as("total_paid"))
          .orderBy("vendor_name")
      }),

    Q("qbo_bills", "Bill pipeline: S2+P1+P5+R1-R3+C1+C6+W4 end-to-end",
      Some(Oracles.bills), (s, _) => billsWarehouse(s)),
    Q("qbo_billpayments", "BillPayment pipeline: S3+P1+R2-R3 patch+C3+C7+W4",
      Some(Oracles.billPayments), (s, _) => billPaymentsWarehouse(s)),
    Q("qbo_journalentries", "JournalEntry pipeline: explode_outer P2-P4+R5+W4",
      Some(Oracles.journalEntries), (s, _) => journalEntriesWarehouse(s)),
    Q("qbo_purchases", "Purchase pipeline: S4+P2-P4+C2 coerce+C6+W4",
      Some(Oracles.purchases), (s, _) => purchasesWarehouse(s)),
    Q("qbo_deposits", "Deposit pipeline: S3+P1+P5+C7+W4",
      Some(Oracles.deposits), (s, _) => depositsWarehouse(s)),
    Q("qbo_profit_and_loss", "P&L report: S5+P6 recursive flatten+C8+W5",
      Some(Oracles.pnl), (s, _) => pnlWarehouse(s)),
    Q("qbo_transaction_list", "TransactionList report: S6+P7+P9+C2+C6+W4",
      Some(Oracles.transactionList), (s, _) => transactionListWarehouse(s)),
    Q("qbo_txnlist_by_vendor", "ByVendor report: S7+P8 intended semantics+W4",
      Some(Oracles.byVendor), (s, _) => byVendorWarehouse(s)),
    Q("qbo_byvendor_paged",
      "S7 paginated fetch against a fixture backend: hasMore stop " +
        "predicate, start_position advance, columns= server-side " +
        "projection, union-of-pages parse, W4 cast layer",
      Some(Oracles.byVendorPaged), (s, _) => byVendorPagedWarehouse(s)),
    Q("qbo_jdbc_roundtrip",
      "W3 JDBC warehouse round-trip: Bill warehouse frame → toJdbc " +
        "(embedded Derby) → fromJdbc → values identical to qbo_bills",
      Some(Oracles.bills), (s, _) => billsJdbcRoundTrip(s)),

    Q("qbo_csv_roundtrip",
      "W2 CSV debug sink round-trip: Bill warehouse frame → header'd " +
        "CSV → read back under the frame's schema → values identical " +
        "to qbo_bills",
      Some(Oracles.bills), (s, _) => billsCsvRoundTrip(s))
  )
}
