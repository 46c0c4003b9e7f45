package graft.qbo

/** Deterministic QBO API fixtures (FIXTURES.md §A): page envelopes per
  * entity plus report documents. Shapes mirror the fields each reference
  * script reads; variants exercise the semantic traps (empty/missing
  * Line arrays, missing payment structs, non-numeric ids, empty report
  * cells). Embedded as code so the driver-run pipelines are
  * self-contained.
  */
object Fixtures {

  /** Two pages — the second short, ending pagination (S3/S4). */
  val billPages: Seq[String] = Seq(
    """{"QueryResponse": {"Bill": [
      {"Id": "145", "SyncToken": "2", "DocNumber": "B-1001", "TxnDate": "2024-03-05",
       "DueDate": "2024-04-04", "Balance": 1250.5, "PrivateNote": "note",
       "VendorRef": {"value": "56", "name": "Acme Supply"},
       "APAccountRef": {"value": "33", "name": "Accounts Payable"},
       "Line": [{"Id": "1", "Amount": 1250.5, "DetailType": "AccountBasedExpenseLineDetail",
                 "AccountBasedExpenseLineDetail": {"AccountRef": {"value": "7", "name": "Freight"}}}],
       "LinkedTxn": [{"TxnId": "210", "TxnType": "BillPaymentCheck"}]},
      {"Id": "146", "SyncToken": "0", "TxnDate": "2024-03-06", "Balance": 0.0,
       "VendorRef": {"value": "57", "name": "Beta Parts"}}
    ], "maxResults": 2, "startPosition": 1}}""",
    """{"QueryResponse": {"Bill": [
      {"Id": "147", "SyncToken": "1", "DocNumber": "B-1003", "TxnDate": "2024-03-09",
       "DueDate": "2024-05-01", "Balance": 99.99,
       "VendorRef": {"value": "56", "name": "Acme Supply"},
       "APAccountRef": {"value": "33", "name": "Accounts Payable"},
       "Line": []}
    ], "maxResults": 1, "startPosition": 3}}""")

  /** Check / credit-card / neither variants (c_c_ patch + fillna paths). */
  val billPaymentPages: Seq[String] = Seq(
    """{"QueryResponse": {"BillPayment": [
      {"Id": "210", "PayType": "Check", "TotalAmt": 1250.5, "TxnDate": "2024-03-20",
       "DocNumber": "P-77", "VendorRef": {"value": "56", "name": "Acme Supply"},
       "CheckPayment": {"BankAccountRef": {"value": "12", "name": "Checking"}}},
      {"Id": "211", "PayType": "CreditCard", "TotalAmt": 89.99, "TxnDate": "2024-03-21",
       "VendorRef": {"value": "61", "name": "SaaS Co"},
       "CreditCardPayment": {"CCAccountRef": {"value": "19", "name": "Corporate Visa"}}},
      {"Id": "212", "PayType": "Check", "TotalAmt": 10.0, "TxnDate": "2024-03-22",
       "VendorRef": {"value": "57", "name": "Beta Parts"}}
    ], "maxResults": 3, "startPosition": 1}}""")

  /** Multi-line entry + empty-Line + missing-Line (explode_outer trap). */
  val journalEntryPages: Seq[String] = Seq(
    """{"QueryResponse": {"JournalEntry": [
      {"Id": "88", "Adjustment": false, "DocNumber": "JE-9", "TxnDate": "2024-02-01",
       "PrivateNote": "accrual",
       "Line": [
         {"Id": "0", "Description": "debit side", "Amount": 500.0,
          "DetailType": "JournalEntryLineDetail",
          "JournalEntryLineDetail": {"PostingType": "Debit",
            "Entity": {"Type": "Vendor", "EntityRef": {"value": "56", "name": "Acme Supply"}},
            "AccountRef": {"value": "7", "name": "Freight"},
            "ClassRef": {"value": "3", "name": "Ops"},
            "DepartmentRef": {"value": "2", "name": "Warehouse"}}},
         {"Id": "1", "Amount": 500.0, "DetailType": "JournalEntryLineDetail",
          "JournalEntryLineDetail": {"PostingType": "Credit",
            "AccountRef": {"value": "40", "name": "Accrued Liabilities"}}}]},
      {"Id": "89", "Adjustment": true, "DocNumber": "JE-10", "TxnDate": "2024-02-02",
       "Line": []},
      {"Id": "90", "Adjustment": false, "DocNumber": "JE-11", "TxnDate": "2024-02-03",
       "PrivateNote": "no lines"}
    ], "maxResults": 3, "startPosition": 1}}""")

  /** Includes a non-numeric Id (coerce→0 path, qb_purchases.py:126). */
  val purchasePages: Seq[String] = Seq(
    """{"QueryResponse": {"Purchase": [
      {"Id": "301", "PaymentType": "CreditCard", "Credit": false, "TotalAmt": 89.99,
       "TxnDate": "2024-03-11", "PrivateNote": "software",
       "AccountRef": {"value": "41"}, "EntityRef": {"value": "61", "name": "SaaS Co"},
       "Line": [{"Id": "1", "Description": "subscription", "Amount": 89.99,
                 "DetailType": "AccountBasedExpenseLineDetail",
                 "AccountBasedExpenseLineDetail": {
                   "AccountRef": {"value": "9", "name": "Software"},
                   "BillableStatus": "NotBillable", "TaxCodeRef": {"value": "NON"}}}]},
      {"Id": "ABC-302", "PaymentType": "Cash", "Credit": true, "TotalAmt": 25.0,
       "TxnDate": "2024-03-12",
       "AccountRef": {"value": "41"}, "EntityRef": {"value": "62", "name": "Diner"},
       "Line": [{"Id": "1", "Amount": 25.0, "DetailType": "AccountBasedExpenseLineDetail",
                 "AccountBasedExpenseLineDetail": {"AccountRef": {"value": "13", "name": "Meals"}}},
                {"Id": "2", "Amount": 0.0, "DetailType": "AccountBasedExpenseLineDetail",
                 "AccountBasedExpenseLineDetail": {"AccountRef": {"value": "14", "name": "Tips"}}}]}
    ], "maxResults": 2, "startPosition": 1}}""")

  val depositPages: Seq[String] = Seq(
    """{"QueryResponse": {"Deposit": [
      {"Id": "412", "TotalAmt": 3200.0, "TxnDate": "2024-03-15", "PrivateNote": "weekly",
       "DocNumber": "D-12",
       "DepositToAccountRef": {"value": "12", "name": "Checking"},
       "CurrencyRef": {"value": "USD", "name": "United States Dollar"},
       "Line": [{"Amount": 3200.0, "DetailType": "DepositLineDetail"}]},
      {"Id": "413", "TotalAmt": 150.0, "TxnDate": "2024-03-16",
       "DepositToAccountRef": {"value": "12", "name": "Checking"},
       "CurrencyRef": {"value": "USD", "name": "United States Dollar"}}
    ], "maxResults": 2, "startPosition": 1}}""")

  /** ≥3-level P&L tree with Summary rows and a non-numeric total
    * (FIXTURES.md A7), two months.
    */
  val pnlReports: Seq[(String, String)] = Seq(
    "2024-01" -> """{"Header": {"StartPeriod": "2024-01-01", "EndPeriod": "2024-01-31"},
      "Columns": {"Column": [{"ColTitle": ""}, {"ColTitle": "Total"}]},
      "Rows": {"Row": [
        {"Header": {"ColData": [{"value": "Income"}, {"value": ""}]},
         "Rows": {"Row": [
           {"ColData": [{"value": "Sales"}, {"value": "1000.00"}]},
           {"Header": {"ColData": [{"value": "Services"}, {"value": ""}]},
            "Rows": {"Row": [{"ColData": [{"value": "Consulting"}, {"value": "250.00"}]}]},
            "Summary": {"ColData": [{"value": "Total Services"}, {"value": "250.00"}]}}]},
         "Summary": {"ColData": [{"value": "Total Income"}, {"value": "1250.00"}]}},
        {"Header": {"ColData": [{"value": "Expenses"}, {"value": ""}]},
         "Rows": {"Row": [
           {"ColData": [{"value": "Freight"}, {"value": "n/a"}]},
           {"ColData": [{"value": ""}, {"value": "75.50"}]}]},
         "Summary": {"ColData": [{"value": "Total Expenses"}, {"value": "75.50"}]}}]}}""",
    "2024-02" -> """{"Header": {"StartPeriod": "2024-02-01", "EndPeriod": "2024-02-29"},
      "Columns": {"Column": [{"ColTitle": ""}, {"ColTitle": "Total"}]},
      "Rows": {"Row": [
        {"Header": {"ColData": [{"value": "Income"}, {"value": ""}]},
         "Rows": {"Row": [{"ColData": [{"value": "Sales"}, {"value": "900.00"}]}]},
         "Summary": {"ColData": [{"value": "Total Income"}, {"value": "900.00"}]}}]}}""")

  /** Tabular report incl. an empty Amount (null-audit path). */
  val transactionListReport: String =
    """{"Header": {"StartPeriod": "2022-01-01", "EndPeriod": "2024-03-31"},
      "Columns": {"Column": [{"ColTitle": "Date"}, {"ColTitle": "Transaction Type"},
        {"ColTitle": "Num"}, {"ColTitle": "Is No Post"}, {"ColTitle": "Name"},
        {"ColTitle": "Memo/Description"}, {"ColTitle": "Account"},
        {"ColTitle": "Split"}, {"ColTitle": "Amount"}]},
      "Rows": {"Row": [
        {"ColData": [{"value": "2024-03-05"}, {"value": "Bill"}, {"value": "B-1001"},
          {"value": "No"}, {"value": "Acme Supply"}, {"value": "note"},
          {"value": "Accounts Payable"}, {"value": "-SPLIT-"}, {"value": "1250.50"}]},
        {"ColData": [{"value": "2024-03-20"}, {"value": "Bill Payment (Check)"},
          {"value": "P-77"}, {"value": "No"}, {"value": "Acme Supply"}, {"value": ""},
          {"value": "Checking"}, {"value": "Accounts Payable"}, {"value": ""}]}]}}"""

  /** Vendor-grouped report (intended semantics of the dead script),
    * incl. a vendor with no transactions.
    */
  val byVendorReport: String =
    """{"Header": {"Time": "2024-04-01", "StartPeriod": "2015-01-01", "EndPeriod": "2024-03-31"},
      "Rows": {"Row": [
        {"Header": {"ColData": [{"value": "Acme Supply", "id": "56"}]},
         "Rows": {"Row": [
           {"ColData": [{"value": "2024-03-05"}, {"value": "Bill"}, {"value": "B-1001"},
             {"value": "Yes"}, {"value": "note"}, {"value": "Accounts Payable"},
             {"value": "1250.50"}]},
           {"ColData": [{"value": "2024-03-20"}, {"value": "Bill Payment (Check)"},
             {"value": "P-77"}, {"value": "Yes"}, {"value": ""}, {"value": "Checking"},
             {"value": ""}]}]}},
        {"Header": {"ColData": [{"value": "Beta Parts", "id": "57"}]},
         "Rows": {"Row": []}}]}}"""

  /** Page 2 of the paginated ByVendor fetch (S7): one more vendor, no
    * `hasMore` → the fetch loop must stop after this page.
    */
  val byVendorReportPage2: String =
    """{"Header": {"Time": "2024-04-01", "StartPeriod": "2015-01-01", "EndPeriod": "2024-03-31"},
      "Rows": {"Row": [
        {"Header": {"ColData": [{"value": "Gamma Co", "id": "99"}]},
         "Rows": {"Row": [
           {"ColData": [{"value": "2024-02-02"}, {"value": "Bill"}, {"value": "B-2"},
             {"value": "Yes"}, {"value": "memo"}, {"value": "Accounts Payable"},
             {"value": "10.00"}]}]}}]}}"""
}
