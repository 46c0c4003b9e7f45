package graft.qbo

import org.apache.spark.sql.types._

/** Explicit ingest StructTypes per QBO entity (SURVEY §1 layer-1 schema).
  *
  * The reference lets `pd.json_normalize` infer whatever the JSON holds;
  * at scale we declare the schema (stable plans, vectorized JSON parsing,
  * no sampling pass). Field sets mirror exactly what each reference
  * script reads (cites per entity below).
  */
object Schemas {

  private def f(n: String, t: DataType) = StructField(n, t)

  /** `{value, name}` reference objects (qb_bills.py:81-84). */
  val ref: StructType = StructType(Seq(f("value", StringType), f("name", StringType)))

  /** Bill line detail (kept stringified — qb_bills.py:107). */
  val expenseLine: StructType = StructType(Seq(
    f("Id", StringType), f("Description", StringType),
    f("Amount", DoubleType), f("DetailType", StringType),
    f("AccountBasedExpenseLineDetail", StructType(Seq(
      f("AccountRef", ref), f("BillableStatus", StringType),
      f("TaxCodeRef", StructType(Seq(f("value", StringType)))))))))

  val linkedTxn: StructType = StructType(Seq(
    f("TxnId", StringType), f("TxnType", StringType)))

  /** qb_bills.py:72-89. */
  val bill: StructType = StructType(Seq(
    f("Id", StringType), f("SyncToken", StringType), f("DocNumber", StringType),
    f("TxnDate", StringType), f("DueDate", StringType), f("Balance", DoubleType),
    f("PrivateNote", StringType), f("VendorRef", ref), f("APAccountRef", ref),
    f("Line", ArrayType(expenseLine)), f("LinkedTxn", ArrayType(linkedTxn))))

  /** qb_billpayments.py:95-96. */
  val billPayment: StructType = StructType(Seq(
    f("Id", StringType), f("PayType", StringType), f("TotalAmt", DoubleType),
    f("TxnDate", StringType), f("DocNumber", StringType), f("VendorRef", ref),
    f("CheckPayment", StructType(Seq(f("BankAccountRef", ref)))),
    f("CreditCardPayment", StructType(Seq(f("CCAccountRef", ref))))))

  /** JournalEntry line (qb_jounalentry.py:119-134). */
  val journalLine: StructType = StructType(Seq(
    f("Id", StringType), f("Description", StringType), f("Amount", DoubleType),
    f("DetailType", StringType),
    f("JournalEntryLineDetail", StructType(Seq(
      f("PostingType", StringType),
      f("Entity", StructType(Seq(f("Type", StringType), f("EntityRef", ref)))),
      f("AccountRef", ref), f("ClassRef", ref), f("DepartmentRef", ref))))))

  /** qb_jounalentry.py:95-97. */
  val journalEntry: StructType = StructType(Seq(
    f("Id", StringType), f("Adjustment", BooleanType), f("DocNumber", StringType),
    f("TxnDate", StringType), f("PrivateNote", StringType),
    f("Line", ArrayType(journalLine))))

  /** qb_purchases.py:91-93. */
  val purchase: StructType = StructType(Seq(
    f("Id", StringType), f("PaymentType", StringType), f("Credit", BooleanType),
    f("TotalAmt", DoubleType), f("TxnDate", StringType), f("PrivateNote", StringType),
    f("AccountRef", ref), f("EntityRef", ref),
    f("Line", ArrayType(expenseLine))))

  /** qb_deposit.py:94-98. */
  val deposit: StructType = StructType(Seq(
    f("Id", StringType), f("TotalAmt", DoubleType), f("TxnDate", StringType),
    f("PrivateNote", StringType), f("DocNumber", StringType),
    f("DepositToAccountRef", ref), f("CurrencyRef", ref),
    f("Line", ArrayType(StructType(Seq(
      f("Amount", DoubleType), f("DetailType", StringType)))))))
}
