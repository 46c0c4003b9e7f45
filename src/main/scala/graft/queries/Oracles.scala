package graft.queries

/** Expected outputs of the QBO fixture pipelines as DuckDB VALUES
  * relations — hand-derived from the reference's declared semantics
  * (SURVEY §2.2-§2.5) applied to the fixtures. These make each pipeline
  * a golden end-to-end test under the driver's oracle gate.
  */
object Oracles {

  val bills: String = """
    SELECT CAST(due_date AS DATE) AS due_date, CAST(balance AS DOUBLE) AS balance,
      CAST(id AS INT) AS id, CAST(sync_token AS INT) AS sync_token,
      doc_number, CAST(txn_date AS DATE) AS txn_date, private_note, line,
      vendor_ref_value, vendor_ref_name, ap_account_ref_value,
      ap_account_ref_name, linked_txn
    FROM (VALUES
      ('2024-04-04', 1250.5, 145, 2, 'B-1001', '2024-03-05', 'note',
       '[{"Id":"1","Amount":1250.5,"DetailType":"AccountBasedExpenseLineDetail","AccountBasedExpenseLineDetail":{"AccountRef":{"value":"7","name":"Freight"}}}]',
       '56', 'Acme Supply', '33', 'Accounts Payable',
       '[{"TxnId":"210","TxnType":"BillPaymentCheck"}]'),
      (NULL, 0.0, 146, 0, NULL, '2024-03-06', NULL, NULL,
       '57', 'Beta Parts', NULL, NULL, NULL),
      ('2024-05-01', 99.99, 147, 1, 'B-1003', '2024-03-09', NULL, '[]',
       '56', 'Acme Supply', '33', 'Accounts Payable', NULL)
    ) t(due_date, balance, id, sync_token, doc_number, txn_date, private_note,
        line, vendor_ref_value, vendor_ref_name, ap_account_ref_value,
        ap_account_ref_name, linked_txn)
    ORDER BY id"""

  val billPayments: String = """
    SELECT pay_type, CAST(total_amt AS DOUBLE) AS total_amt, CAST(id AS INT) AS id,
      CAST(txn_date AS TIMESTAMP) AS txn_date,
      CAST(vendor_ref_value AS INT) AS vendor_ref_value, vendor_ref_name,
      CAST(bank_val AS INT) AS check_payment_bank_account_ref_value,
      bank_name AS check_payment_bank_account_ref_name, doc_number,
      CAST(cc_val AS INT) AS credit_card_payment_cc_account_ref_value,
      cc_name AS credit_card_payment_cc_account_ref_name
    FROM (VALUES
      ('Check', 1250.5, 210, '2024-03-20 00:00:00', 56, 'Acme Supply',
       12, 'Checking', 'P-77', 0, NULL),
      ('CreditCard', 89.99, 211, '2024-03-21 00:00:00', 61, 'SaaS Co',
       0, NULL, NULL, 19, 'Corporate Visa'),
      ('Check', 10.0, 212, '2024-03-22 00:00:00', 57, 'Beta Parts',
       0, NULL, NULL, 0, NULL)
    ) t(pay_type, total_amt, id, txn_date, vendor_ref_value, vendor_ref_name,
        bank_val, bank_name, doc_number, cc_val, cc_name)
    ORDER BY id"""

  val journalEntries: String = """
    SELECT CAST(adjustment AS BOOLEAN) AS adjustment, CAST(id AS INT) AS id,
      doc_number, CAST(txn_date AS TIMESTAMP) AS txn_date, private_note,
      CAST(line_id AS INT) AS line_id, line_description,
      CAST(line_amount AS DOUBLE) AS line_amount, line_posting_type,
      line_entity_type, CAST(line_entity_value AS DOUBLE) AS line_entity_value,
      line_entity_name, CAST(line_account_value AS DOUBLE) AS line_account_value,
      line_account_name, CAST(line_class_value AS DOUBLE) AS line_class_value,
      line_class_name, CAST(line_department_value AS DOUBLE) AS line_department_value,
      line_department_name
    FROM (VALUES
      (false, 88, 'JE-9', '2024-02-01 00:00:00', 'accrual', 0, 'debit side',
       500.0, 'Debit', 'Vendor', 56.0, 'Acme Supply', 7.0, 'Freight',
       3.0, 'Ops', 2.0, 'Warehouse'),
      (false, 88, 'JE-9', '2024-02-01 00:00:00', 'accrual', 1, NULL,
       500.0, 'Credit', NULL, 0.0, NULL, 40.0, 'Accrued Liabilities',
       NULL, NULL, NULL, NULL),
      (true, 89, 'JE-10', '2024-02-02 00:00:00', NULL, NULL, NULL,
       NULL, NULL, NULL, 0.0, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      (false, 90, 'JE-11', '2024-02-03 00:00:00', 'no lines', NULL, NULL,
       NULL, NULL, NULL, 0.0, NULL, NULL, NULL, NULL, NULL, NULL, NULL)
    ) t(adjustment, id, doc_number, txn_date, private_note, line_id,
        line_description, line_amount, line_posting_type, line_entity_type,
        line_entity_value, line_entity_name, line_account_value,
        line_account_name, line_class_value, line_class_name,
        line_department_value, line_department_name)
    ORDER BY id, line_id NULLS FIRST"""

  val purchases: String = """
    SELECT payment_type, credit, CAST(total_amt AS DOUBLE) AS total_amt,
      CAST(id AS INT) AS id, CAST(txn_date AS DATE) AS txn_date, private_note,
      CAST(account_ref_value AS INT) AS account_ref_value,
      CAST(entity_ref_value AS INT) AS entity_ref_value, entity_ref_name,
      CAST(line_id AS INT) AS line_id, line_description,
      CAST(line_amount AS DOUBLE) AS line_amount,
      CAST(line_account_value AS INT) AS line_account_value, line_account_name,
      line_billable_status, line_taxcode_value
    FROM (VALUES
      ('Cash', 'true', 25.0, 0, '2024-03-12', NULL, 41, 62, 'Diner',
       1, NULL, 25.0, 13, 'Meals', NULL, NULL),
      ('Cash', 'true', 25.0, 0, '2024-03-12', NULL, 41, 62, 'Diner',
       2, NULL, 0.0, 14, 'Tips', NULL, NULL),
      ('CreditCard', 'false', 89.99, 301, '2024-03-11', 'software', 41, 61,
       'SaaS Co', 1, 'subscription', 89.99, 9, 'Software', 'NotBillable', 'NON')
    ) t(payment_type, credit, total_amt, id, txn_date, private_note,
        account_ref_value, entity_ref_value, entity_ref_name, line_id,
        line_description, line_amount, line_account_value, line_account_name,
        line_billable_status, line_taxcode_value)
    ORDER BY id, line_id"""

  val deposits: String = """
    SELECT CAST(total_amt AS DOUBLE) AS total_amt, CAST(id AS INT) AS id,
      CAST(txn_date AS TIMESTAMP) AS txn_date, private_note, line,
      CAST(dep_val AS INT) AS deposit_to_account_ref_value,
      dep_name AS deposit_to_account_ref_name, currency_ref_value,
      currency_ref_name, doc_number
    FROM (VALUES
      (3200.0, 412, '2024-03-15 00:00:00', 'weekly',
       '[{"Amount":3200.0,"DetailType":"DepositLineDetail"}]',
       12, 'Checking', 'USD', 'United States Dollar', 'D-12'),
      (150.0, 413, '2024-03-16 00:00:00', NULL, NULL,
       12, 'Checking', 'USD', 'United States Dollar', NULL)
    ) t(total_amt, id, txn_date, private_note, line, dep_val, dep_name,
        currency_ref_value, currency_ref_name, doc_number)
    ORDER BY id"""

  val pnl: String = """
    SELECT category, CAST(total_amount AS DOUBLE) AS total_amount, month
    FROM (VALUES
      ('Income', 0.0, 'Jan,2024'), ('Sales', 1000.0, 'Jan,2024'),
      ('Services', 0.0, 'Jan,2024'), ('Consulting', 250.0, 'Jan,2024'),
      ('Total Services', 250.0, 'Jan,2024'), ('Total Income', 1250.0, 'Jan,2024'),
      ('Expenses', 0.0, 'Jan,2024'), ('Freight', 0.0, 'Jan,2024'),
      ('0', 75.5, 'Jan,2024'), ('Total Expenses', 75.5, 'Jan,2024'),
      ('Income', 0.0, 'Feb,2024'), ('Sales', 900.0, 'Feb,2024'),
      ('Total Income', 900.0, 'Feb,2024')
    ) t(category, total_amount, month)
    ORDER BY month, category, total_amount"""

  val transactionList: String = """
    SELECT CAST(date AS DATE) AS date, transaction_type, doc_num, is_no_post,
      name, description, account_name, split, CAST(amount AS DOUBLE) AS amount,
      CAST(start_period AS DATE) AS start_period,
      CAST(end_period AS DATE) AS end_period
    FROM (VALUES
      ('2024-03-05', 'Bill', 'B-1001', 'No', 'Acme Supply', 'note',
       'Accounts Payable', '-SPLIT-', 1250.5, '2022-01-01', '2024-03-31'),
      ('2024-03-20', 'Bill Payment (Check)', 'P-77', 'No', 'Acme Supply', '',
       'Checking', 'Accounts Payable', NULL, '2022-01-01', '2024-03-31')
    ) t(date, transaction_type, doc_num, is_no_post, name, description,
        account_name, split, amount, start_period, end_period)
    ORDER BY date, doc_num"""

  val byVendor: String = """
    SELECT CAST(vendor_id AS INT) AS vendor_id, vendor_name,
      CAST(date AS DATE) AS date, transaction_type, doc_num, posting,
      description, account, CAST(amount AS DOUBLE) AS amount,
      CAST(start_period AS DATE) AS start_period,
      CAST(end_period AS DATE) AS end_period,
      CAST(report_time AS DATE) AS report_time
    FROM (VALUES
      (56, 'Acme Supply', '2024-03-05', 'Bill', 'B-1001', 'Yes', 'note',
       'Accounts Payable', 1250.5, '2015-01-01', '2024-03-31', '2024-04-01'),
      (56, 'Acme Supply', '2024-03-20', 'Bill Payment (Check)', 'P-77', 'Yes',
       '', 'Checking', NULL, '2015-01-01', '2024-03-31', '2024-04-01'),
      (57, 'Beta Parts', NULL, NULL, NULL, NULL, NULL, NULL, NULL,
       '2015-01-01', '2024-03-31', '2024-04-01')
    ) t(vendor_id, vendor_name, date, transaction_type, doc_num, posting,
        description, account, amount, start_period, end_period, report_time)
    ORDER BY vendor_id, date NULLS FIRST"""

  /** [[byVendor]]'s three rows plus page 2's Gamma Co row — the expected
    * union of the S7 paginated fetch (hasMore page 1 + terminal page 2).
    */
  val byVendorPaged: String = """
    SELECT CAST(vendor_id AS INT) AS vendor_id, vendor_name,
      CAST(date AS DATE) AS date, transaction_type, doc_num, posting,
      description, account, CAST(amount AS DOUBLE) AS amount,
      CAST(start_period AS DATE) AS start_period,
      CAST(end_period AS DATE) AS end_period,
      CAST(report_time AS DATE) AS report_time
    FROM (VALUES
      (56, 'Acme Supply', '2024-03-05', 'Bill', 'B-1001', 'Yes', 'note',
       'Accounts Payable', 1250.5, '2015-01-01', '2024-03-31', '2024-04-01'),
      (56, 'Acme Supply', '2024-03-20', 'Bill Payment (Check)', 'P-77', 'Yes',
       '', 'Checking', NULL, '2015-01-01', '2024-03-31', '2024-04-01'),
      (57, 'Beta Parts', NULL, NULL, NULL, NULL, NULL, NULL, NULL,
       '2015-01-01', '2024-03-31', '2024-04-01'),
      (99, 'Gamma Co', '2024-02-02', 'Bill', 'B-2', 'Yes', 'memo',
       'Accounts Payable', 10.0, '2015-01-01', '2024-03-31', '2024-04-01')
    ) t(vendor_id, vendor_name, date, transaction_type, doc_num, posting,
        description, account, amount, start_period, end_period, report_time)
    ORDER BY vendor_id, date NULLS FIRST"""
}
