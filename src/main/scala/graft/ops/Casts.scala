package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar cast / null-handling helpers (SURVEY §2.4 C1-C8).
  *
  * The reference mixes two cast disciplines: strict pandas `astype`
  * (raises on bad data — qb_bills.py:116-118) and coercing
  * `pd.to_numeric(errors='coerce')` (nulls on bad data —
  * qb_transactionlist.py:93). Spark's non-ANSI cast is exactly the coerce
  * semantics; for the strict path we offer an audit counter instead of a
  * crash (SURVEY §5.5): `failedCasts` counts values that were non-null
  * before the cast and null after.
  */
object Casts {

  /** `pd.to_numeric(errors='coerce')` — C2: null on malformed input.
    * Spark 4 runs ANSI-on by default (plain cast raises, like pandas
    * `astype` C1), so coerce semantics = `try_cast`.
    */
  def coerce(c: Column, t: String): Column = c.try_cast(t)

  /** `fillna(v)` before a cast — C3 (qb_billpayments.py:111-112). */
  def fillThenCast(c: Column, fill: Any, t: DataType): Column =
    coalesce(c, lit(fill)).cast(t)

  /** fillThenCast with a DDL type string. */
  def fillThenCast(c: Column, fill: Any, t: String): Column =
    coalesce(c, lit(fill)).cast(t)

  /** `replace('', pd.NA)` — C4 (qb_profit&loss.py:111). */
  def emptyToNull(c: Column): Column = when(c === "", lit(null)).otherwise(c)

  /** `TO_DATE(s, 'YYYY-MM-DD')` — C6 (qb_bills.py:150). */
  def toDateYmd(c: Column): Column = to_date(c, "yyyy-MM-dd")

  /** `TO_TIMESTAMP(txn_date,'YYYY-MM-DD HH24:MI:SS')` — C7.
    * The reference's format string is wrong for the `YYYY-MM-DD` data it
    * receives (SURVEY §0.1); we implement the declared intent: parse the
    * date and widen to a midnight timestamp.
    */
  def toTimestampYmd(c: Column): Column =
    to_date(c, "yyyy-MM-dd").cast(TimestampType)

  /** `TO_CHAR(TO_DATE(month,'YYYY-MM'),'Mon,YYYY')` — C8
    * (qb_profit&loss.py:148): "2024-01" → "Jan,2024".
    */
  def monthLabel(c: Column): Column =
    date_format(to_date(concat(c, lit("-01")), "yyyy-MM-dd"), "MMM,yyyy")

  /** SURVEY §7 money mode: money columns (balance, total_amt,
    * line_amount) are DoubleType by default — reference parity,
    * qb_bills.py:101 — or exact DecimalType(18,2) when the session sets
    * `spark.graft.money=decimal`. Decimal is the right warehouse type at
    * scale (no float drift when summing billions of cents); double stays
    * the default because the reference's DDL and the oracle twins use
    * DOUBLE PRECISION.
    */
  def moneyType(spark: org.apache.spark.sql.SparkSession): String =
    spark.conf.get("spark.graft.money", "double").trim.toLowerCase match {
      case "decimal" => "decimal(18,2)"
      case "double"  => "double"
      case other => throw new IllegalArgumentException(
        s"spark.graft.money must be 'double' or 'decimal', got '$other'")
    }

  /** Audit metric for strict mode (C1/C5): rows where `c` was present but
    * the cast lost it. Run on the *pre-cast* frame.
    */
  def failedCasts(df: DataFrame, column: String, t: DataType): Long =
    df.filter(col(column).isNotNull &&
      col(column).try_cast(t.catalogString).isNull).count()

  /** Null count data-quality check — C5 (qb_transactionlist.py:99-101). */
  def nullCount(df: DataFrame, column: String): Long =
    df.filter(col(column).isNull).count()
}
