package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** SURVEY §5.1 golden pairs + §5.2 properties for the name/flatten/cast
  * core.
  */
class NamesSpec extends AnyFunSuite {

  test("reference golden pairs (R2)") {
    assert(Names.snakeCase("DueDate") == "due_date")
    assert(Names.snakeCase("TxnDate") == "txn_date")
    assert(Names.snakeCase("VendorRef.value") == "vendor_ref_value")
    // the documented quirk: CC → c_c (patched per-entity, R3)
    assert(Names.snakeCase("CreditCardPayment.CCAccountRef.value")
      == "credit_card_payment_c_c_account_ref_value")
    assert(Names.snakeCase("APAccountRef.name") == "a_p_account_ref_name")
    assert(Names.snakeCase("JournalEntryLineDetail.Entity.EntityRef.value")
      == "journal_entry_line_detail_entity_entity_ref_value")
    assert(Names.snakeCase("already_snake") == "already_snake")
  }

  test("idempotence on realistic dotted CamelCase paths") {
    // Realistic QBO paths: CamelCase segments joined by single dots.
    // (On pathological runs of dots the reference's single-pass `__`→`_`
    // collapse is itself non-idempotent, faithfully replicated here.)
    val seg = for {
      h <- Gen.alphaUpperChar
      t <- Gen.listOf(Gen.alphaChar).map(_.mkString)
    } yield s"$h$t"
    val gen = Gen.nonEmptyListOf(seg).map(_.mkString("."))
    (0 until 500).foreach { i =>
      val s = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val once = Names.snakeCase(s)
      assert(Names.snakeCase(once) == once, s"input '$s' → '$once'")
      assert(!once.contains('.') && once.toLowerCase == once)
    }
  }
}

class FlattenSpec extends SparkSpec {
  test("nested structs flatten to snake_case leaf columns (P1)") {
    val schema = StructType(Seq(
      StructField("Id", StringType),
      StructField("VendorRef", StructType(Seq(
        StructField("value", StringType), StructField("name", StringType)))),
      StructField("Tags", ArrayType(StringType))))
    val df = spark.createDataFrame(
      java.util.List.of(Row("1", Row("56", "Acme"), null)), schema)
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSeq == Seq("id", "vendor_ref_value", "vendor_ref_name", "tags"))
    assert(flat.head.getString(1) == "56")
  }
}

class LinesSpec extends SparkSpec {
  import graft.qbo.{Fixtures, QboSource, Schemas}

  test("explode_outer keeps rows for empty and missing Line (P2 trap)") {
    val raw = QboSource.entityFrame(spark, "JournalEntry",
      Fixtures.journalEntryPages, Schemas.journalEntry)
    val exploded = Lines.explodeLines(
      raw.select(col("Id").as("id"), col("Line").as("line")), "line",
      renames = Map("id" -> "line_id"))
    // entry 88 → 2 rows; 89 (Line: []) and 90 (no Line) → 1 null row each
    assert(exploded.count() == 4)
    assert(exploded.filter(col("id").isin("89", "90")).count() == 2)
  }

  test("explode row-count invariant: sum(sizes) + count(empty-or-null)") {
    // SURVEY §5.2: |explode_outer(df)| == Σ size(line) + #rows with
    // empty/missing line
    val raw = QboSource.entityFrame(spark, "JournalEntry",
      Fixtures.journalEntryPages, Schemas.journalEntry)
      .select(col("Id").as("id"), col("Line").as("line"))
    val exploded = Lines.explodeLines(raw, "line", Map("id" -> "line_id")).count()
    val stats = raw.agg(
      sum(when(size(col("line")) > 0, size(col("line"))).otherwise(0)),
      count(when(col("line").isNull || size(col("line")) === 0, 1))).head
    assert(exploded == stats.getLong(0) + stats.getLong(1))
  }

  test("stringify emits valid JSON, not Python repr (P5 deviation)") {
    val raw = QboSource.entityFrame(spark, "Deposit",
      Fixtures.depositPages, Schemas.deposit)
    val s = Lines.stringify(raw.select(col("Id").as("id"), col("Line").as("line")), "line")
      .filter(col("id") === "412").head.getString(1)
    assert(s == """[{"Amount":3200.0,"DetailType":"DepositLineDetail"}]""")
  }
}

class CastsSpec extends SparkSpec {
  import spark.implicits._

  test("coerce nulls malformed input (C2), ANSI stays on elsewhere") {
    val df = Seq("12", "abc", "").toDF("s")
    val got = df.select(Casts.coerce(col("s"), "int")).as[Option[Int]].collect().toSeq
    assert(got == Seq(Some(12), None, None))
  }

  test("date/timestamp/label casts (C6-C8)") {
    val df = Seq(("2024-03-05", "2024-01")).toDF("d", "m")
    val r = df.select(
      Casts.toDateYmd(col("d")),
      Casts.toTimestampYmd(col("d")),
      Casts.monthLabel(col("m"))).head
    assert(r.getDate(0).toString == "2024-03-05")
    assert(r.getTimestamp(1).toString == "2024-03-05 00:00:00.0")
    assert(r.getString(2) == "Jan,2024")
  }

  test("failedCasts audit counter (C1 strict-mode answer)") {
    val df = Seq("1", "x", null).toDF("s")
    assert(Casts.failedCasts(df, "s", IntegerType) == 1)
    assert(Casts.nullCount(df, "s") == 1)
  }
}
