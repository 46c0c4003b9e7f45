package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QboDataSourceSpec extends SparkSpec {

  test("format(\"qbo\") reads pages as input partitions") {
    val df = spark.read.format("qbo")
      .option("entity", "Bill").option("feed", "bills").load()
    assert(df.count() == 3)
    // two fixture pages → two input partitions (parallel page fetch model)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.select("Id").orderBy("Id").collect().map(_.getString(0)).toSeq
      == Seq("145", "146", "147"))
  }

  test("nested fields parse with from_json semantics") {
    val df = spark.read.format("qbo")
      .option("entity", "Bill").option("feed", "bills").load()
    val v = df.filter(col("Id") === "145")
      .select(col("VendorRef.name"), col("Line")(0)("Amount")).head
    assert(v.getString(0) == "Acme Supply")
    assert(v.getDouble(1) == 1250.5)
  }

  test("column pruning pushes into the source (S7-style projection)") {
    val df = spark.read.format("qbo")
      .option("entity", "Bill").option("feed", "bills").load()
      .select("Id", "Balance")
    val scan = df.queryExecution.executedPlan.toString
    // the scan's output must be just the two pruned columns
    assert(df.count() == 3)
    assert(scan.contains("qbo/Bill"), scan)
    assert(!scan.contains("VendorRef"), scan)
  }

  test("the full Bills pipeline runs on the DSv2 source") {
    import graft.qbo.Entities.Bills
    val raw = spark.read.format("qbo")
      .option("entity", "Bill").option("feed", "bills").load()
    val out = Bills.warehouse(Bills.stage(raw)).orderBy("id").collect()
    assert(out.length == 3)
    assert(out.map(_.getInt(2)).toSeq == Seq(145, 146, 147))
  }

  test("custom feeds register dynamically") {
    QboPageFeeds.register("one_deposit", Seq(
      """{"QueryResponse": {"Deposit": [{"Id": "9", "TotalAmt": 5.0,
         "TxnDate": "2024-06-01"}]}}"""))
    val df = spark.read.format("qbo")
      .option("entity", "Deposit").option("feed", "one_deposit").load()
    assert(df.count() == 1)
  }
}
