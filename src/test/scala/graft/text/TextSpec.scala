package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("language-ID heuristic on real sentences") {
    val df = Seq(
      (1L, "the cat sat on the mat and looked to the door"),
      (2L, "der Hund ist nicht in das Haus und die Katze"),
      (3L, "le chat est dans les jardins et la maison pour une heure"),
      (4L, "el perro es una mascota y los gatos en la casa"),
      (5L, "zzz qqq xxx")).toDF("id", "text")
    val got = df.select(col("id"), TextFunctions.langIdHeuristic(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "fr")
    assert(got(4L) == "es")
    assert(got(5L) == "und")
  }

  test("fingerprint matches a hand-computed rolling hash") {
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)
    val inputs = Seq("hello world", "a", "", "the quick brown fox")
    val got = inputs.toDF("text")
      .select(TextFunctions.fingerprint(col("text"))).as[Long].collect().toSeq
    assert(got == inputs.map(ref))
  }

  test("shingles guard: fewer tokens than k → empty set, not a crash") {
    val got = Seq("one two", "one two three four").toDF("text")
      .select(TextFunctions.shingleSet(col("text"), 3)).as[Seq[String]].collect()
    assert(got(0).isEmpty)
    assert(got(1) == Seq("one two three", "two three four"))
  }

  test("adjacentPairs: n-1 ordered pairs; one-token and empty arrays → empty, not a crash") {
    val got = Seq("a b c d", "solo", "x y").toDF("text")
      .select(TextFunctions.adjacentPairs(TextFunctions.words(col("text"))))
      .as[Seq[(String, String)]].collect()
    assert(got(0) == Seq(("a", "b"), ("b", "c"), ("c", "d")))
    assert(got(1).isEmpty)
    assert(got(2) == Seq(("x", "y")))
  }

  test("ShingleSetExpr ≡ the HOF shingleSet, bit for bit (incl. order)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val both = docs.select(
      TextFunctions.shingleSet(col("text"), 3).as("hof"),
      graft.functions.GraftFunctions.shingles(spark, col("text")).as("fast"))
    assert(both.filter(col("hof") =!= col("fast")).count() == 0)
    // edge cases: below-k and exactly-k documents
    val edge = Seq("one two", "one two three", "a a a a").toDF("text")
      .select(TextFunctions.shingleSet(col("text"), 3).as("hof"),
        graft.functions.GraftFunctions.shingles(spark, col("text")).as("fast"))
      .collect()
    edge.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r))
  }

  test("ShingleExplodeExpr generator ≡ explode(shingleSet), rows and order") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val viaArray = docs
      .select(col("doc_id"), posexplode(TextFunctions.shingleSet(col("text"), 3)))
      .select("doc_id", "pos", "col")
      .orderBy("doc_id", "pos")
      .collect().map(_.toSeq).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(monotonically_increasing_id())
    val viaGen = docs
      .select(col("doc_id"),
        graft.functions.GraftFunctions.explodeShingles(spark, col("text")))
      .withColumn("pos", row_number().over(w) - 1)
      .select("doc_id", "pos", "shingle")
      .orderBy("doc_id", "pos")
      .collect().map(_.toSeq).toSeq
    assert(viaGen == viaArray)
    // below-k document yields zero rows, not a null row
    val none = Seq((1L, "one two")).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.explodeShingles(spark, col("text")))
    assert(none.count() == 0)
  }

  test("quality signals: stopword ratio and token stats") {
    val ws = TextFunctions.words(col("text"))
    val r = Seq("the a the xyz").toDF("text")
      .select(TextFunctions.stopwordRatio(ws, Seq("the", "a")),
        TextFunctions.avgWordLen(ws)).head
    assert(r.getDouble(0) == 0.75)
    assert(r.getDouble(1) == 2.5) // token lengths 3,1,3,3 → 10/4
  }
}
