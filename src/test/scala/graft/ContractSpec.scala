package graft

/** Driver-contract invariants: violations here break the correctness
  * gate silently (duplicate output columns fail the parquet write;
  * orphan oracle keys make the driver diff phantom queries), so they are
  * pinned as tests. Schema checks are plan-only — nothing executes.
  */
class ContractSpec extends SparkSpec {

  test("registry names are unique and oracle keys all resolve") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 70)
  }

  test("every query plans with distinct, non-empty output columns") {
    SparkEntry.registry.foreach { q =>
      val cols = q.run(spark, sfDir).columns.toSeq
      assert(cols.nonEmpty, q.name)
      assert(cols.distinct.size == cols.size,
        s"${q.name} has duplicate output columns: $cols")
    }
  }

  test("entry() smoke: flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
