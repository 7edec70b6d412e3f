package graft

/** Every registered query must execute and return rows at sf0.001 (the
  * value-level check is the driver's DuckDB oracle + tools/compare_oracle.py;
  * this guards against broken plans / empty results slipping into the
  * registry).
  */
class QueriesSmokeSpec extends SparkSpec {
  SparkEntry.allDefs.foreach { q =>
    test(s"${q.name} executes and returns rows on sf0.001") {
      val n = q.fn(spark, sf0001).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }
}
