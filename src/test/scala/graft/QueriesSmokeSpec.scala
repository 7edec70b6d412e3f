package graft

/** Every registered query must execute and return rows at sf0.001 (the
  * value-level check is the driver's DuckDB oracle + tools/compare_oracle.py;
  * this guards against broken plans / empty results slipping into the
  * registry).
  */
class QueriesSmokeSpec extends SparkSpec {
  // The pipeline-scenario capstones each pay a multi-store build +
  // crash-replay scenario even at sf0.001 (12-33 s apiece, measured
  // round 18) — slow bucket; every other query smokes in the default
  // pass, and the driver's oracle covers all 227 values regardless.
  private val slowSmoke = Set("q183_pipeline_txn", "q185_pipeline_maintenance",
    "q187_scheduled_retrain", "q191_pipeline_restore")
  SparkEntry.allDefs.foreach { q =>
    if (slowSmoke(q.name))
      test(s"${q.name} executes and returns rows on sf0.001", SlowTest) {
        val n = q.fn(spark, sf0001).count()
        assert(n > 0, s"${q.name} returned 0 rows")
      }
    else
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

  test("QUERIES.md is current: row set equals allDefs, oracle flags match") {
    // The generated index (tools/gen_queries_md.py) must track the
    // registry name-for-name — regenerate it after adding a query.
    // Anchor on the repo root, not the cwd: a forked test JVM may run
    // with a different working directory (round-6 advice). build.sbt is
    // the root marker; walk up from user.dir until it appears.
    val root = Iterator.iterate(new java.io.File(sys.props("user.dir")).getAbsoluteFile)(_.getParentFile)
      .takeWhile(_ != null).take(6)
      .find(dd => new java.io.File(dd, "build.sbt").isFile)
      .getOrElse(fail("repo root (build.sbt) not found above user.dir"))
    val md = scala.io.Source.fromFile(new java.io.File(root, "QUERIES.md"), "UTF-8").getLines().toSeq
    val rows = md.filter(_.startsWith("| q"))
      .map(_.split("\\|").map(_.trim))
      .map(cells => cells(1) -> cells(3)) // name -> oracle yes/no
      .toMap
    val want = SparkEntry.allDefs.map(q => q.name -> (if (q.oracle.isDefined) "yes" else "no")).toMap
    assert(rows.keySet == want.keySet,
      s"QUERIES.md stale: missing=${want.keySet -- rows.keySet} extra=${rows.keySet -- want.keySet}")
    val wrongOracle = rows.filter { case (n, o) => want(n) != o }
    assert(wrongOracle.isEmpty, s"QUERIES.md oracle flags stale: $wrongOracle")
  }
}
