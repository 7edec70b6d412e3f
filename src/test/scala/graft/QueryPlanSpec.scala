package graft

/** Plan-shape assertions: the optimizations the engine's scale story
  * depends on must actually appear in the physical plans — filter/column
  * pushdown into the parquet scan, broadcast joins for dimensions,
  * map-side partial aggregation, whole-stage codegen coverage.
  */
class QueryPlanSpec extends SparkSpec {

  /** Executes the query first: under AQE the final plan (with
    * WholeStageCodegen spans and picked join strategies) only
    * materializes after execution.
    */
  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.collect() // finalize THIS dataset's adaptive plan (count() would plan separately)
    df.queryExecution.executedPlan.toString
  }

  test("q02 pushes filter and prunes columns at the parquet scan") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan(l_quantity,45.0)"), p)
    // Pruned read schema: the full-width lineitem columns must be absent.
    assert(!p.contains("l_partkey") && !p.contains("l_shipdate"), p)
  }

  test("q04 broadcasts the nation dimension") {
    val p = plan("q04_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q01 plans map-side partial aggregation before the exchange") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  test("q01 aggregation runs inside whole-stage codegen") {
    val p = plan("q01_pricing_summary")
    // Codegen'd operators carry a "*(n)" stage id in the plan string.
    assert(p.contains("*(1) HashAggregate") || p.contains("*(2) HashAggregate"), p)
  }

  test("q28 custom vector_dot expression stays inside codegen (no fallback)") {
    val p = plan("q28_embedding_neardup")
    assert(p.contains("vector_dot"), p)
    assert(p.contains("*("), p)
  }

  test("q06/q07 plan semi/anti joins (no full join + filter)") {
    assert(plan("q06_semi_join").contains("LeftSemi"), "semi")
    assert(plan("q07_anti_join").contains("LeftAnti"), "anti")
  }

  test("q31 multimodal extraction has no hash shuffle (only the final sort's range exchange)") {
    assert(!plan("q31_multimodal_features").contains("Exchange hashpartitioning"))
  }
}
