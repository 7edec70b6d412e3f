package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational operator surface over the TPC-H-ish star schema
  * (SURVEY.md §2 generalization + §7 step 6): scan/filter/project with
  * pushdown, hash & broadcast joins, semi/anti joins, partial+final
  * aggregation, distinct aggregation, rollup, window functions, top-k,
  * set operations, scalar/date/JSON functions.
  *
  * Scale notes per query are inline; the common ones: filters and column
  * pruning reach the parquet scan (verified via explain in
  * QueryPlanSpec), dimension joins are broadcast, fact-fact joins shuffle
  * on their join key and AQE handles skew.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: partial aggregation map-side, 6-group
    * output — shuffles only the tiny partial-agg state at any scale.
    */
  private def q01(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_discount")), 2).as("avg_disc"),
        count(lit(1)).as("count_order"),
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Selective filter + narrow projection: both the predicate and the
    * 4-column read schema must reach the parquet scan (no full-width read).
    */
  private def q02(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Fact-fact join + aggregate + deterministic top-k. The aggregation
    * runs BELOW the join (same key, l_orderkey == o_orderkey), so the
    * shuffle carries one narrow partial-agg row per order instead of
    * every full-width lineitem row, and the join's probe side arrives
    * already co-partitioned on the join key. The final top-10 plans as
    * TakeOrderedAndProject (no global sort).
    */
  private def q03(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"),
        count(lit(1)).as("n_items"),
      )
    val o = Tables.orders(s, d).where(col("o_orderstatus") === "O").select(col("o_orderkey"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), round(col("rev"), 2).as("revenue"), col("n_items"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Multi-join with broadcast dimension (nation is 25 rows at any SF).
    * lineitem pre-aggregates to one revenue row per order below the join
    * (grouping key == join key), so both fact shuffles move order-grain
    * rows, not lineitem-grain; the nation sum then just re-aggregates the
    * per-order partials (sum-of-sums, same value within float noise the
    * 2-digit rounding absorbs).
    */
  private def q04(s: SparkSession, d: String): DataFrame = {
    val lAgg = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(s, d)
    lAgg.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("rev")), 2).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** Hierarchical rollup over broadcast-joined dims (region->nation). */
  private def q05(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 2).as("total_acctbal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_customers"),
        col("total_acctbal"),
      )
      .orderBy(col("region_name"), col("nation_name"))
  }

  /** Left-semi join (EXISTS): customers with at least one open order. */
  private def q06(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).where(col("o_orderstatus") === "P")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (NOT EXISTS): customers with no pending order. */
  private def q07(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).where(col("o_orderstatus") === "P")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** Per-group top-k via ranking window (row_number, full tie-break). */
  private def q08(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(s, d)
      .select(
        col("p_brand"), col("p_partkey"), col("p_retailprice"),
        row_number().over(w).cast("long").as("rn"))
      .where(col("rn") <= 3)
      .orderBy(col("p_brand"), col("rn"))
  }

  /** Running-total window over a deterministic frame order. */
  private def q09(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        row_number().over(w).cast("long").as("rn"),
        round(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2)
          .as("running_total"),
      )
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** RANGE-frame window: 30-day trailing revenue per customer. Unlike
    * q09's ROWS frame, the frame bound is a VALUE distance on the order
    * key (all same-day peers enter together), computed over integer
    * epoch-days so the frame arithmetic is exact in both engines.
    */
  private def q47(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d")).rangeBetween(-30, 0)
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("d"),
        col("o_totalprice"))
      .withColumn("trailing30", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("d"), col("trailing30"))
      .orderBy(col("o_custkey"), col("d"), col("o_orderkey"))
  }

  /** Exact distinct aggregation (count-distinct expands + reshuffles). */
  private def q10(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"),
      )
      .orderBy(col("l_returnflag"))

  /** Set operators: UNION (distinct), INTERSECT, EXCEPT on key sets. */
  private def q11(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val building = c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val rich = c.where(col("c_acctbal") > 7000).select(col("c_custkey"))
    def tagCount(df: DataFrame, tag: String): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(tag).as("op"), col("n"))
    tagCount(building.union(rich).distinct(), "building_or_rich")
      .unionAll(tagCount(building.intersect(rich), "building_and_rich"))
      .unionAll(tagCount(building.except(rich), "building_not_rich"))
      .orderBy(col("op"))
  }

  /** Scalar-function gamut: string, math, conditional, modulo. */
  private def q12(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        lower(col("p_type")).as("type_l"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 5).as("name_pre"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        abs(col("p_size") - 25).as("size_dev"),
        round(col("p_retailprice") * 1.1, 2).as("inflated"),
        when(col("p_size") >= 25, "large").otherwise("small").as("size_class"),
        (col("p_partkey") % 7).as("bucket7"),
      )
      .orderBy(col("p_partkey"))

  /** Date-part extraction + aggregation (timestamps never in output). */
  private def q13(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mon"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("yr"), col("mon"))

  /** Event-time bucketing on the nanosecond epoch. events.ts reads as Long
    * (nanosAsLong); `div` keeps the bucket arithmetic in exact integer
    * space — a double division would lose sub-256ns precision at 2024
    * epochs and mis-bucket boundary events.
    */
  private def q14(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(
        expr("ts div 300000000000").as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("bucket"), col("event_type"))

  /** JSON scalar extraction over the events.props payload. */
  private def q15(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        round(avg(col("k")), 2).as("avg_k"),
        max(col("k")).as("max_k"),
        min(col("k")).as("min_k"),
      )
      .orderBy(col("event_type"))

  /** The SQL API surface: the same engine drives `spark.sql(...)` over
    * registered views — Catalyst plans the text exactly as it plans the
    * DataFrame API (the oracle runs the identical statement).
    */
  private def q50(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  /** lead/lag offset window: per-user inter-event gap in exact integer
    * microseconds (the gap-analysis primitive sessionization builds on;
    * first event's gap is 0 via coalesce).
    */
  private def q53(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("t_us"))
      .withColumn("gap_us", col("t_us") - coalesce(lag(col("t_us"), 1).over(w), col("t_us")))
      .select(col("user_id"), col("event_id"), col("t_us"), col("gap_us"))
      .orderBy(col("user_id"), col("t_us"), col("event_id"))
  }

  /** Statistical aggregates: sample stddev, correlation, covariance per
    * group. Built-in stddev/corr/covar accumulate float moments in a
    * partition-dependent order, so their low bits are not engine-portable
    * (r2 shipped that version and it failed the oracle hash). Instead the
    * moments are EXACT integer sums over centi-quantized inputs (decimal
    * sums on the Spark side, HUGEINT on DuckDB's — both exact), and the
    * statistics derive from those via an identical IEEE-double formula, so
    * the output doubles are bit-identical with no rounding needed. Still
    * one partial-aggregating shuffle: the sums merge associatively, same
    * as the built-in moment sketch.
    */
  private def q54(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        expr("CAST(round(l_quantity * 100) AS DECIMAL(18,0))").as("qx"),
        expr("CAST(round(l_extendedprice * 100) AS DECIMAL(18,0))").as("px"),
        expr("CAST(round(l_discount * 100) AS DECIMAL(18,0))").as("dx"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("qx")).as("sq"), sum(col("qx") * col("qx")).as("sqq"),
        sum(col("px")).as("sp"), sum(col("px") * col("px")).as("spp"),
        sum(col("dx")).as("sd"), sum(col("qx") * col("px")).as("sqp"),
        sum(col("qx") * col("dx")).as("sqd"))
      .select(col("l_returnflag"),
        expr("sqrt(CAST(n*sqq - sq*sq AS DOUBLE) / CAST(n*(n-1) AS DOUBLE)) / CAST(100 AS DOUBLE)")
          .as("sd_qty"),
        expr("CAST(n*sqp - sq*sp AS DOUBLE) / sqrt(CAST(n*sqq - sq*sq AS DOUBLE) * CAST(n*spp - sp*sp AS DOUBLE))")
          .as("corr_qty_price"),
        expr("CAST(n*sqd - sq*sd AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / CAST(10000 AS DOUBLE)")
          .as("cov_qty_disc"))
      .orderBy(col("l_returnflag"))

  /** Explicit GROUPING SETS with grouping_id: two independent single-
    * dimension aggregates plus the grand total in ONE pass over the join
    * (Spark expands the sets map-side; no per-set rescan), disambiguated
    * by the same grouping_id bit vector DuckDB computes. Complements
    * q05's ROLLUP and q38's CUBE — the three cover the whole multi-
    * dimensional aggregation surface.
    */
  private def q59(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("r_name")), Seq(col("n_name")), Seq()),
        col("r_name"), col("n_name"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_acctbal"))
      .select(
        col("gid"),
        coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_customers"), col("total_acctbal"))
      .orderBy(col("gid"), col("region_name"), col("nation_name"))

  /** Quantile binning: ntile quartiles plus percent_rank/cume_dist in
    * integer milli-units per order within its priority class. The ranks
    * are integer ratios computed by one IEEE division in both engines
    * (then floor-scaled), so no float boundary survives to the output —
    * the binning primitive for length-balanced batch construction.
    */
  private def q61(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pr_milli", floor(percent_rank().over(w) * 1000).cast("long"))
      .withColumn("cd_milli", floor(cume_dist().over(w) * 1000).cast("long"))
      .orderBy(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
  }

  /** Multiset set operations — INTERSECT ALL / EXCEPT ALL keep
    * per-element multiplicities (min / truncated-difference of the two
    * sides' counts), which q11's distinct variants erase. Spark plans
    * both as a single aggregation over tagged counts, no row explosion.
    */
  private def q72(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val a = o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
    val b = o.where(col("o_orderstatus") === "F").select(col("o_custkey"))
    val ia = a.intersectAll(b).agg(count(lit(1)).as("n"))
      .select(lit("intersect_all").as("op"), col("n"))
    val ea = a.exceptAll(b).agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), col("n"))
    ia.union(ea).orderBy(col("op"))
  }

  /** FULL OUTER join — the one join type the rest of the surface doesn't
    * exercise (inner/left q03-q05, semi q06, anti q07, range q39, as-of
    * q35). BUILDING-segment customers against per-customer pending-order
    * counts: both sides contribute unmatched rows, and the reconciliation
    * columns (has_customer/has_orders) make the outer semantics
    * observable. Plans as one shuffle per side on the join key.
    */
  private def q65(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_acctbal"))
    val pend = Tables.orders(s, d)
      .where(col("o_orderstatus") === "P")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_pending"))
    cust.join(pend, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_custkey").isNotNull.cast("long").as("has_customer"),
        col("o_custkey").isNotNull.cast("long").as("has_orders"),
        coalesce(col("n_pending"), lit(0L)).as("n_pending"),
        coalesce(col("c_acctbal"), lit(-1.0)).as("acctbal"))
      .orderBy(col("custkey"))
  }

  /** Correlated scalar subqueries through the SQL planner: customers
    * whose balance beats their nation's average. Catalyst decorrelates
    * the subqueries into an aggregated join — the rewrite this query
    * exists to exercise (plan-asserted: no per-row subplan survives).
    * The comparison cross-multiplies centi-quantized integers
    * (bal*100*count > sum) so no float average ever exists to disagree
    * on a boundary row.
    */
  private def q66(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT c_custkey, c_name FROM customer_v c
        |WHERE CAST(round(c_acctbal * 100) AS BIGINT) *
        |      (SELECT count(*) FROM customer_v c2 WHERE c2.c_nationkey = c.c_nationkey)
        |    > (SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |       FROM customer_v c2 WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** UNPIVOT (wide -> long): one row per (part, metric). The inverse of
    * q44's pivot; plans as a generator over the row, no shuffle until
    * the final ordering.
    */
  private def q52(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("size"),
        col("p_retailprice").as("retail"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("retail")), "metric", "value")
      .orderBy(col("p_partkey"), col("metric"))

  /** Pure theta join (no equi key anywhere): classify every lineitem
    * into a price band by range membership against a band TABLE. The
    * only join strategy that can execute this is a nested loop, and the
    * only admissible nested loop at 100 TB is broadcast-inner-side —
    * which is exactly what a band/dimension table is (rows = band
    * count, forever). Plan-asserted BroadcastNestedLoopJoin in
    * QueryPlanSpec. When bands are STATIC this rewrites to a CASE
    * projection; the join form is for band tables that arrive as data.
    */
  private def q98(s: SparkSession, d: String): DataFrame = {
    val spark0 = s
    import spark0.implicits._
    val bands = Seq(
      ("b0_under_20k", 0.0, 20000.0), ("b1_20_40k", 20000.0, 40000.0),
      ("b2_40_60k", 40000.0, 60000.0), ("b3_60_80k", 60000.0, 80000.0),
      ("b4_80k_plus", 80000.0, 1e12)).toDF("band", "lo", "hi")
    Tables.lineitem(s, d)
      .join(broadcast(bands),
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("band"))
  }

  /** Per-group exact least-squares trend (value vs event time): the
    * drift-detection aggregate, via the q54 exactness recipe — moments
    * are EXACT integer sums (decimal(38,0) here, HUGEINT in the oracle;
    * x recentered to a fixed epoch so magnitudes stay small, y
    * centi-quantized), and slope/intercept derive from them through the
    * IDENTICAL IEEE-double spelling on both engines, so the output
    * doubles are bit-identical with no rounding. The n*sxx - sx*sx
    * variance combination runs in double space (q62's overflow note: at
    * extreme group sizes the exact product can top decimal(38); doubles
    * carry the magnitude, exactness lives in the inputs). One partial-agg
    * shuffle; the regression itself is O(groups).
    */
  private def q104(s: SparkSession, d: String): DataFrame = {
    // num/den spelled once, inlined twice — Catalyst CSEs the copies.
    val num = "(CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))"
    val den = "(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))"
    Tables.events(s, d)
      .select(col("event_type"),
        (expr("ts div 1000000000") - lit(1704067200L)).cast("decimal(38,0)").as("x"),
        expr("CAST(round(value * 100) AS DECIMAL(38,0))").as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n"),
        expr(s"$num / $den * CAST(86400 AS DOUBLE) / CAST(100 AS DOUBLE)")
          .as("slope_per_day"),
        expr(s"(CAST(sy AS DOUBLE) - $num / $den * CAST(sx AS DOUBLE))" +
          " / CAST(n AS DOUBLE) / CAST(100 AS DOUBLE)").as("intercept"))
      .orderBy(col("event_type"))
  }

  /** Columns profiled by q110, with the type normalization applied on
    * BOTH engines before aggregating (timestamp -> date so no timestamp
    * reaches the output; double -> decimal(18,2) so the min/max string
    * rendering agrees). min/max aggregate on the NATIVE type and cast to
    * string after — casting first would rank "10" < "9".
    */
  private val profileCols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "l_orderkey",
    "l_linenumber" -> "CAST(l_linenumber AS BIGINT)",
    "l_quantity" -> "CAST(l_quantity AS DECIMAL(18,2))",
    "l_returnflag" -> "l_returnflag",
    "l_shipdate" -> "CAST(l_shipdate AS DATE)",
  )

  /** Table profiler — the data-quality summary an ingest runs before
    * trusting a new source: per column, non-null count, exact distinct
    * count, and min/max. Two deliberately-separated passes, because the
    * single-aggregation spelling (count + countDistinct + min/max
    * together) forces Catalyst's distinct rewrite into a SortAggregate
    * keyed by every profiled column — min/max carry string buffers that
    * disqualify hash aggregation, so the whole |columns|-times-expanded
    * stream gets SORTED (measured at sf0.1: 7.5 s fused vs 1.2 s warm
    * for this split; A/B recorded in Scratch):
    *   1. count/min/max: one KEYLESS aggregation (a keyless
    *      SortAggregate folds without sorting anything);
    *   2. distinct: stack() each row into (col_name, value-as-string)
    *      — injective for the normalized types — then two pure-distinct
    *      HashAggregates (mutable buffers only, map-side partial dedup
    *      kills the per-column duplicate mass before the one shuffle).
    * The two tiny results (1 row; |columns| rows) broadcast-join into
    * the per-column profile. The oracle is GENERATED from the same
    * [[profileCols]] list, so engine and oracle cannot profile
    * different columns.
    */
  private def q110(s: SparkSession, d: String): DataFrame = {
    val t = Tables.lineitem(s, d).selectExpr(
      profileCols.map { case (n, e) => s"$e AS $n" }: _*)
    val aggs = profileCols.flatMap { case (n, _) =>
      Seq(count(col(n)).as(s"${n}_n"),
        min(col(n)).cast("string").as(s"${n}_min"),
        max(col(n)).cast("string").as(s"${n}_max"))
    }
    val basicStack = profileCols
      .map { case (n, _) => s"'$n', ${n}_n, ${n}_min, ${n}_max" }
      .mkString(", ")
    val basic = t.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${profileCols.size}, $basicStack)" +
        " AS (col_name, n_nonnull, min_s, max_s)"))
    val valueStack = profileCols
      .map { case (n, _) => s"'$n', CAST($n AS STRING)" }.mkString(", ")
    val dist = t
      .select(expr(s"stack(${profileCols.size}, $valueStack) AS (col_name, v)"))
      .where(col("v").isNotNull)
      .groupBy(col("col_name"), col("v")).agg(lit(1))
      .groupBy(col("col_name")).agg(count(lit(1)).as("n_distinct"))
    basic.join(broadcast(dist), "col_name")
      .select(col("col_name"), col("n_nonnull"), col("n_distinct"),
        col("min_s"), col("max_s"))
      .orderBy(col("col_name"))
  }

  private def profileSql: String =
    profileCols.map { case (n, e) =>
      s"""SELECT '$n' AS col_name, CAST(count($e) AS BIGINT) AS n_nonnull,
         |  CAST(count(DISTINCT $e) AS BIGINT) AS n_distinct,
         |  CAST(min($e) AS VARCHAR) AS min_s, CAST(max($e) AS VARCHAR) AS max_s
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  /** 2-D skyline (Pareto frontier): the parts no other part beats on
    * BOTH size and price — dominance queries are the classic shape that
    * tempts an all-pairs NOT EXISTS (the oracle runs exactly that,
    * because it can). The engine instead dedupes to distinct (size,
    * price) points and runs ONE dominance sweep: in (size asc, price
    * asc) order over distinct points, a point is dominated iff ANY
    * earlier point has price <= its price — so the exclusive running
    * minimum of price decides every row, and that running min rides the
    * [[graft.operators.PrefixSum.withRunningMinExclusive]] two-level
    * decomposition (bucketed by size band, a function of the leading
    * order column). No self-join, no quadratic anything: one dedup
    * shuffle + one banded sweep, at any scale. Prices compare in exact
    * centi integers (no float boundary on the frontier).
    */
  private def q111(s: SparkSession, d: String): DataFrame = {
    import graft.operators.PrefixSum
    val pts = Tables.part(s, d)
      .select(col("p_size"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("price_centi"))
      .groupBy(col("p_size"), col("price_centi"))
      .agg(count(lit(1)).as("n_parts"))
    PrefixSum.withRunningMinExclusive(
      pts.withColumn("bkt", expr("p_size div 5")),
      Seq.empty, "bkt", Seq("p_size", "price_centi"), "price_centi", "best")
      .where(col("best").isNull || col("best") > col("price_centi"))
      .select(col("p_size"), col("price_centi"), col("n_parts"))
      .orderBy(col("p_size"), col("price_centi"))
  }

  /** Referential-integrity audit: orphan counts for every FK edge of the
    * schema in one result. Each edge is a LEFT ANTI join on the key (a
    * NULL FK never matches, so it counts as an orphan — the audit
    * semantics a loader wants) aggregated to a single count; small
    * parents broadcast, the one big-big edge (lineitem -> orders)
    * shuffles on the key it would shuffle on anyway. The per-edge
    * aggregates are scalars, so the union glue is free — the whole
    * audit costs one pass over each child table.
    */
  private def q119(s: SparkSession, d: String): DataFrame = {
    def edge(name: String, child: DataFrame, key: String,
        parent: DataFrame, pk: String): DataFrame =
      child.agg(count(lit(1)).as("n_rows")).crossJoin(
        child.select(col(key)).join(parent.select(col(pk).as(key)), Seq(key), "left_anti")
          .agg(count(lit(1)).as("n_orphans")))
        .select(lit(name).as("edge"), col("n_rows"), col("n_orphans"))
    val li = Tables.lineitem(s, d); val o = Tables.orders(s, d)
    Seq(
      edge("customer.nationkey", Tables.customer(s, d), "c_nationkey", Tables.nation(s, d), "n_nationkey"),
      edge("lineitem.orderkey", li, "l_orderkey", o, "o_orderkey"),
      edge("lineitem.partkey", li, "l_partkey", Tables.part(s, d), "p_partkey"),
      edge("lineitem.suppkey", li, "l_suppkey", Tables.supplier(s, d), "s_suppkey"),
      edge("nation.regionkey", Tables.nation(s, d), "n_regionkey", Tables.region(s, d), "r_regionkey"),
      edge("orders.custkey", o, "o_custkey", Tables.customer(s, d), "c_custkey"),
      edge("supplier.nationkey", Tables.supplier(s, d), "s_nationkey", Tables.nation(s, d), "n_nationkey"),
    ).reduce(_ unionByName _).orderBy(col("edge"))
  }

  /** q126's measure columns (output order) with short moment keys. */
  private val corrVars: Seq[(String, String)] = Seq(
    "disc" -> "l_discount", "price" -> "l_extendedprice",
    "qty" -> "l_quantity", "tax" -> "l_tax")

  /** Exact-integer quantization of a q126 measure; `big` is the
    * engine's wide-integer type (DECIMAL(38,0) on Spark, HUGEINT in the
    * oracle) so corpus-scale moment sums cannot wrap.
    */
  private def corrQuant(c: String, big: String): String =
    s"CAST(round($c * 100) AS $big)"

  /** One Pearson cell from the named integer moments, spelled once and
    * evaluated verbatim by BOTH engines (the q54/q104 recipe): every
    * double op is correctly-rounded IEEE over identical integer inputs,
    * so the result is bit-identical with no rounding in the output.
    */
  private def corrCell(a: String, b: String): String = {
    def num(x: String, y: String) =
      s"(CAST(n AS DOUBLE)*CAST(s_${x}_$y AS DOUBLE)" +
        s" - CAST(s_$x AS DOUBLE)*CAST(s_$y AS DOUBLE))"
    s"${num(a, b)} / (sqrt(${num(a, a)}) * sqrt(${num(b, b)}))"
  }

  private def corrMoments(big: String): Seq[String] =
    corrVars.map { case (k, c) => s"sum(${corrQuant(c, big)}) AS s_$k" } ++
      (for { i <- corrVars.indices; j <- i until corrVars.size } yield
        s"sum(${corrQuant(corrVars(i)._2, big)} * ${corrQuant(corrVars(j)._2, big)})" +
          s" AS s_${corrVars(i)._1}_${corrVars(j)._1}")

  /** Engine spelling of [[corrMoments]] (round 17, guide §1.2 "per-task
    * work"): the PER-ROW product runs in BIGINT — two centi-quantized
    * lineitem measures are each <= ~1.1e7, so every product is
    * <= ~1.3e14, five orders of magnitude inside Long range at ANY
    * corpus size (the bound is per-row, not per-sum) — and only the
    * SUM accumulates in DECIMAL(38,0). The previous spelling cast each
    * factor to DECIMAL(38,0) first, making every row pay a checked
    * 38-digit decimal multiply (interpreted BigDecimal, no codegen
    * fast path): measured 1.60 s for the moment scan at sf0.1 vs
    * 0.5 s with the long product. Same integers, same moments, same
    * bit-identical correlation cells.
    */
  private def corrMomentsEngine: Seq[String] = {
    def q(c: String) = corrQuant(c, "BIGINT")
    corrVars.map { case (k, c) =>
      s"sum(CAST(${q(c)} AS DECIMAL(38,0))) AS s_$k" } ++
      (for { i <- corrVars.indices; j <- i until corrVars.size } yield
        s"sum(CAST(${q(corrVars(i)._2)} * ${q(corrVars(j)._2)} AS DECIMAL(38,0)))" +
          s" AS s_${corrVars(i)._1}_${corrVars(j)._1}")
  }

  /** Pairwise Pearson correlation matrix over the lineitem measures —
    * the feature-redundancy screen run before any modeling pass. ONE
    * corpus scan computes every first/second integer moment (centi-
    * quantized, decimal-38 accumulators — map-side combinable, a
    * 15-number result); the 6 correlation cells are then pure
    * arithmetic over that 1-row table in the shared bit-identical
    * spelling. Adding a measure costs two moments, not a scan.
    */
  /** q126's moment aggregate BEFORE the localCheckpoint — exposed so
    * ExplainDump can show the scan plan the checkpoint hides (the
    * round-17 BIGINT-product rewrite lives here; the committed r17
    * dumps only captured the post-checkpoint cell union).
    */
  private[graft] def q126Moments(s: SparkSession, d: String): DataFrame = {
    val aggs = (s"count(1) AS n" +: corrMomentsEngine).map(expr)
    Tables.lineitem(s, d).agg(aggs.head, aggs.tail: _*)
  }

  private def q126(s: SparkSession, d: String): DataFrame = {
    val m = q126Moments(s, d).localCheckpoint()
    val cells = for { i <- corrVars.indices; j <- i + 1 until corrVars.size } yield
      m.select(
        lit(corrVars(i)._1).as("var_a"), lit(corrVars(j)._1).as("var_b"),
        expr(corrCell(corrVars(i)._1, corrVars(j)._1)).as("corr"))
    cells.reduce(_ unionByName _).orderBy(col("var_a"), col("var_b"))
  }

  /** Benford expected first-digit frequencies, milli grain: the SAME
    * literals feed the engine expression and the oracle SQL (generated
    * from this one map), so the two sides cannot drift.
    */
  val benfordMilli: Seq[(Int, Long)] = Seq(
    1 -> 301L, 2 -> 176L, 3 -> 124L, 4 -> 96L, 5 -> 79L,
    6 -> 66L, 7 -> 57L, 8 -> 51L, 9 -> 45L)

  /** Benford first-digit audit over order totals — the fraud/data-quality
    * screen: the distribution of leading digits of o_totalprice against
    * Benford's law, with per-digit deviation in exact integer milli.
    * The leading digit is taken from the CENTI-integer total's decimal
    * string (exact on both engines — no float log10 near power-of-ten
    * boundaries); frequencies are floor(1000·n/N). One map-side-
    * combinable pass over orders; the 9-row digit table joins the
    * single-row total at grid size.
    */
  private def q142(s: SparkSession, d: String): DataFrame = {
    val expected = benfordMilli.foldLeft(lit(0L)) { case (acc, (dig, m)) =>
      when(col("digit") === dig, lit(m)).otherwise(acc)
    }
    val digits = Tables.orders(s, d)
      .select(substring(expr("CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
    val tot = digits.agg(sum(col("n_orders")).as("n_total"))
    digits.crossJoin(broadcast(tot))
      .withColumn("freq_milli", expr("(1000 * n_orders) div n_total"))
      .withColumn("benford_milli", expected)
      .withColumn("dev_milli", abs(col("freq_milli") - col("benford_milli")))
      .select(col("digit"), col("n_orders"), col("freq_milli"),
        col("benford_milli"), col("dev_milli"))
      .orderBy(col("digit"))
  }

  /** Declarative DATA-QUALITY GATES — the validation pass a training
    * pipeline runs before consuming a table (the constraints/
    * expectations layer of a lakehouse): NOT NULL, value ranges, domain
    * membership, key uniqueness, referential integrity, and a
    * cross-table business rule, each emitted as a (rule, violations,
    * pass) report row rather than a failure — violations are DATA here
    * (the synthetic lineitem genuinely repeats its natural key, and the
    * report shows it). Cost shape at 100 TB: all row-grain rules for a
    * table fold into ONE aggregation pass (conditional counts share the
    * scan); uniqueness is a distinct-aggregate in the same pass;
    * referential integrity is one anti-join per FK (broadcast or
    * sort-merge, never a cartesian); the cross-field rule rides the
    * ordinary equi-join. Nothing driver-side beyond the bounded report.
    */
  private def q163(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    // All lineitem row-grain rules + key uniqueness: ONE scan, one
    // aggregation, then stack() pivots the single summary row into
    // report rows (plan-asserted one-scan in QueryPlanSpec).
    val lRules = l.agg(
      sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("v_null"),
      sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L)).as("v_qty"),
      sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("v_price"),
      sum(when(!col("l_discount").between(0, 0.1), 1L).otherwise(0L)).as("v_disc"),
      (count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber"))).as("v_uniq"))
      .select(expr(
        """stack(5,
          |  'lineitem_orderkey_not_null', v_null,
          |  'lineitem_quantity_range', v_qty,
          |  'lineitem_price_positive', v_price,
          |  'lineitem_discount_range', v_disc,
          |  'lineitem_pk_unique', v_uniq) AS (rule, violations)""".stripMargin))
    val oRules = o.agg(
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)).as("v_status"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v_total"))
      .select(expr(
        """stack(2,
          |  'orders_status_domain', v_status,
          |  'orders_totalprice_positive', v_total) AS (rule, violations)""".stripMargin))
    val riLineOrders = l.select(col("l_orderkey"))
      .join(o.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("lineitem_orders_ri").as("rule"), col("violations"))
    val riOrdersCust = o.select(col("o_custkey"))
      .join(c.select(col("c_custkey")), col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("orders_customer_ri").as("rule"), col("violations"))
    val shipBeforeOrder = l.select(col("l_orderkey"), col("l_shipdate"))
      .join(o.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .agg(sum(when(col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L)).as("violations"))
      .select(lit("ship_after_order").as("rule"), col("violations"))
    Seq(lRules, oRules, riLineOrders, riOrdersCust, shipBeforeOrder)
      .reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy(col("rule"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q163_quality_gates", q163, Some(
      """WITH v AS (
        |  SELECT 'lineitem_orderkey_not_null' AS rule,
        |    CAST(count(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT) AS violations
        |  FROM lineitem
        |  UNION ALL SELECT 'lineitem_quantity_range',
        |    CAST(count(*) FILTER (WHERE NOT (l_quantity BETWEEN 1 AND 50)) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL SELECT 'lineitem_price_positive',
        |    CAST(count(*) FILTER (WHERE l_extendedprice <= 0) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'lineitem_discount_range',
        |    CAST(count(*) FILTER (WHERE NOT (l_discount BETWEEN 0 AND 0.1)) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL SELECT 'lineitem_pk_unique',
        |    CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL SELECT 'lineitem_orders_ri', CAST(count(*) AS BIGINT)
        |  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderkey IS NULL
        |  UNION ALL SELECT 'orders_customer_ri', CAST(count(*) AS BIGINT)
        |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |  WHERE c_custkey IS NULL
        |  UNION ALL SELECT 'orders_status_domain',
        |    CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
        |  FROM orders
        |  UNION ALL SELECT 'orders_totalprice_positive',
        |    CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'ship_after_order', CAST(count(*) AS BIGINT)
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate < o_orderdate)
        |SELECT rule, violations, violations = 0 AS pass
        |FROM v ORDER BY rule""".stripMargin)),
    QueryDef("q142_benford_audit", q142, Some {
      val cases = benfordMilli
        .map { case (dig, m) => s"WHEN digit = $dig THEN $m" }.mkString(" ")
      s"""WITH dg AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
         |        AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM orders),
         |h AS (SELECT digit, count(*) AS n_orders FROM dg GROUP BY 1),
         |t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n_total FROM h),
         |x AS (SELECT digit, n_orders, (1000 * n_orders) // n_total AS freq_milli,
         |        CAST(CASE $cases ELSE 0 END AS BIGINT) AS benford_milli
         |      FROM h CROSS JOIN t)
         |SELECT digit, n_orders, freq_milli, benford_milli,
         |  abs(freq_milli - benford_milli) AS dev_milli
         |FROM x ORDER BY digit""".stripMargin
    }),
    QueryDef("q126_corr_matrix", q126, Some {
      val cells = (for { i <- corrVars.indices; j <- i + 1 until corrVars.size } yield
        s"""SELECT '${corrVars(i)._1}' AS var_a, '${corrVars(j)._1}' AS var_b,
           |  ${corrCell(corrVars(i)._1, corrVars(j)._1)} AS corr FROM m""".stripMargin)
      s"""WITH m AS (SELECT count(1) AS n, ${corrMoments("HUGEINT").mkString(",\n  ")}
         |FROM lineitem)
         |${cells.mkString("\nUNION ALL\n")}
         |ORDER BY var_a, var_b""".stripMargin
    }),
    QueryDef("q119_fk_audit", q119, Some {
      val edges = Seq(
        ("customer.nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("lineitem.orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.partkey", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("nation.regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
        ("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"),
        ("supplier.nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
      ).map { case (name, child, key, parent, pk) =>
        s"""SELECT '$name' AS edge,
           |  (SELECT count(*) FROM $child) AS n_rows,
           |  (SELECT count(*) FROM $child c
           |   WHERE NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$key)) AS n_orphans"""
          .stripMargin
      }
      edges.mkString("", "\nUNION ALL\n", "\nORDER BY edge")
    }),
    QueryDef("q111_skyline", q111, Some(
      """WITH pt AS (SELECT p_size, CAST(round(p_retailprice * 100) AS BIGINT) AS price_centi
        |            FROM part),
        |d AS (SELECT p_size, price_centi, count(*) AS n_parts FROM pt GROUP BY p_size, price_centi)
        |SELECT p_size, price_centi, CAST(n_parts AS BIGINT) AS n_parts FROM d b
        |WHERE NOT EXISTS (SELECT 1 FROM d a
        |  WHERE a.p_size <= b.p_size AND a.price_centi <= b.price_centi
        |    AND (a.p_size < b.p_size OR a.price_centi < b.price_centi))
        |ORDER BY p_size, price_centi""".stripMargin)),
    QueryDef("q110_table_profile", q110, Some(profileSql)),
    QueryDef("q104_group_regression", q104,
      Some("""WITH e AS (SELECT event_type,
             |  epoch_ns(ts) // 1000000000 - 1704067200 AS x,
             |  CAST(round(value * 100) AS BIGINT) AS y FROM events),
             |m AS (SELECT event_type, count(*) AS n,
             |  sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             |  sum(CAST(x AS HUGEINT)*CAST(y AS HUGEINT)) AS sxy,
             |  sum(CAST(x AS HUGEINT)*CAST(x AS HUGEINT)) AS sxx
             |  FROM e GROUP BY event_type)
             |SELECT event_type, CAST(n AS BIGINT) AS n,
             |(CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * CAST(86400 AS DOUBLE) / CAST(100 AS DOUBLE) AS slope_per_day,
             |(CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) / CAST(100 AS DOUBLE) AS intercept
             |FROM m ORDER BY event_type""".stripMargin)),
    QueryDef("q98_band_theta_join", q98,
      Some("""WITH bands(band, lo, hi) AS (VALUES
             |  ('b0_under_20k', CAST(0 AS DOUBLE), CAST(20000 AS DOUBLE)),
             |  ('b1_20_40k', CAST(20000 AS DOUBLE), CAST(40000 AS DOUBLE)),
             |  ('b2_40_60k', CAST(40000 AS DOUBLE), CAST(60000 AS DOUBLE)),
             |  ('b3_60_80k', CAST(60000 AS DOUBLE), CAST(80000 AS DOUBLE)),
             |  ('b4_80k_plus', CAST(80000 AS DOUBLE), CAST(1e12 AS DOUBLE)))
             |SELECT band, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem JOIN bands
             |  ON l_extendedprice >= lo AND l_extendedprice < hi
             |GROUP BY band ORDER BY band""".stripMargin)),
    QueryDef("q01_pricing_summary", q01,
      Some("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
             |round(sum(l_extendedprice),2) AS sum_base_price,
             |round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
             |round(avg(l_quantity),2) AS avg_qty, round(avg(l_discount),2) AS avg_disc,
             |count(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),
    QueryDef("q02_filter_pushdown", q02,
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),
    QueryDef("q03_top_revenue_orders", q03,
      Some("""SELECT o_orderkey, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
             |count(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderstatus = 'O'
             |GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),
    QueryDef("q04_revenue_by_nation", q04,
      Some("""SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),
    QueryDef("q05_region_rollup", q05,
      Some("""SELECT coalesce(r_name,'ALL') AS region_name, coalesce(n_name,'ALL') AS nation_name,
             |count(*) AS n_customers, round(sum(c_acctbal),2) AS total_acctbal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP(r_name, n_name)
             |ORDER BY region_name, nation_name""".stripMargin)),
    QueryDef("q06_semi_join", q06,
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
             |ORDER BY c_custkey""".stripMargin)),
    QueryDef("q07_anti_join", q07,
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
             |ORDER BY c_custkey""".stripMargin)),
    QueryDef("q08_topk_per_group", q08,
      Some("""SELECT p_brand, p_partkey, p_retailprice, rn FROM (
             |  SELECT p_brand, p_partkey, p_retailprice,
             |         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
             |  FROM part) t
             |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin)),
    QueryDef("q09_window_running_total", q09,
      Some("""SELECT o_custkey, o_orderkey,
             |row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
             |round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_total
             |FROM orders ORDER BY o_custkey, rn""".stripMargin)),
    QueryDef("q47_range_frame_window", q47,
      Some("""WITH o AS (SELECT o_custkey, o_orderkey,
             |  datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
             |  o_totalprice FROM orders)
             |SELECT o_custkey, o_orderkey, d,
             |round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY d
             |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS trailing30
             |FROM o ORDER BY o_custkey, d, o_orderkey""".stripMargin)),
    QueryDef("q10_distinct_agg", q10,
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             |count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    QueryDef("q11_set_operations", q11,
      Some("""SELECT 'building_or_rich' AS op, count(*) AS n FROM (
             |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |  UNION SELECT c_custkey FROM customer WHERE c_acctbal > 7000) u
             |UNION ALL
             |SELECT 'building_and_rich' AS op, count(*) AS n FROM (
             |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |  INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 7000) i
             |UNION ALL
             |SELECT 'building_not_rich' AS op, count(*) AS n FROM (
             |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |  EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 7000) e
             |ORDER BY op""".stripMargin)),
    QueryDef("q12_scalar_gamut", q12,
      Some("""SELECT p_partkey, upper(p_brand) AS brand_u, lower(p_type) AS type_l,
             |length(p_name) AS name_len, substr(p_name,1,5) AS name_pre,
             |concat(p_brand,'#',p_type) AS brand_type, abs(p_size-25) AS size_dev,
             |round(p_retailprice*1.1,2) AS inflated,
             |CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class,
             |p_partkey % 7 AS bucket7
             |FROM part ORDER BY p_partkey""".stripMargin)),
    QueryDef("q13_date_parts", q13,
      Some("""SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mon,
             |count(*) AS n_orders, round(sum(o_totalprice),2) AS total
             |FROM orders GROUP BY yr, mon ORDER BY yr, mon""".stripMargin)),
    QueryDef("q14_event_time_buckets", q14,
      Some("""SELECT epoch_ns(ts) // 300000000000 AS bucket, event_type,
             |count(*) AS n, round(sum(value),2) AS total
             |FROM events GROUP BY bucket, event_type ORDER BY bucket, event_type""".stripMargin)),
    QueryDef("q15_json_extract", q15,
      Some("""SELECT event_type, round(avg(CAST(json_extract_string(props,'$.k') AS BIGINT)),2) AS avg_k,
             |max(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS max_k,
             |min(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS min_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
    QueryDef("q50_sql_api", q50,
      Some("""SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_orderstatus = 'F'
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),
    QueryDef("q52_unpivot", q52,
      Some("""SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
             |UNION ALL
             |SELECT p_partkey, 'retail' AS metric, p_retailprice AS value FROM part
             |ORDER BY p_partkey, metric""".stripMargin)),
    QueryDef("q53_lead_lag", q53,
      Some("""WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS t_us FROM events)
             |SELECT user_id, event_id, t_us,
             |t_us - coalesce(lag(t_us, 1) OVER (PARTITION BY user_id ORDER BY t_us, event_id), t_us) AS gap_us
             |FROM e ORDER BY user_id, t_us, event_id""".stripMargin)),
    QueryDef("q59_grouping_sets", q59, Some(
      """SELECT GROUPING_ID(r_name, n_name) AS gid,
        |coalesce(r_name, 'ALL') AS region_name, coalesce(n_name, 'ALL') AS nation_name,
        |count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (n_name), ())
        |ORDER BY gid, region_name, nation_name""".stripMargin)),
    QueryDef("q61_quantile_binning", q61, Some(
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |CAST(floor(percent_rank() OVER w * 1000) AS BIGINT) AS pr_milli,
        |CAST(floor(cume_dist() OVER w * 1000) AS BIGINT) AS cd_milli
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin)),
    QueryDef("q72_set_ops_all", q72, Some(
      """SELECT 'intersect_all' AS op, count(*) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') i
        |UNION ALL
        |SELECT 'except_all' AS op, count(*) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') e
        |ORDER BY op""".stripMargin)),
    QueryDef("q65_full_outer", q65, Some(
      """WITH cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'),
        |pend AS (SELECT o_custkey, count(*) AS n_pending FROM orders
        |         WHERE o_orderstatus = 'P' GROUP BY o_custkey)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |CAST(c_custkey IS NOT NULL AS BIGINT) AS has_customer,
        |CAST(o_custkey IS NOT NULL AS BIGINT) AS has_orders,
        |coalesce(n_pending, 0) AS n_pending,
        |coalesce(c_acctbal, -1.0) AS acctbal
        |FROM cust FULL OUTER JOIN pend ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin)),
    QueryDef("q66_correlated_subquery", q66, Some(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE CAST(round(c_acctbal * 100) AS BIGINT) *
        |      (SELECT count(*) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |    > (SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |       FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)),
    QueryDef("q54_stat_aggregates", q54,
      Some("""WITH qq AS (SELECT l_returnflag,
             |  CAST(round(l_quantity*100) AS BIGINT) AS qx,
             |  CAST(round(l_extendedprice*100) AS BIGINT) AS px,
             |  CAST(round(l_discount*100) AS BIGINT) AS dx FROM lineitem),
             |m AS (SELECT l_returnflag, count(*) AS n,
             |  sum(qx) AS sq, sum(qx*qx) AS sqq, sum(px) AS sp, sum(px*px) AS spp,
             |  sum(dx) AS sd, sum(qx*px) AS sqp, sum(qx*dx) AS sqd
             |  FROM qq GROUP BY l_returnflag)
             |SELECT l_returnflag,
             |sqrt(CAST(n*sqq - sq*sq AS DOUBLE) / CAST(n*(n-1) AS DOUBLE)) / CAST(100 AS DOUBLE) AS sd_qty,
             |CAST(n*sqp - sq*sp AS DOUBLE) / sqrt(CAST(n*sqq - sq*sq AS DOUBLE) * CAST(n*spp - sp*sp AS DOUBLE)) AS corr_qty_price,
             |CAST(n*sqd - sq*sd AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / CAST(10000 AS DOUBLE) AS cov_qty_disc
             |FROM m ORDER BY l_returnflag""".stripMargin)),
  )
}
