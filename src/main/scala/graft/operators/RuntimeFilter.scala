package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Semi-join reduction via a Bloom runtime filter — the shuffle-pruning
  * technique big selective joins need at 100 TB: build a compact Bloom
  * sketch over the (small, filtered) build side's join keys, then drop
  * probe rows that cannot match BEFORE they enter the join's exchange.
  * False positives only let extra rows into the shuffle; the exact join
  * then drops them, so the result is EXACTLY the plain join while the
  * shuffled volume falls to (selectivity + fpp) of the probe side.
  *
  * Uses Spark's own sketch expressions ([[BloomFilterAggregate]] /
  * [[BloomFilterMightContain]], the pair behind Catalyst's automatic
  * InjectRuntimeFilter) wired explicitly: the build aggregates
  * distributed (partial sketches merged), only the serialized sketch
  * crosses the driver, and the probe-side test is a codegen'd predicate,
  * not a UDF.
  */
object RuntimeFilter {

  /** Distributed Bloom build over `key`; returns the serialized sketch. */
  def buildBloom(build: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(key))), expectedItems)
      .toAggregateExpression()
    build.select(ColumnBridge.column(agg).as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** Codegen membership probe against a serialized sketch. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** Equi-join with the probe side pre-pruned by the build side's Bloom
    * sketch. Result is exactly `probe JOIN build ON probeKey = buildKey`.
    *
    * NOTE: constructing this DataFrame is EAGER — the sketch must exist
    * before the probe filter can be planned, so the build side runs as a
    * job here (inherent to explicit runtime filters; Catalyst's automatic
    * variant hides the same work in a subquery). The build side is
    * localCheckpoint'd so the sketch build and the join consume one
    * materialization instead of scanning it twice.
    *
    * Sketch sizing: the serialized sketch is embedded as a plan LITERAL,
    * shipped inside every probe task's serialized plan — oversizing it is
    * paid once per task, so `expectedItems` defaults to the build side's
    * ACTUAL row count (free: the checkpoint already materialized it)
    * rather than a fixed worst case. Pass an explicit estimate only to
    * avoid the count on a non-reused build side. An EMPTY build side
    * yields a null sketch from the global aggregate; `might_contain(null)`
    * is null, the filter drops every probe row, and the result is the
    * empty join — pinned in ScalePatternsSpec so that path can't regress.
    */
  def bloomPrunedJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = -1L): DataFrame = {
    require(expectedItems == -1L || expectedItems > 0L,
      s"expectedItems must be -1 (auto: count the build side) or positive, got $expectedItems")
    val b = build.localCheckpoint()
    // Clamp into BloomFilterAggregate's accepted range: it rejects
    // estimates above spark.sql.optimizer.runtime.bloomFilter.maxNumItems
    // (4M by default — past that a Bloom filter stops paying anyway), so
    // read the session's actual conf rather than hard-coding the default.
    val maxItems = build.sparkSession.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val items = math.min(
      if (expectedItems > 0) expectedItems else math.max(b.count(), 64L),
      maxItems)
    val bloom = buildBloom(b, b(buildKey), items)
    probe
      .where(mightContain(bloom, probe(probeKey)))
      .join(b, probe(probeKey) === b(buildKey))
  }
}
