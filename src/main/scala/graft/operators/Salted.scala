package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase (salted) aggregation.
  *
  * A straight `groupBy(key).agg(...)` sends every row of a hot key to one
  * reducer. Salting splits each key into `buckets` sub-groups for the
  * first (wide) aggregation, then merges the per-salt partials in a second
  * aggregation whose input is at most `buckets` rows per key. The result
  * is EXACTLY the direct aggregation (addition is associative), so the
  * oracle is the plain GROUP BY — this operator changes the shuffle shape,
  * never the answer.
  *
  * The reference's English-letter partitioning is the motivating skew
  * (test_out/s.txt is 3,985 lines vs z.txt 33; SURVEY.md §4); AQE's skew
  * handling covers joins, but hot-key AGGREGATION state is what salting
  * addresses at 100 TB.
  */
object Salted {

  /** count + sum(weight) per key, salted. The salt only needs to spread
    * rows of one key across reducers; any deterministic row-level value
    * works (hash of a companion column here, keeping results
    * engine-portable — never rand(), which breaks retry idempotence).
    */
  def countAndSum(
      df: DataFrame,
      key: Column,
      saltSource: Column,
      weight: Column,
      buckets: Int = 16,
  ): DataFrame =
    df.select(key.as("k"), pmod(saltSource, lit(buckets)).as("salt"), weight.as("w"))
      .groupBy(col("k"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("w")).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pc")).as("n"), sum(col("ps")).as("total"))

  /** Skew-safe equi-join: replicate the (small) build side `factor` ways
    * and scatter the probe side's rows across the replicas with a
    * deterministic row-content salt, so the join key becomes
    * (key, salt) and a hot key's rows spread over `factor` reducers
    * instead of one. The result is EXACTLY the plain equi-join — every
    * probe row meets its key's build rows exactly once, in the single
    * replica its salt selects. AQE's skew-split repairs sort-merge joins
    * after planning; explicit salting is the a-priori form that also
    * covers shuffled-hash joins, and the salt is content-derived (never
    * rand()) so task retries and speculation stay idempotent.
    *
    * The default salt hashes ALL probe columns, which spreads a hot key
    * only as far as its rows differ: byte-identical duplicate rows (the
    * duplicate-row skew case) collapse onto one salt value and the
    * mitigation silently degrades to the plain join (still correct).
    * When hot-key rows may be identical, pass `saltCols` naming
    * high-cardinality DETERMINISTIC per-row columns (a line number, an
    * event id — never rand()/monotonically_increasing_id, which change
    * across task retries).
    */
  def skewJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      factor: Int = 8,
      saltCols: Seq[Column] = Nil,
  ): DataFrame = {
    val saltSrc = if (saltCols.nonEmpty) saltCols else probe.columns.map(col).toSeq
    val salted = probe.withColumn("__salt", pmod(hash(saltSrc: _*), lit(factor)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
