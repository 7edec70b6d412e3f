package graft

import org.apache.spark.sql.functions._

import graft.operators.{MGSketch, MisraGriesAggregator}

/** The Misra-Gries guarantee, proven adversarially (the oracle only sees
  * the nice corpus): with k counters, every item of true frequency
  * > n/(k+1) survives both the streaming updates AND the partial-merge
  * path, estimates undercount by at most n/(k+1), and buffer size never
  * exceeds k.
  */
class FrequentItemsSpec extends SparkSpec {

  private val k = 29

  /** Deterministic adversarial stream: 3 heavy items (1000 occurrences
    * each) drowned in a 10_000-item singleton tail — cardinality 340x
    * the counter budget, the regime a full groupBy would shuffle and the
    * sketch must survive in k counters.
    */
  private def stream: Seq[String] =
    (0 until 10000).map(i => s"tail$i") ++
      (0 until 3).flatMap(h => Seq.fill(1000)(s"heavy$h"))

  private def check(sk: MGSketch, n: Long): Unit = {
    assert(sk.n == n, s"stream length ${sk.n} != $n")
    assert(sk.counts.size <= k, s"${sk.counts.size} counters > k=$k")
    (0 until 3).foreach { h =>
      val est = sk.counts.getOrElse(s"heavy$h", 0L)
      assert(est > 0, s"heavy$h (freq 1000 > n/(k+1)=${n / (k + 1)}) evicted: ${sk.counts}")
      assert(est <= 1000, s"heavy$h overestimated: $est")
      assert(1000 - est <= n / (k + 1), s"heavy$h undercount ${1000 - est} > n/(k+1)")
    }
  }

  test("streaming updates: heavy items survive a 10k-item tail in 29 counters") {
    val agg = new MisraGriesAggregator(k)
    val sk = stream.foldLeft(agg.zero)(agg.reduce)
    check(sk, 13000L)
  }

  test("merge path: the distributed sketch keeps the same guarantee across partitionings") {
    val spark0 = spark
    import spark0.implicits._
    // Interleave so heavies are spread across partitions (each partial
    // sees a different sub-stream; the merge must reconcile them).
    val data = new scala.util.Random(2021).shuffle(stream)
    Seq(1, 4, 32).foreach { parts =>
      val sk = data.toDS().repartition(parts)
        .select(new MisraGriesAggregator(k).toColumn).head()
      check(sk, 13000L)
    }
  }

  test("q105 output equals the exact heavy hitters (sketch scopes, never decides)") {
    val got = SparkEntry.queries("q105_heavy_hitters")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val w = graft.operators.InvertedIndex
      .words(Tables.documents(spark, sf0001), "doc_id", "text")
    val counts = w.groupBy(col("word")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val n = counts.map(_._2).sum
    val want = counts.filter { case (_, c) => c * 30 > n }
      .sortBy { case (word, c) => (-c, word) }.toSeq
    assert(got == want, s"got=$got want=$want")
    assert(got.nonEmpty && got.size < counts.length,
      s"degenerate split: ${got.size} of ${counts.length}")
  }
}
