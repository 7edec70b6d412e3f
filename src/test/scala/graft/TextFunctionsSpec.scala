package graft

import org.scalacheck.Gen

/** ScalaCheck-generated inputs: the Spark-expression normalization equals a
  * direct port of the reference's normalize_word (tema1a/src/main.cpp:31-39).
  */
class TextFunctionsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.functions.text

  private val asciiish: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaChar,
      2 -> Gen.numChar,
      2 -> Gen.oneOf(' ', '\t', '\'', ',', '.', '-', '!', '?'),
      1 -> Gen.choose(Char.MinValue, Char.MaxValue),
    )).map(_.mkString)

  test("normalizeWord matches the reference semantics on arbitrary strings") {
    val inputs = Gen.listOfN(300, asciiish).sample.get
    val spark0 = spark
    import spark0.implicits._
    val got = inputs.toDF("s")
      .select(text.normalizeWord(col("s")).as("n"))
      .as[String].collect().toSeq
    val want = inputs.map(text.normalizeWordScala)
    assert(got == want)
  }

  test("normalizedTokens drops empties and splits on whitespace runs") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq("  The  bright   sun! 123 \t x123y ", "", "  ", "...").toDF("s")
    val got = df.select(text.normalizedTokens(col("s")).as("t")).as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("the", "bright", "sun", "xy"), Seq(), Seq(), Seq()))
  }
}
