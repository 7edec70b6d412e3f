package graft

/** The custom expressions are registered as SQL functions through
  * GraftExtensions (SparkSessionExtensions), usable from spark.sql.
  */
class SqlFunctionsSpec extends SparkSpec {

  test("string_poly_hash callable from SQL") {
    val v = spark.sql("SELECT string_poly_hash('abc') AS h").head().getLong(0)
    assert(v == 96354L)
  }

  test("vector_dot callable from SQL") {
    val v = spark.sql(
      """SELECT vector_dot(CAST(array(1.0, 2.0, 3.0) AS array<float>),
        |                  CAST(array(4.0, 5.0, 6.0) AS array<float>)) AS d""".stripMargin)
      .head().getDouble(0)
    assert(v == 32.0)
  }
}
