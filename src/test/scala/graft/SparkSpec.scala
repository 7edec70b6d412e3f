package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM (suites run in it
  * sequentially under `Test / fork := true`).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-test-warehouse")
    System.setProperty("derby.system.home", tmp.toString)
    val s = GraftSession
      .builder(appName = "graft-test", master = Some("local[4]"), shufflePartitions = 4)
      .config("spark.sql.warehouse.dir", tmp.resolve("warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  lazy val sf0001 = "/root/testdata/sf0.001"
  lazy val sf001 = "/root/testdata/sf0.01"
}
