package graft

import org.apache.spark.sql.types.StructType

/** DRIVER-SIDE plan-construction cost probe (round 17). QueryProfile
  * showed q220 spends 6.6 s of its 7.5 s BUILDING DataFrames (zero
  * jobs); this instrument breaks that down: parquet relation creation
  * (file listing + footer schema inference) with and without an
  * explicit schema, a full readAsOf build, and the format("graft-layout")
  * batch-read path (inferSchema + analyzer-rule swap).
  *
  * Run: SPARK_GRAFT_CPUS=32 runMain graft.PlanCost <crudLayoutDir>
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      "/tmp/graft_lineitem_crud__root_testdata_sf0_1_nd880136d")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(appName = "graft-plancost", master = Some(s"local[$cpus]"),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeN(label: String, n: Int)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => body)
      println(f"$label%-55s ${(System.nanoTime() - t0) / 1e6 / n}%9.1f ms/call")
    }

    import graft.operators.VersionedLayout
    val pidDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("pid="))
      .map(_.getAbsolutePath).toSeq
    println(s"layout $dir — ${pidDirs.size} live pid dirs, head=${VersionedLayout.currentVersion(dir)}")

    var sch: StructType = null
    timeN("read.parquet(1 pid dir) [list+infer]", 10) {
      sch = spark.read.option("basePath", dir).parquet(pidDirs.head).schema
    }
    timeN("read.parquet(all pid dirs) [list+infer]", 10) {
      spark.read.option("basePath", dir).parquet(pidDirs: _*).schema; ()
    }
    timeN("read.schema(s).parquet(all pid dirs) [list only]", 10) {
      spark.read.option("basePath", dir).schema(sch).parquet(pidDirs: _*).schema; ()
    }
    timeN("VersionedLayout.log(dir)", 20) { VersionedLayout.log(dir); () }
    timeN("readAsOf(head) build + .schema", 5) {
      VersionedLayout.readAsOf(spark, dir, VersionedLayout.currentVersion(dir)).schema; ()
    }
    timeN("readAsOf(0) build + .schema", 5) {
      VersionedLayout.readAsOf(spark, dir, 0).schema; ()
    }
    timeN("format(graft-layout) load(head) build + .schema", 5) {
      spark.read.format("graft-layout").load(dir).schema; ()
    }
    timeN("changeFeed(0, head) build + .schema", 5) {
      VersionedLayout.changeFeed(spark, dir, 0,
        VersionedLayout.currentVersion(dir)).schema; ()
    }
    // Execution for contrast: the same as-of plan run to completion.
    timeN("readAsOf(head) EXECUTE count()", 5) {
      VersionedLayout.readAsOf(spark, dir, VersionedLayout.currentVersion(dir)).count(); ()
    }
    spark.stop()
  }
}
