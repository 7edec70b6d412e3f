package graft

/** Tag for multi-minute tests (streaming crash-replay matrices, 10x
  * corpus synthesis, full-history chain folds). The default `sbt test`
  * EXCLUDES them (build.sbt `-l graft.SlowTest`) so the driver's
  * independent test pass fits its budget; run them with
  * `SPARK_GRAFT_SLOW_TESTS=1 sbt test` — the builder's
  * full-verification recipe does both.
  */
object SlowTest extends org.scalatest.Tag("graft.SlowTest")
