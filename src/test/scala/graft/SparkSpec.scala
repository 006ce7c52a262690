package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared fixture: one session for the whole forked test JVM (suites run
  * sequentially; `getOrCreate` hands every suite the same session, so no
  * suite stops it).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.build(4, "graft-test")
  /** Smallest scale factor — specs verify semantics, the DuckDB oracle
    * gate (graft.Verify at sf0.01) verifies scale-data correctness.
    */
  val sf = "/root/testdata/sf0.001"
}
