package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntRatioSpec extends SparkSpec {

  private def ratio(num: Long, den: Long, dp: Int): Double = {
    import spark.implicits._
    Seq((num, den)).toDF("n", "d")
      .select(GraftFunctions.intRatio(col("n"), col("d"), dp).as("r"))
      .collect()(0).getDouble(0)
  }

  /** Reference computed in BigInt — immune to both wrap and rounding. */
  private def exact(num: Long, den: Long, dp: Int): Double = {
    val s = BigInt(10).pow(dp)
    ((BigInt(2) * s * num + den) / (BigInt(2) * den)).toDouble / s.toDouble
  }

  test("half-grid rationals round half-up identically to the integer formula") {
    // 1/8 at dp=2 = 0.125 — exactly ON the 2-dp half grid, the case
    // round(double) is not portable on.
    assert(ratio(1, 8, 2) == 0.13)
    assert(ratio(3, 8, 2) == 0.38)
    assert(ratio(1, 2, 0) == 1.0)
    for ((n, d, dp) <- Seq((7L, 3L, 4), (123456L, 7L, 6), (1L, 3L, 6)))
      assert(ratio(n, d, dp) == exact(n, d, dp), s"$n/$d dp=$dp")
  }

  test("numerators beyond the Long-wrap point stay exact (decimal path)") {
    // 2*10^6*num overflows a Long past num ~ 4.6e12: the pre-decimal
    // formula wrapped silently here (ANSI off) and emitted garbage.
    // The RATIO stays human-scale (a mean, a share) — that is the
    // contract; only the numerator grows with the corpus.
    val big = 5_000_000_000_000_000L // 5e15 chars ~ a 5 PB corpus
    assert(ratio(big, 1_000_000_000_000L, 6) == 5000.0)
    assert(ratio(big, 7_000_000_000_000L, 6) == exact(big, 7_000_000_000_000L, 6))
    assert(ratio(big, big / 2, 6) == 2.0)
    assert(ratio(Long.MaxValue / 2, Long.MaxValue, 6) == 0.5)
    assert(ratio(Long.MaxValue, Long.MaxValue, 6) == 1.0)
  }
}
