package graft

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

/** The reference's entire premise is concurrent ETL (thread pools over
  * files/chunks — reference: case_2/MultithreadETL.py:121-152). Here
  * concurrency is the scheduler's job: many queries submitted from many
  * threads against ONE session must all run and produce exactly the
  * sequential results.
  */
class ConcurrencySpec extends SparkSpec {

  private implicit val ec: ExecutionContext = ExecutionContext.global

  test("16 mixed queries submitted concurrently produce sequential results") {
    val names = Seq(
      "q01_pricing_summary", "q05_nation_volume", "q09_sort_limit",
      "q13_case_agg", "q18_group_having", "q22_set_ops",
      "q26_topk_custom", "q29_lag_delta",
      "etl01_select_rename_cast", "etl05_incremental_merge",
      "text01_tokenize_count", "text04_fingerprint",
      "dedup01_exact", "sim01_bruteforce_topk",
      "cur02_corpus_stats", "mm01_binary_meta")
    val sequential = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf).count()).toMap
    val concurrent = Await.result(
      Future.sequence(names.map(n =>
        Future(n -> SparkEntry.queries(n)(spark, sf).count()))),
      5.minutes).toMap
    assert(concurrent == sequential)
  }

  test("the same query racing itself is consistent") {
    val runs = Await.result(
      Future.sequence((1 to 8).map(_ =>
        Future(SparkEntry.queries("q03_top_revenue")(spark, sf)
          .collect().map(_.toSeq).toSeq))),
      5.minutes)
    assert(runs.distinct.size == 1, "all racing runs must return identical rows")
  }
}
