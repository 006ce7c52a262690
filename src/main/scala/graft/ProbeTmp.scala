package graft

object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(32, "probe")
    val dir = "/root/testdata/sf0.001"
    // warm caches first (the bench/spec posture)
    operators.Dedup.dedup03MinhashLsh(spark, dir).count()
    val df = operators.Dedup.dedup13LshSweep(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("PLANSTART")
    println(plan)
    println("PLANEND")
    spark.stop()
  }
}
