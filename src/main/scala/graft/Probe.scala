package graft

/** Dev utility: time named queries in ISOLATION (the shared sandbox
  * machine contaminates full-bench runs — a query's warm solo cost is
  * its plan's cost, which is what floors and regressions should be
  * judged against). Usage:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.Probe <sfDir> q1,q2[,…] [iters]"
  *
  * Prints per-iteration wall times and the per-query minimum. Not part
  * of the driver contract — Bench remains the official record.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.build(GraftSession.cpusFromEnv, "graft-probe")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val times = (1 to iters).map { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $n iter $i: $t%.3f s")
        t
      }
      println(f"[probe] $n min: ${times.min}%.3f s")
    }
    spark.stop()
  }
}
