package graft.tools

import graft.GraftSession
import graft.operators.LlmOps

/** Re-measure the q89/q43c routing branches in isolation (dev tool):
  * the skew-probe crossover data ages as the shared pair-graph
  * machinery evolves (VERDICT r10 #3 — what is warm changes), so
  * adjudications re-run both branches steady-state rather than trust a
  * stale crossover. Usage: runMain graft.tools.RouteProbe [dir] [reps]
  */
object RouteProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.create()
    def t(label: String, f: => org.apache.spark.sql.DataFrame): Unit =
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"ROUTEPROBE $label%-12s rep$i ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        graft.plans.DerivationCache.dropOrphans(spark.sparkContext)
      }
    println(f"ROUTEPROBE skewStat ${LlmOps.shingleSkewStat(spark, dir)}%.2f")
    t("q89_count", LlmOps.containmentCountJoin(spark, dir))
    t("q89_prefix", LlmOps.containmentPrefixJoin(spark, dir))
    spark.stop()
  }
}
