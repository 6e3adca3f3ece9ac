package graft.tools

import graft.{GraftSession, SparkEntry}

/** Time a single declared query N times on a fixture dir (dev tool). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.create()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"BENCHONE $name rep$i ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      // same per-rep hygiene as Bench: drop the rep's orphaned
      // checkpoint caches, keep the shared derivations
      graft.plans.DerivationCache.dropOrphans(spark.sparkContext)
    }
    spark.stop()
  }
}
