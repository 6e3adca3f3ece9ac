package graft

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall-clock seconds.
  *
  * Each query is forced through the `noop` DSv2 sink — unlike count(),
  * this executes the full physical plan (sorts and projections included,
  * nothing pruned by the count-optimization) without materializing rows
  * on the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create()

    // Warm up the JVM/codegen/parquet-reader paths once so the first
    // measured query doesn't absorb one-time session costs.
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    val names = SparkEntry.registry.map(_.name)
    // Per-query adaptive repeats: the first run absorbs whole-stage-
    // codegen compilation (3s+ even for trivial queries — NOTES.md
    // documents ±25% run-to-run noise from this plus container jitter).
    // Run twice; if the runs already agree within 10% the codegen cost
    // was negligible and min(t0,t1) is the steady state, otherwise run
    // a third time and report the min of the two warm runs. Reported
    // numbers are reproducible across bench invocations to ~10%.
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      val t0 = once()
      val t1 = once()
      val steady =
        if (math.abs(t0 - t1) <= 0.1 * math.min(t0, t1)) math.min(t0, t1)
        else math.min(t1, once())
      name -> steady
    }
    // Locale.ROOT keeps the JSON line parseable under comma-decimal locales.
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
