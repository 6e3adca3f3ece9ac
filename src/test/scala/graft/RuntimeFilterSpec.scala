package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime (Bloom) filter join pruning: Catalyst injects a bloom filter
  * built from the selective side of a join into the scan of the large
  * side, so fact rows that cannot match are dropped at the scan. At
  * 100 TB this is the difference between shuffling the whole fact table
  * and shuffling the ~matching slice. Thresholds are lowered here so the
  * rule fires on fixture-sized inputs. */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("bloom runtime filter is injected into the fact-side scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      // force a shuffle join so the runtime filter is worth injecting
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val d = "/root/testdata/sf0.01"
      val li = Tables.lineitem(spark, d)
      val o = Tables.orders(spark, d).filter(col("o_totalprice") > 400000)
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"no bloom runtime filter in optimized plan:\n${plan.take(2000)}")
      // result unchanged vs no-filter run
      val n = joined.head().getLong(0)
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1))).head().getLong(0) == n)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
