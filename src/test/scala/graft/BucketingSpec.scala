package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-shuffled on-disk layout so co-located joins and
  * aggregations skip the exchange entirely — the 100 TB answer to
  * repeatedly joining the same fact tables on the same key. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("bucketed-by-join-key tables join without a shuffle exchange") {
    // tables land in the default warehouse dir (./spark-warehouse,
    // gitignored) — spark.sql.warehouse.dir is a static conf. Clear any
    // leftovers from prior runs (dropping the table doesn't always
    // remove an orphaned location).
    for (t <- Seq("li_bucketed", "o_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    val d = "/root/testdata/sf0.001"

    Tables.lineitem(spark, d)
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, d)
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    // disable broadcast so the join must pick SMJ — the point is that
    // bucketing removes the shuffle, not that the table is small
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join should have no shuffle exchange:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, d).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
