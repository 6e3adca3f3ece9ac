package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run green on the smoke fixture and return
  * a deterministic result; a few are pinned to known values. */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("registry has unique names and oracle keys ⊆ query keys") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val n = q.fn(spark, d).count()
      assert(n >= 0)
      // queries that must be non-empty on real data
      if (!Set("q09_anti_join", "q24_except", "q50_embedding_neardup").contains(q.name))
        assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("q01 pins: 6 (returnflag, linestatus) groups with exact quantity sums") {
    val rows = SparkEntry.queries("q01_pricing_summary")(spark, d).collect()
    assert(rows.length == 6)
    val total = rows.map(_.getAs[Double]("sum_qty")).sum
    val expected = Tables.lineitem(spark, d)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <=
        org.apache.spark.sql.functions.lit("2001-06-01").cast("timestamp"))
      .agg(org.apache.spark.sql.functions.sum("l_quantity")).head().getDouble(0)
    assert(total == expected)
  }

  test("q36 pins: sha256-derived payload matches a locally computed value") {
    val first = SparkEntry.queries("q36_etl_seedgen")(spark, d).head()
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val want = md.digest("1".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(20)
    assert(first.getLong(0) == 1L && first.getString(1) == want)
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
