package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior laws for the round-8 decision-support shapes (WarehouseOps)
  * and the round-8 audit/graph/profile additions — each law re-derives
  * the query's core invariant through an INDEPENDENT formulation
  * (window instead of join-back, brute-force instead of wedge
  * enumeration), so a silent aggregation/join bug cannot pass both. */
class WarehouseSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("q227: correlated-aggregate join-back ≡ window formulation") {
    val got = SparkEntry.queries("q227_small_qty_revenue")(spark, d)
      .agg(sum("n_lines")).head.getLong(0)
    val w = Window.partitionBy("l_partkey")
    val want = Tables.lineitem(spark, d)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"))
      .withColumn("sq", sum("qty").over(w))
      .withColumn("cq", count(lit(1)).over(w))
      .where(col("qty") * 5 * col("cq") < col("sq"))
      .count()
    assert(got == want)
  }

  test("q231: group-join winners ≡ window formulation of the two quantifiers") {
    val got = SparkEntry.queries("q231_waiting_suppliers")(spark, d)
      .agg(sum("numwait")).head.getLong(0)
    val lo = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d).where(col("o_orderstatus") === "F")
        .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        col("l_shipdate").cast("date").as("sd"))
      .groupBy("ok", "sk").agg(max("sd").as("msd"))
    val w = Window.partitionBy("ok")
    val want = lo.withColumn("gmx", max("msd").over(w))
      .withColumn("nsupp", count(lit(1)).over(w))
      .where(col("nsupp") > 1 && col("msd") === col("gmx"))
      .count()
    assert(got == want && got > 0)
  }

  test("q235: the reported supplier's unit price is minimal, ties to lowest suppkey") {
    val u = Tables.lineitem(spark, d)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("osk"),
        floor(col("l_extendedprice") * 100).as("c"),
        col("l_quantity").cast("long").as("q"))
      .groupBy("pk", "osk")
      .agg(((sum("c") * 10000) / sum("q")).cast("long").as("ounit"))
    val res = SparkEntry.queries("q235_min_price_supplier")(spark, d)
    val bad = res.join(u, col("p_partkey") === col("pk"))
      .where(col("ounit") < col("unit_mc") ||
        (col("ounit") === col("unit_mc") && col("osk") < col("s_suppkey")))
    assert(bad.count() == 0)
    assert(res.select("p_partkey").distinct().count() == res.count())
  }

  test("q238: FD violation rows for part.p_brand->p_type match a direct recount") {
    val row = SparkEntry.queries("q238_fd_violations")(spark, d)
      .where(col("fd") === "part.p_brand->p_type").head
    val part = Tables.part(spark, d)
    val total = part.count()
    val majSum = part.groupBy("p_brand", "p_type").count()
      .groupBy("p_brand").agg(max("count").as("mx"))
      .agg(sum("mx")).head.getLong(0)
    assert(row.getAs[Long]("n_violation_rows") == total - majSum)
  }

  test("q239: key columns flag is_pk, non-key columns do not") {
    val m = SparkEntry.queries("q239_pk_discovery")(spark, d).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[Boolean]("is_pk")).toMap
    assert(m("orders.o_orderkey") && m("customer.c_custkey"))
    assert(!m("orders.o_custkey") && !m("orders.o_orderstatus"))
  }

  test("q240: returned pairs are non-adjacent and the top count matches brute force") {
    val li = Tables.lineitem(spark, d).where(col("l_quantity") >= 40)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val e0 = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("ea"), col("y.pk").as("eb")).distinct()
    val res = SparkEntry.queries("q240_link_prediction")(spark, d)
    assert(res.join(e0, col("a") === col("ea") && col("b") === col("eb"), "left_semi")
      .count() == 0)
    val top = res.head
    // brute-force common neighbors of the top pair via adjacency sets
    val adj = e0.select(col("ea").as("n"), col("eb").as("m"))
      .unionAll(e0.select(col("eb").as("n"), col("ea").as("m")))
    val na = adj.where(col("n") === top.getAs[Long]("a")).select("m")
    val nb = adj.where(col("n") === top.getAs[Long]("b")).select("m")
    assert(na.intersect(nb).count() == top.getAs[Long]("common_neighbors"))
  }

  test("q242: cusum telescopes to zero and peak rows carry the max |cusum|") {
    val res = SparkEntry.queries("q242_cusum_changepoint")(spark, d)
      .orderBy("day").collect()
    assert(res.last.getAs[Long]("cusum") == 0L)
    val mx = res.map(r => math.abs(r.getAs[Long]("cusum"))).max
    assert(res.filter(_.getAs[Boolean]("is_peak"))
      .forall(r => math.abs(r.getAs[Long]("cusum")) == mx))
    assert(res.exists(_.getAs[Boolean]("is_peak")))
  }

  test("q233: threshold is scale-free — every kept part beats the average share") {
    val res = SparkEntry.queries("q233_important_parts")(spark, d)
    val pv = Tables.lineitem(spark, d)
      .select(col("l_partkey"), floor(col("l_extendedprice") * 100).as("c"))
      .groupBy("l_partkey").agg(sum("c").as("cents"))
    val (tot, np) = {
      val r = pv.agg(sum("cents"), count(lit(1))).head
      (r.getLong(0), r.getLong(1))
    }
    val kept = res.collect().map(_.getAs[Long]("cents"))
    assert(kept.nonEmpty && kept.forall(c => c * np > tot))
    // and nothing qualifying was dropped
    assert(res.count() ==
      pv.where(col("cents") * np > tot).count())
  }
}
