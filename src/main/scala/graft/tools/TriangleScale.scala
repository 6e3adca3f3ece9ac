package graft.tools

import graft.GraftSession
import graft.operators.GraphOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress for q103's degree-ordered triangle enumeration
  * (results land in SCALE.md): builds a "middle-hub" graph — one hub
  * with h/2 lower-id and h/2 higher-id spoke neighbors plus spoke-ring
  * edges — where the naive id-ordered path-wedge join (the oracle's
  * shape) enumerates (h/2)² wedges through the hub, while degree
  * orientation gives the hub out-degree 0 and keeps wedge volume O(h).
  * Prints wall-clock for both at increasing hub sizes so the scaling
  * exponent is measured, not guessed.
  */
object TriangleScale {

  /** Naive id-ordered enumeration, exactly the q103 oracle's join
    * shape: e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c), then the 3-way node unpivot. */
  private def naive(e: DataFrame): DataFrame = {
    e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(explode(array(col("e1.a"), col("e1.b"), col("e2.b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_cnt"))
  }

  private def hubGraph(spark: SparkSession, h: Int): DataFrame = {
    val hub = (h / 2 + 1).toLong
    // low spokes 1..h/2 (< hub), high spokes hub+1..hub+h/2 (> hub)
    val low = spark.range(1, h / 2 + 1).select(col("id").as("a"), lit(hub).as("b"))
    val high = spark.range(hub + 1, hub + h / 2 + 1)
      .select(lit(hub).as("a"), col("id").as("b"))
    // spoke rings create the actual triangles: (i, i+1, hub) on each side
    val lowRing = spark.range(1, h / 2).select(col("id").as("a"), (col("id") + 1).as("b"))
    val highRing = spark.range(hub + 1, hub + h / 2)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    low.unionByName(high).unionByName(lowRing).unionByName(highRing)
  }

  private def time(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(2000, 8000, 20000)
    println("TRISCALE h, naive_s, oriented_s, naive_tris, oriented_tris")
    // one untimed throwaway at the smallest size: without it the first
    // measured point absorbs session/JIT warmup and the naive baseline
    // reads non-monotone across the sweep (seen in the round-6 table).
    locally {
      val w = hubGraph(spark, 500).localCheckpoint()
      naive(w).agg(sum("tri_cnt")).collect()
      GraphOps.triangleCounts(w).agg(sum("tri_cnt")).collect()
    }
    sizes.foreach { h =>
      val e = hubGraph(spark, h).localCheckpoint()
      val (tn, sn) = time(naive(e).agg(sum("tri_cnt")).collect()(0).getLong(0))
      val (to, so) = time(GraphOps.triangleCounts(e).agg(sum("tri_cnt")).collect()(0).getLong(0))
      println(f"TRISCALE $h%6d  $tn%8.2f  $to%8.2f  $sn%10d  $so%10d")
      assert(sn == so, s"triangle participation totals must agree: $sn vs $so")
    }
    spark.stop()
  }
}
