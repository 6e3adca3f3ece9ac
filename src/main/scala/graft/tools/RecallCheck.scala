package graft.tools
import graft._
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val lsh = SparkEntry.queries("q44_minhash_lsh")(spark, d)
      .select("a_id", "b_id").collect().toSet
    // Blocked exact pairs at the same threshold (q43-style count join at
    // t=0.8): every blocked pair is an exact pair, so LSH must contain
    // all of them; the reverse containment is enforced by q44's exact
    // verify stage.
    val blocked = graft.operators.LlmOps.jaccardCountJoinAt(spark, d, graft.operators.LlmOps.productionThreshold10)
      .select("a_id", "b_id").collect().toSet
    println(s"RECALL $d: lsh=${lsh.size} blocked_exact=${blocked.size} " +
      s"missed=${(blocked -- lsh).size}")
    spark.stop()
  }
}
