package graft

import graft.functions.{GraftFunctions, MinHashSig, VectorFns}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd custom expressions must be bit-identical to their
  * declarative higher-order-function baselines on random inputs —
  * otherwise the "perf-only" claim is false and oracle hashes drift. */
class ExprEquivalenceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("DotProduct ≡ zip_with+aggregate baseline (bitwise, 200 random pairs)") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(31)
    val df = Seq.fill(200)((
      Array.fill(64)(rnd.nextGaussian()),
      Array.fill(64)(rnd.nextGaussian()))).toDF("a", "b")
    val cmp = df.select(
      GraftFunctions.dot(col("a"), col("b")).as("fast"),
      VectorFns.dotD(col("a"), col("b")).as("slow"))
      .as[(Double, Double)].collect()
    cmp.foreach { case (f, sl) =>
      assert(java.lang.Double.doubleToLongBits(f) == java.lang.Double.doubleToLongBits(sl),
        s"$f != $sl")
    }
  }

  test("DotProduct handles mismatched lengths and empty arrays") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(2.0)),      // min-length semantics
      (Array.empty[Double], Array(1.0, 2.0))   // empty → 0.0
    ).toDF("a", "b")
    val got = df.select(GraftFunctions.dot(col("a"), col("b"))).as[Double].collect()
    assert(got.toSeq == Seq(2.0, 0.0))
  }

  test("MinHashSig ≡ per-permutation transform+array_min baseline") {
    val p = 1000000007L
    val rnd = new scala.util.Random(77)
    val as = Array.fill(8)(math.abs(rnd.nextLong()) % (p - 1) + 1)
    val bs = Array.fill(8)(math.abs(rnd.nextLong()) % p)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "test_minhash", exprs => MinHashSig(exprs.head, as, bs, p), "built-in")
    val df = Seq.fill(100)(Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong().abs % p))
      .toDF("hx")
    val slow = array(as.zip(bs).map { case (a, b) =>
      array_min(transform(col("hx"), h => pmod(h * a + b, lit(p))))
    }: _*)
    val cmp = df.select(call_function("test_minhash", col("hx")).as("fast"), slow.as("slow"))
      .as[(Seq[Long], Seq[Long])].collect()
    cmp.foreach { case (f, sl) => assert(f == sl) }
  }

  test("MinHashSig returns null on empty input (array_min semantics)") {
    val df = Seq(Seq.empty[Long]).toDF("hx")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "test_minhash0", exprs => MinHashSig(exprs.head, Array(3L), Array(5L), 97L), "built-in")
    val got = df.select(call_function("test_minhash0", col("hx"))).collect()
    assert(got.head.isNullAt(0))
  }

  test("RollingHash ≡ split+ascii+aggregate HOF baseline (incl. empty string)") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(53)
    val texts = Seq("") ++ Seq.fill(200)(
      Seq.fill(rnd.nextInt(120))((32 + rnd.nextInt(95)).toChar).mkString)
    val cmp = texts.toDF("t").select(
      graft.functions.GraftFunctions.rollhash(col("t")).as("fast"),
      graft.functions.TextFns.rollingHashHof(col("t")).as("slow"))
      .as[(Long, Long)].collect()
    cmp.foreach { case (f, sl) => assert(f == sl, s"$f != $sl") }
  }
}
