package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused k-permutation MinHash over a pre-hashed shingle array: one pass
  * over the input computes all k minima (h·aᵢ+bᵢ mod p), replacing k
  * separate interpreted transform+array_min trees. Semantics identical
  * to the higher-order-function formulation (asserted in DedupSpec via
  * planted duplicates and determinism tests).
  *
  * Returns null for empty shingle arrays (no minimum exists).
  */
case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override def nullable: Boolean = true

  override def nullSafeEval(in: Any): Any = {
    val hs = in.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val k = a.length
    val out = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < k) {
        val v = (h * a(i) + b(i)) % p
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
      val (n, k, out, jv, iv, hv, vv) = (ctx.freshName("n"), ctx.freshName("k"),
        ctx.freshName("out"), ctx.freshName("j"), ctx.freshName("i"),
        ctx.freshName("h"), ctx.freshName("v"))
      s"""
         |int $n = $in.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $k = $aRef.length;
         |  long[] $out = new long[$k];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $jv = 0; $jv < $n; $jv++) {
         |    long $hv = $in.getLong($jv);
         |    for (int $iv = 0; $iv < $k; $iv++) {
         |      long $vv = ($hv * $aRef[$iv] + $bRef[$iv]) % ${p}L;
         |      if ($vv < $out[$iv]) $out[$iv] = $vv;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The engine's fixed MinHash permutation family (seeded, public
  * algorithm: h_i(x) = (a_i·x + b_i) mod p). Living here lets
  * [[GraftExtensions]] register `graft_minhash` once per session instead
  * of each query re-registering it (which spams the function registry).
  * p = 1e9+7 keeps a·h+b < ~1e18, inside signed-64 (ANSI mode throws on
  * overflow). */
object MinHashSig {
  val P: Long = 1000000007L
  val coeffs: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(32)((math.abs(rnd.nextLong()) % (P - 1) + 1, math.abs(rnd.nextLong()) % P))
  }
  def make(exprs: Seq[Expression]): Expression =
    MinHashSig(exprs.head, coeffs.map(_._1).toArray, coeffs.map(_._2).toArray, P)
}
