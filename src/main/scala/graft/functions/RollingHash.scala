package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin rolling hash h = fold(chars, 0, (acc, c) → (acc·31 + c)
  * mod 1e9+7) as a fused codegen loop — replaces the
  * split-per-character + transform + aggregate HOF tree, which
  * allocates a one-char-string array element per character of every
  * document. Semantics are identical on BMP text (charAt code unit ==
  * the codepoint ascii() returns; fixtures are ASCII): same
  * left-to-right fold, same modulus, empty string → 0 (the HOF form's
  * single ascii('') = 0 step is a fixed point of the fold). acc stays
  * < 2^35, far from overflow.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rollhash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) { acc = (acc * 31L + s.charAt(i)) % 1000000007L; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |java.lang.String $str = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $str.length(); $i++) {
         |  $acc = ($acc * 31L + (long) $str.charAt($i)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
