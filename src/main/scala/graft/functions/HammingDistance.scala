package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst hamming distance over two equal-width bit-signature
  * strings (the '0'/'1' simhash64 / dHash / audio-fingerprint
  * convention): number of positions whose characters differ, compared
  * over the first min(len) bytes.
  *
  * The Column-API formulation is a width-term chain of
  * `substring(a,j,1) =!= substring(b,j,1)` comparisons — codegen'd but
  * 64 UTF8String allocations per row and an expression tree whose
  * generated method grows with the signature width (the C2 jit-tax
  * documented on stopwordHits). This expression generates ONE tight
  * byte loop instead; signatures are ASCII by construction, so byte
  * comparison == character comparison, and results are bit-identical
  * to the chain (and to the oracle's substr sum).
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    val n = math.min(x.length, y.length)
    var d = 0
    var i = 0
    while (i < n) { if (x(i) != y(i)) d += 1; i += 1 }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xa = ctx.freshName("xa")
      val yb = ctx.freshName("yb")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |byte[] $xa = $a.getBytes();
         |byte[] $yb = $b.getBytes();
         |int $n = java.lang.Math.min($xa.length, $yb.length);
         |int $d = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($xa[$i] != $yb[$i]) $d++;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  /** Column wrapper: both sides string bit-signatures. */
  def hamming(a: Column, b: Column): Column =
    CatalystBridge.column(HammingDistance(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))
}
