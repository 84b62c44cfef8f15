package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native membership test against a pre-built Bloom filter, carried in
  * the expression itself as serialized bytes.
  *
  * The filter deserializes lazily — once per executor JVM that touches
  * the plan, not per row and not per task — and codegen calls straight
  * into `mightContainBinary` on the raw UTF8 bytes, so the probe stays
  * inside whole-stage codegen with zero per-row allocation (no
  * String materialisation: spark-sketch's `putString` hashes exactly
  * the UTF-8 bytes that `UTF8String.getBytes` yields, so binary and
  * string probes agree).
  *
  * This is the scan-side primitive for incremental corpus dedup
  * (graft.dedup.Dedup.incrementalDedup): a batch scan filters against
  * the corpus fingerprint bloom without shuffling either side.
  */
case class BloomContains(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_contains"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Probe entry point shared by interpreted eval and generated code. */
  def contains(bytes: Array[Byte]): Boolean = bloom.mightContainBinary(bytes)

  override def nullSafeEval(v: Any): Any =
    contains(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the expression instance, not the filter: the instance
    // (bytes + lazy val) serializes with the plan and each executor
    // deserializes the filter exactly once on first probe
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomContains].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.contains($v.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

object BloomContains {
  /** Column wrapper: `col` must be a string column. */
  def contains(col: Column, bloom: BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    CatalystBridge.column(BloomContains(CatalystBridge.expression(col), out.toByteArray))
  }
}
