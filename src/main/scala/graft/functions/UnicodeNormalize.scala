package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst NFC unicode normalization (java.text.Normalizer).
  *
  * Canonical-composition normalization is a standard corpus-cleaning
  * step (decomposed accents, compatibility glyph variants, and
  * platform-dependent encodings otherwise make byte-identical text
  * hash to different fingerprints, so exact dedup silently misses
  * duplicates). Spark ships no normalization function; a Scala UDF
  * would break whole-stage codegen at exactly the hot path — the
  * full-corpus scan — so this is an `Expression` with `doGenCode`,
  * staying inside the generated loop like [[DotProduct]].
  *
  * NFC specifically (not NFKC): it is the form DuckDB's
  * `nfc_normalize` implements, giving the oracle an independent
  * engine to pin against; the already-NFC fast path is a cheap
  * `isNormalized` check, so ASCII-dominated corpora pay almost
  * nothing.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted and generated paths (identical semantics). */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfc(c: Column): Column =
    CatalystBridge.column(NfcNormalize(CatalystBridge.expression(c)))
}
