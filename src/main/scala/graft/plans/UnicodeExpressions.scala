package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) — the first
  * step of the ftfy-style text repair a web corpus needs: "e" + combining
  * acute and precomposed "é" must hash, dedup, shingle, and join as the
  * SAME text, or every sketch operator silently treats visually identical
  * documents as distinct.
  *
  * Spark has no normalization builtin, so this is a native expression
  * over `java.text.Normalizer` (ICU-equivalent for NFC). The common case
  * — already-normalized ASCII/NFC text — takes the zero-allocation
  * `isNormalized` fast path and returns the input buffer untouched.
  * External engines reproduce it with their own NFC (DuckDB
  * `nfc_normalize`): canonical composition is a Unicode-defined function,
  * so implementations agree by specification.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object UnicodeExpressions {
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
