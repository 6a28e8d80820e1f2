package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(s)` — Unicode canonical composition (NFC) of a
  * string, the normalization pass a corpus runs before exact dedup so
  * that byte-different but canonically-equal crawls ("café" with a
  * precomposed U+00E9 vs "cafe" + combining U+0301) collapse to one
  * representative. Stock Spark has no normalization function at all;
  * this is a codegen `Expression` over the JDK's `java.text.Normalizer`
  * (ICU-grade NFC ships with the runtime — no external library).
  *
  * Fast path: a pure-ASCII string is already NFC by definition, so a
  * single byte scan skips the (allocating) normalizer for the dominant
  * case — the same all-ASCII gate [[WithinEdit1]] uses. Only strings
  * carrying a non-ASCII byte pay the decode + normalize + re-encode.
  *
  * Differential oracle: DuckDB's `nfc_normalize` implements the same
  * Unicode normal form, so NFC-keyed results cross the gate exactly
  * (q201).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = org.apache.spark.sql.graft.NfcNormalize.nfc($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static forwarder for the generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) { // non-ASCII byte: take the normalizer path
        val str = s.toString
        val out =
          if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) str
          else Normalizer.normalize(str, Normalizer.Form.NFC)
        return UTF8String.fromString(out)
      }
      i += 1
    }
    s // pure ASCII is NFC already — no allocation
  }
}
