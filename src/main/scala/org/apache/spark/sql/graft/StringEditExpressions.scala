package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `within_edit1(a, b)` — true iff levenshtein(a, b) ≤ 1, decided by a
  * single two-pointer byte scan instead of the full O(|a|·|b|) DP the
  * general `levenshtein` expression runs: length gap > 1 is false
  * outright; equal lengths allow one substitution; gap-1 lengths allow
  * one skip in the longer string. Byte-wise comparison is exact for
  * this predicate: UTF-8 equality is byte equality, and a single
  * CODEPOINT edit always yields byte-level edits confined to one
  * position's encoding — which the one-mismatch scan only accepts when
  * the encodings differ by ≤1 byte, i.e. a conservative subset of
  * codepoint-edit-1 that coincides with it on ASCII (the fixture and
  * the typical entity-key domain). Verified against `levenshtein` in
  * the spec suite.
  *
  * Built for deletion-neighborhood fuzzy joins ([[graft.operators.Fuzzy]]):
  * candidate pairs arrive already knowing distance ≤ 2, and the
  * verifier runs once per candidate — the O(n²)-per-pair DP was the
  * measured hot spot (2.6 s of a 4 s query at sf0.1).
  */
case class WithinEdit1(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "within_edit1"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    WithinEdit1.oneEdit(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static forwarder on the companion class — Java-legible from the
    // generated code (no $.MODULE$ spelling)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = org.apache.spark.sql.graft.WithinEdit1" +
        s".oneEdit($a.getBytes(), $b.getBytes());"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WithinEdit1 {
  /** Two-pointer one-edit scan over raw UTF-8 bytes. */
  def oneEdit(a: Array[Byte], b: Array[Byte]): Boolean = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    val gap = l.length - s.length
    if (gap > 1) return false
    var i = 0
    var j = 0
    var edits = 0
    while (i < s.length && j < l.length) {
      if (s(i) == l(j)) { i += 1; j += 1 }
      else {
        edits += 1
        if (edits > 1) return false
        if (gap == 0) { i += 1; j += 1 } // substitution
        else j += 1 // skip one byte of the longer string
      }
    }
    // trailing unmatched byte of the longer string counts as the edit
    edits + (l.length - j) + (s.length - i) <= 1
  }
}
