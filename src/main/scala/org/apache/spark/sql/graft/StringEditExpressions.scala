package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `within_edit1(a, b)` — true iff levenshtein(a, b) ≤ 1, decided by a
  * single two-pointer scan instead of the full O(|a|·|b|) DP the
  * general `levenshtein` expression runs: length gap > 1 is false
  * outright; equal lengths allow one substitution; gap-1 lengths allow
  * one skip in the longer string. The scan runs over raw UTF-8 bytes
  * when BOTH operands are pure ASCII (byte equality ≡ codepoint
  * equality there, and the all-ASCII test is one pass that the hot
  * fuzzy-join path always satisfies); any non-ASCII byte on either
  * side falls back to the same scan over decoded CODEPOINTS, so a
  * substitution that changes encoded length ('a'→'é', 1 byte → 2) is
  * still one edit — byte-only scanning would reject it. Verified
  * against `levenshtein` (incl. non-ASCII pairs) in the spec suite.
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

/** `jaro_winkler(a, b)` — the classic Jaro similarity (match window
  * ⌊max(|a|,|b|)/2⌋−1, greedy first-unmatched in-window matching,
  * transpositions = half the mismatches between the two matched
  * sequences) with the Winkler prefix boost (+ℓ·0.1·(1−jaro) for the
  * common prefix ℓ ≤ 4, applied only when jaro > 0.7). Either operand
  * empty scores 0. Semantics pinned against DuckDB's
  * `jaro_winkler_similarity` on the edge cases (2-char windows,
  * transposition-heavy pairs, one-sided length gaps) so the
  * differential oracle compares like for like; the arithmetic is
  * divisions of small exact integers — no libm — so both engines land
  * on the same double to well under the ROUND(,6) the queries apply.
  *
  * Built for blocked entity-resolution joins ([[graft.operators.Fuzzy]]):
  * candidates arrive pre-blocked (equi-key + length band), the scorer
  * runs once per candidate pair inside codegen.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerSim.sim(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = org.apache.spark.sql.graft.JaroWinklerSim.sim($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {

  def sim(au: UTF8String, bu: UTF8String): Double =
    jaroWinkler(au.toString.codePoints().toArray, bu.toString.codePoints().toArray)

  /** Codepoint-array Jaro–Winkler; see the case-class doc for the
    * pinned semantics.
    */
  def jaroWinkler(a: Array[Int], b: Array[Int]): Double = {
    if (a.length == 0 || b.length == 0) return 0.0
    val window = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val aFlag = new Array[Boolean](a.length)
    val bFlag = new Array[Boolean](b.length)
    var m = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(i - window, 0)
      val hi = math.min(i + window, b.length - 1)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bFlag(j) && a(i) == b(j)) {
          aFlag(i) = true; bFlag(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // mismatches between the two matched sequences, then halved
    var k = 0
    var j = 0
    i = 0
    while (i < a.length) {
      if (aFlag(i)) {
        while (!bFlag(j)) j += 1
        if (a(i) != b(j)) k += 1
        j += 1
      }
      i += 1
    }
    val t = k / 2
    val jaro = (m.toDouble / a.length + m.toDouble / b.length +
      (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var p = 0
      val pMax = math.min(math.min(a.length, b.length), 4)
      while (p < pMax && a(p) == b(p)) p += 1
      jaro + 0.1 * p * (1.0 - jaro)
    }
  }
}

object WithinEdit1 {
  /** One-edit decision: byte scan on all-ASCII operands, codepoint scan
    * otherwise (levenshtein is defined over codepoints — a multi-byte
    * substitution is ONE edit even when the encodings differ in length).
    */
  def oneEdit(a: Array[Byte], b: Array[Byte]): Boolean =
    if (allAscii(a) && allAscii(b)) oneEditBytes(a, b)
    else oneEditInts(
      new String(a, java.nio.charset.StandardCharsets.UTF_8).codePoints().toArray,
      new String(b, java.nio.charset.StandardCharsets.UTF_8).codePoints().toArray)

  private def allAscii(a: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) { if ((a(i) & 0x80) != 0) return false; i += 1 }
    true
  }

  /** Two-pointer one-edit scan over raw UTF-8 bytes (ASCII-only callers). */
  def oneEditBytes(a: Array[Byte], b: Array[Byte]): Boolean = {
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

  /** The same scan over decoded codepoints — the non-ASCII fallback. */
  private def oneEditInts(a: Array[Int], b: Array[Int]): Boolean = {
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
        if (gap == 0) { i += 1; j += 1 }
        else j += 1
      }
    }
    edits + (l.length - j) + (s.length - i) <= 1
  }
}
