package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** SplitMix64 finalizer over a long key — the engine's
  * explicitly-specified hash for sketch operators (SURVEY §2.4
  * "sketches"). Unlike the engine-private hashes behind
  * `approx_count_distinct`, this hash is pinned bit-for-bit by plain
  * integer arithmetic, so a sketch built on it (see
  * `graft.operators.Hll`) produces identical estimates in ANY engine —
  * which is what lets the q35 sketch sit under the DuckDB differential
  * gate. Wrap-around multiply/add is deliberate (hash semantics), done
  * in JVM long arithmetic where ANSI overflow checking does not apply.
  */
case class SplitMix64(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "splitmix64"

  override def nullSafeEval(v: Any): Any = SplitMix64.hash(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val z = ctx.freshName("z")
      s"""
         |long $z = $c + 0x9e3779b97f4a7c15L;
         |$z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |${ev.value} = $z ^ ($z >>> 31);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SplitMix64 {
  def hash(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** First 60 bits of md5 as a non-negative long — the engine's
  * cross-engine content hash (SURVEY §2.4), exactly equal to the
  * composed form `conv(substring(md5(x), 1, 15), 16, 10) :: long`
  * (15 hex chars = the digest's leading 60 bits), which is what the
  * DuckDB oracle mirrors as `CAST('0x' || substr(md5(x),1,15) AS
  * BIGINT)`. The composed form materializes a 32-char hex string,
  * substrings it, and re-parses it base-16 PER ROW; this expression
  * goes digest-bytes → long with no string round-trip and stays
  * inside whole-stage codegen. 60 bits (not 64) so the value is
  * always non-negative and in the exact integer range every engine
  * agrees on.
  */
case class Md5Long(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_long"

  override def nullSafeEval(v: Any): Any =
    Md5Long.hash(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.Md5Long.hash($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Md5Long {
  // MessageDigest.getInstance walks the provider list per call;
  // amortize it per thread (tasks are single-threaded over rows).
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    // leading 8 digest bytes big-endian, dropped low nibble = the
    // first 15 hex characters' value
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4
  }
}
