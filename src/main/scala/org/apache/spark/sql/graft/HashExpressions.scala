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
