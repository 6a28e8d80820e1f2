package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64}
import org.apache.spark.sql.graft.{CosineSimF32, DotProductF32, MinHashSignature, Shims, SimHash64}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** Column-level API + SQL registration for the graft expressions.
  *
  * Exposed two ways, per the extension-point guidance:
  *  - `GraftExtensions` for `spark.sql.extensions=` /
  *    `.withExtensions(...)` wiring;
  *  - `registerAll(spark)` for an already-built session (the driver
  *    harness constructs its own).
  */
object GraftFunctions {

  private def expr(c: Column): Expression = Shims.toExpression(c)
  private def col(e: Expression): Column = Shims.toColumn(e)

  /** dot_f32(array<float>, array<float>) → double (codegen). */
  def dotF32(a: Column, b: Column): Column = col(DotProductF32(expr(a), expr(b)))

  /** cosine_f32(array<float>, array<float>) → double (codegen). */
  def cosineF32(a: Column, b: Column): Column = col(CosineSimF32(expr(a), expr(b)))

  /** simhash64(array<long>) → long over the low 60 bits. */
  def simhash64(a: Column): Column = col(SimHash64(expr(a)))

  /** minhash_sig(array<string>) → array<long>: single-pass 32-wide
    * MinHash signature (codegen).
    */
  def minhashSig(a: Column, numPerms: Int = 32): Column =
    col(MinHashSignature(expr(a), numPerms))

  /** xxhash64 with an explicit seed (the built-in `xxhash64` function
    * pins seed=42; per-permutation MinHash needs distinct seeds).
    */
  def xxhash64Seeded(seed: Long, cols: Column*): Column =
    col(XxHash64(cols.map(expr), seed))

  private def arity(name: String, n: Int)(es: Seq[Expression]): Unit =
    require(es.length == n,
      s"$name expects $n argument(s), got ${es.length}")

  private val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_f32" -> (es => { arity("dot_f32", 2)(es); DotProductF32(es(0), es(1)) }),
    "cosine_f32" -> (es => { arity("cosine_f32", 2)(es); CosineSimF32(es(0), es(1)) }),
    "simhash64" -> (es => { arity("simhash64", 1)(es); SimHash64(es(0)) }),
    // optional second arg: permutation count (foldable int literal)
    "minhash_sig" -> (es => es match {
      case Seq(e) => MinHashSignature(e)
      case Seq(e, n) if n.foldable =>
        MinHashSignature(e, n.eval().asInstanceOf[Number].intValue())
      case _ => throw new IllegalArgumentException(
        "minhash_sig expects (array<string>[, numPerms literal])")
    }),
  )

  def registerAll(spark: SparkSession): Unit =
    sqlFunctions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

/** `SparkSessionExtensions` hook: inject the graft functions at session
  * build time (usable via `spark.sql.extensions=graft.functions.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("dot_f32"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotProductF32].getName, "dot_f32"),
        (es: Seq[Expression]) => DotProductF32(es(0), es(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_f32"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CosineSimF32].getName, "cosine_f32"),
        (es: Seq[Expression]) => CosineSimF32(es(0), es(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[SimHash64].getName, "simhash64"),
        (es: Seq[Expression]) => SimHash64(es(0))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[MinHashSignature].getName, "minhash_sig"),
        (es: Seq[Expression]) => MinHashSignature(es.head)))
  }
}
