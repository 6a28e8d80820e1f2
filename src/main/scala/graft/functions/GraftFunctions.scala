package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64}
import org.apache.spark.sql.graft.{CosineSimF32, DotProductF32, FreqSketch, JaroWinklerSim, KmvSketch, MaxSimScoreF32, Md5Long, MinHashSignature, NfcNormalize, Shims, SimHash64, SplitMix64, TopKScoreId, TopKScoreStr, WithinEdit1}
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

  /** maxsim_f32(array<float>, array<float>) → decimal(18,6): fused
    * late-interaction MaxSim over 8×8-dim token slices (codegen).
    */
  def maxSimF32(q: Column, d: Column): Column =
    col(MaxSimScoreF32(expr(q), expr(d)))

  /** simhash64(array<long>) → long over the low 60 bits. */
  def simhash64(a: Column): Column = col(SimHash64(expr(a)))

  /** minhash_sig(array<string>) → array<long>: single-pass 32-wide
    * MinHash signature (codegen).
    */
  def minhashSig(a: Column, numPerms: Int = 32): Column =
    col(MinHashSignature(expr(a), numPerms))

  /** splitmix64(long) → long: the pinned, engine-independent sketch
    * hash (codegen).
    */
  def splitmix64(c: Column): Column = col(SplitMix64(expr(c)))

  /** md5_long(binary) → long: the leading 60 bits of md5 as a
    * non-negative long — bit-equal to
    * `conv(substring(md5(x),1,15),16,10)::long` without the per-row
    * hex-string round-trip (codegen; see [[Md5Long]]).
    */
  def md5Long(c: Column): Column = col(Md5Long(expr(c)))

  /** nfc_normalize(string) → string: Unicode canonical composition
    * (NFC) with an ASCII fast path (codegen; see [[NfcNormalize]]).
    */
  def nfcNormalize(c: Column): Column = col(NfcNormalize(expr(c)))

  /** xxhash64 with an explicit seed (the built-in `xxhash64` function
    * pins seed=42; per-permutation MinHash needs distinct seeds).
    */
  def xxhash64Seeded(seed: Long, cols: Column*): Column =
    col(XxHash64(cols.map(expr), seed))

  /** within_edit1(string, string) → boolean: levenshtein ≤ 1 by a
    * single two-pointer scan (codegen) — the fuzzy-join verifier.
    */
  def withinEdit1(a: Column, b: Column): Column = col(WithinEdit1(expr(a), expr(b)))

  /** jaro_winkler(string, string) → double: classic Jaro–Winkler
    * similarity (codegen) — the blocked entity-resolution scorer.
    */
  def jaroWinkler(a: Column, b: Column): Column = col(JaroWinklerSim(expr(a), expr(b)))

  /** topk_score_id(score double, id bigint, k) → array<struct<score,id>>
    * sorted (score DESC, id ASC): grouped top-k with a k-bounded
    * map-side partial buffer (see [[TopKScoreId]]).
    */
  def topkScoreId(score: Column, id: Column, k: Int): Column =
    col(TopKScoreId(expr(score), expr(id), k).toAggregateExpression())

  /** topk_score_str(score double, key string, k): string-payload
    * variant of [[topkScoreId]] (same bounded-buffer property).
    */
  def topkScoreStr(score: Column, key: Column, k: Int): Column =
    col(TopKScoreStr(expr(score), expr(key), k).toAggregateExpression())

  /** kmv_sketch(hash string, k) → array<string>: the k smallest
    * DISTINCT hashes per group, ascending — the groupable KMV
    * distinct-count sketch (see [[KmvSketch]]).
    */
  def kmvSketch(hash: Column, k: Int): Column =
    col(KmvSketch(expr(hash), k).toAggregateExpression())

  /** cov_moments(array<float>) → struct(n, sx, sxy): exact covariance
    * sufficient statistics in one pass (q206 family).
    */
  def covMoments(arr: Column): Column =
    col(org.apache.spark.sql.graft.CovMoments(expr(arr)).toAggregateExpression())

  /** char_bigram_counts(s) → map<string,long>: per-document adjacent-
    * character bigram occurrence counts in one pass (q251 family).
    */
  def charBigramCounts(s: Column): Column =
    col(org.apache.spark.sql.graft.CharBigramCounts(expr(s)))

  /** nb_score_accum(c, lps) → struct(nb, sm, mc): per-document NB
    * sufficient statistics over `langs` (q251; see [[NbScoreAccum]]).
    */
  def nbScoreAccum(c: Column, lps: Column, langs: Seq[String]): Column =
    col(org.apache.spark.sql.graft.NbScoreAccum(expr(c), expr(lps), langs)
      .toAggregateExpression())

  /** freq_sketch(item string, k) → map<string,bigint>: Misra–Gries
    * top-k frequency estimates per group with a k-bounded buffer;
    * exact whenever a group's distinct-item count stays ≤ k (see
    * [[FreqSketch]]).
    */
  def freqSketch(item: Column, k: Int): Column =
    col(FreqSketch(expr(item), k).toAggregateExpression())

  private def arity(name: String, n: Int)(es: Seq[Expression]): Unit =
    require(es.length == n,
      s"$name expects $n argument(s), got ${es.length}")

  /** One builder table shared by both registration paths (registerAll
    * and GraftExtensions) so SQL behavior can't diverge between them.
    */
  val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_f32" -> (es => { arity("dot_f32", 2)(es); DotProductF32(es(0), es(1)) }),
    "cosine_f32" -> (es => { arity("cosine_f32", 2)(es); CosineSimF32(es(0), es(1)) }),
    "simhash64" -> (es => { arity("simhash64", 1)(es); SimHash64(es(0)) }),
    "splitmix64" -> (es => { arity("splitmix64", 1)(es); SplitMix64(es(0)) }),
    "md5_long" -> (es => { arity("md5_long", 1)(es); Md5Long(es(0)) }),
    "nfc_normalize" -> (es => { arity("nfc_normalize", 1)(es); NfcNormalize(es(0)) }),
    "within_edit1" -> (es => { arity("within_edit1", 2)(es); WithinEdit1(es(0), es(1)) }),
    "jaro_winkler" -> (es => { arity("jaro_winkler", 2)(es); JaroWinklerSim(es(0), es(1)) }),
    // k must be a positive integer literal (it sizes the agg buffer)
    "topk_score_id" -> (es => es match {
      case Seq(s, i, kE) if kE.foldable =>
        kE.eval() match {
          case n: Number if n.intValue() > 0 =>
            TopKScoreId(s, i, n.intValue()).toAggregateExpression()
          case other => throw new IllegalArgumentException(
            s"topk_score_id k must be a positive integer literal, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "topk_score_id expects (score double, id bigint, k literal)")
    }),
    "topk_score_str" -> (es => es match {
      case Seq(s, v, kE) if kE.foldable =>
        kE.eval() match {
          case n: Number if n.intValue() > 0 =>
            TopKScoreStr(s, v, n.intValue()).toAggregateExpression()
          case other => throw new IllegalArgumentException(
            s"topk_score_str k must be a positive integer literal, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "topk_score_str expects (score double, key string, k literal)")
    }),
    "kmv_sketch" -> (es => es match {
      case Seq(h, kE) if kE.foldable =>
        kE.eval() match {
          case n: Number if n.intValue() > 0 =>
            KmvSketch(h, n.intValue()).toAggregateExpression()
          case other => throw new IllegalArgumentException(
            s"kmv_sketch k must be a positive integer literal, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "kmv_sketch expects (hash string, k literal)")
    }),
    "freq_sketch" -> (es => es match {
      case Seq(h, kE) if kE.foldable =>
        kE.eval() match {
          case n: Number if n.intValue() > 0 =>
            FreqSketch(h, n.intValue()).toAggregateExpression()
          case other => throw new IllegalArgumentException(
            s"freq_sketch k must be a positive integer literal, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "freq_sketch expects (item string, k literal)")
    }),
    // optional second arg: permutation count (non-null int literal)
    "minhash_sig" -> (es => es match {
      case Seq(e) => MinHashSignature(e)
      case Seq(e, n) if n.foldable =>
        n.eval() match {
          case i: Number if i.intValue() > 0 => MinHashSignature(e, i.intValue())
          case other => throw new IllegalArgumentException(
            s"minhash_sig numPerms must be a positive integer literal, got $other")
        }
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
  * Shares `GraftFunctions.sqlFunctions` with registerAll — identical
  * builders on both paths, including arity/argument validation.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.sqlFunctions.foreach { case (name, builder) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            classOf[GraftFunctions.type].getName, name),
          builder))
    }
}
