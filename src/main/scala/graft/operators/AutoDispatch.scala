package graft.operators

/** Size-gated routing between a reference-semantics exact operator and
  * its certified sub-linear escape path (r10 VERDICT item 3).
  *
  * Three inventory operators keep the reference's quadratic pair
  * semantics deliberately — q22 (exact cosine near-dup), q155
  * (brand-blocked Jaro–Winkler top-k), q172 (exact ER blocking
  * recall) — and each has a measured, oracled escape in the same
  * inventory (q170 ANN candidates exp 0.43, q164 prefix blocking
  * exp 1.05, q177 bucket sampling exp 0.21). This object makes the
  * escape the DEFAULT above a row threshold, so a 100× caller cannot
  * run the n² form by accident, while the oracle-gated scale factors
  * (≤20k parts / ≤2k vectors) stay on the exact form and keep their
  * hashes.
  *
  * Opt-out: setting `SPARK_GRAFT_REFERENCE_SEMANTICS` forces the exact
  * reference forms at ANY size — the escape paths trade recall scope
  * for growth (documented per operator), and a caller replaying the
  * reference bit-for-bit must be able to say so explicitly.
  */
object AutoDispatch {

  /** Explicit reference-semantics mode (exact forms at any size). */
  def referenceSemantics: Boolean =
    sys.env.contains("SPARK_GRAFT_REFERENCE_SEMANTICS")

  /** The routing decision, pure so the flip is spec-provable: exact
    * iff reference mode is forced or the input is at or under the
    * operator's exact-path row budget.
    */
  def useExact(n: Long, maxExactRows: Long,
      refSemantics: Boolean = referenceSemantics): Boolean =
    refSemantics || n <= maxExactRows

  /** True while an oracle-gated run is in flight (Verify sets the JVM
    * property for its whole dump). The registered oracles for
    * q22/q155/q172 are the EXACT reference forms, so an escape-path
    * dispatch during a gated run would fail the hash gate with a
    * confusing value mismatch; [[decide]] fails loud at dispatch time
    * instead (r11 ADVICE item 3 — the contract must not depend on
    * fixture sizes documented only in comments).
    */
  def oracleGated: Boolean = sys.props.get("graft.oracle.gated").contains("true")

  /** [[useExact]] plus the oracle-gate guard: choosing the escape path
    * under a gated run throws, naming the operator and its threshold,
    * rather than letting the exact-form oracle fail downstream.
    */
  def decide(n: Long, maxExactRows: Long, opName: String,
      refSemantics: Boolean = referenceSemantics,
      gated: Boolean = oracleGated): Boolean = {
    val exact = useExact(n, maxExactRows, refSemantics)
    if (!exact && gated)
      throw new IllegalStateException(
        s"$opName: oracle-gated run would dispatch to the APPROXIMATE escape " +
          s"path ($n rows > exact budget $maxExactRows) while the registered " +
          "oracle is the exact reference form. Shrink the fixture below the " +
          "budget or set SPARK_GRAFT_REFERENCE_SEMANTICS to force the exact path.")
    exact
  }
}
