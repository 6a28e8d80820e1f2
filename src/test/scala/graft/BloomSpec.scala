package graft

import graft.operators.Bloom

/** The bloom membership contract: no false negatives — including on
  * inputs with duplicate rows, where a groupBy-all-columns probe once
  * collapsed duplicates into one group whose hit-sum became K×(dup
  * count) and flipped members to maybe=false.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives, duplicates preserved verbatim") {
    val keys = Seq(3L, 17L, 42L).toDF("x")
    val bloom = Bloom.build(keys)
    val probe = Seq(3L, 3L, 3L, 17L, 42L, 999L, 100000L).toDF("x")
    val out = Bloom.withMembership(probe, "x", bloom).collect()
    assert(out.length == 7, "duplicate probe rows must not collapse")
    val members = out.filter(r => Set(3L, 17L, 42L)(r.getLong(0)))
    assert(members.length == 5)
    assert(members.forall(_.getBoolean(1)),
      "every member occurrence must read maybe=true (no false negatives)")
  }

  test("non-members rejected at m=65536 with 3 set keys") {
    // 3 keys × k=3 → ≤9 set bits of 65536; P[false positive] ≈ (9/2^16)^3
    val keys = Seq(3L, 17L, 42L).toDF("x")
    val bloom = Bloom.build(keys)
    val out = Bloom.withMembership(Seq(999L, 100000L).toDF("x"), "x", bloom)
      .collect()
    assert(out.forall(!_.getBoolean(1)))
  }
}
