package graft

import graft.operators.Checksum
import org.apache.spark.sql.functions._

/** The integrity-fingerprint contract: invariant under row order and
  * partitioning, sensitive to any single-cell change.
  */
class ChecksumSpec extends SparkSpec {

  private def fp(df: org.apache.spark.sql.DataFrame): (Long, String) = {
    val r = Checksum.tableChecksum(df,
      Seq(col("o_orderkey"), col("o_orderstatus"))).head
    (r.getLong(0), r.getString(1))
  }

  test("checksum is partitioning- and order-invariant") {
    val o = Tables(spark, sf).orders
    assert(fp(o) == fp(o.repartition(17)))
    assert(fp(o) == fp(o.orderBy(desc("o_totalprice"))))
  }

  test("even-multiplicity row swaps do NOT cancel (the XOR failure mode)") {
    import spark.implicits._
    val a = Seq("r1", "r1", "r2", "r2").toDF("v")
    val b = Seq("r3", "r3", "r2", "r2").toDF("v")
    def sums(df: org.apache.spark.sql.DataFrame) =
      Checksum.tableChecksum(df, Seq(col("v"))).head.getString(1)
    assert(sums(a) != sums(b), "a pair-for-pair substitution must change the sum")
  }

  test("empty frame: zero rows, NULL checksum (not a crash)") {
    val empty = Tables(spark, sf).orders.filter(col("o_orderkey") < 0)
    val r = Checksum.tableChecksum(empty, Seq(col("o_orderkey"))).head
    assert(r.getLong(0) == 0L)
    assert(r.isNullAt(1))
  }

  test("bucketChecksums: localizes a change to its bucket; counts partition the table") {
    import spark.implicits._
    val base = (0L until 200L).map(i => (i, s"v$i")).toDF("id", "v")
    val cols = Seq(col("id"), col("v"))
    val a = Checksum.bucketChecksums(base, expr("id div 50"), cols)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(a.keySet == Set(0L, 1L, 2L, 3L))
    assert(a.values.map(_._1).sum == 200L)
    // mutate one row in bucket 2: only bucket 2's checksum changes
    val mutated = base.withColumn("v",
      when(col("id") === 123L, lit("CHANGED")).otherwise(col("v")))
    val b = Checksum.bucketChecksums(mutated, expr("id div 50"), cols)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(b(2L) != a(2L))
    assert(Seq(0L, 1L, 3L).forall(k => b(k) == a(k)))
  }

  test("checksum detects a single-cell change") {
    val o = Tables(spark, sf).orders
    val tampered = o.withColumn("o_orderstatus",
      when(col("o_orderkey") === o.select(max("o_orderkey")).head.getLong(0),
        lit("X")).otherwise(col("o_orderstatus")))
    val (n1, c1) = fp(o)
    val (n2, c2) = fp(tampered)
    assert(n1 == n2 && c1 != c2)
  }
}
