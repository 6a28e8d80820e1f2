package graft

import graft.operators.{Overlap, Preflight}
import org.apache.spark.sql.functions._

class PreflightSpec extends SparkSpec {
  import spark.implicits._

  test("joinSize algebra on a planted key profile") {
    val a = Seq(1, 1, 2, 9).toDF("k")     // counts: 1->2, 2->1, 9->1
    val b = Seq(1, 1, 1, 3, 3).toDF("kb") // counts: 1->3, 3->2
    val row = Preflight.joinSize(a, "k", b, "kb").collect().head
    assert(row.getAs[Long]("shared_keys") == 1L)
    assert(row.getAs[Long]("join_rows") == 6L) // 2*3
    assert(row.getAs[Int]("max_key") == 1)
    assert(row.getAs[Long]("max_key_rows") == 6L)
  }

  test("joinSize with zero shared keys yields one (0, null, null, null) row") {
    val a = Seq(1, 2).toDF("k")
    val b = Seq(3, 4).toDF("kb")
    val rows = Preflight.joinSize(a, "k", b, "kb").collect()
    assert(rows.length == 1) // the SQL mirror's `FROM cells, top` shape
    val row = rows.head
    assert(row.getAs[Long]("shared_keys") == 0L)
    assert(row.isNullAt(row.fieldIndex("join_rows")))
    assert(row.isNullAt(row.fieldIndex("max_key")))
    assert(row.isNullAt(row.fieldIndex("max_key_rows")))
  }

  test("preflight join_rows equals the executed join's row count") {
    val li = Tables(spark, sf).lineitem
    val predicted = Preflight.joinSize(li, "l_partkey", li, "l_partkey")
      .collect().head.getAs[Long]("join_rows")
    val actual = li.select(col("l_partkey")).as("a")
      .join(li.select(col("l_partkey").as("pb")), col("l_partkey") === col("pb"))
      .count()
    assert(predicted == actual, s"predicted $predicted vs executed $actual")
  }

  test("audienceOverlap counts users engaging both types, with Jaccard") {
    val df = Seq(
      (1L, "x"), (1L, "y"), (1L, "x"), // user 1: x,y (dup collapses)
      (2L, "x"),                       // user 2: x only
      (3L, "x"), (3L, "y"), (3L, "z"), // user 3: x,y,z
    ).toDF("user_id", "event_type")
    val got = Overlap.audienceOverlap(df)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // x:3 users, y:2, z:1 ; x∩y=2, x∩z=1, y∩z=1
    assert(got.toSeq == Seq(
      ("x", "y", 2L, round2(2.0 / 3)), ("x", "z", 1L, round2(1.0 / 3)),
      ("y", "z", 1L, 0.5)))
  }

  private def round2(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
