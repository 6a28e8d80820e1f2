package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._

/** MERGE semantics: delta wins, base survives, inserts appear, and
  * the three actions partition the merged snapshot exactly.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: delta wins, base survives, inserts appear") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val delta = Seq((2L, "B"), (9L, "Z")).toDF("k", "v")
    val out = Cdc.upsert(base, delta, "k").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out == Map(
      1L -> ("a", "keep"), 2L -> ("B", "update"),
      3L -> ("c", "keep"), 9L -> ("Z", "insert")))
  }

  test("a delta that explicitly nulls a field nulls it in the merge") {
    val base = Seq((1L, Some("a")), (2L, Some("b"))).toDF("k", "v")
    val delta = Seq((1L, None: Option[String])).toDF("k", "v")
    val out = Cdc.upsert(base, delta, "k").collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getString(2))).toMap
    assert(out(1L) == (None, "update"), s"NULL update must win: $out")
    assert(out(2L) == (Some("b"), "keep"))
  }

  test("a NULL-keyed delta row inserts with its payload intact") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val delta = Seq((Option.empty[Long], Some("x"))).toDF("k", "v")
    val out = Cdc.upsert(base, delta, "k").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1), r.getString(2))).toSet
    assert(out == Set((Some(1L), "a", "keep"), (None, "x", "insert")),
      s"payload must survive the join miss: $out")
  }

  test("upsert refuses mismatched schemas") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val bad = Seq((1L, "a", 0)).toDF("k", "v", "extra")
    intercept[IllegalArgumentException] {
      Cdc.upsert(base, bad, "k")
    }
  }

  test("q76 actions partition the merged snapshot") {
    val rows = run("q76_cdc_merge").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = Tables(spark, sf).orders
    val nBase = o.filter(col("o_orderkey") % 10 =!= 1).count()
    val nUpd = o.filter(col("o_orderkey") % 10 === 0).count()
    val nIns = o.filter(col("o_orderkey") % 10 === 1).count()
    assert(rows("update") == nUpd)
    assert(rows("insert") == nIns)
    assert(rows("keep") == nBase - nUpd)
  }
}
