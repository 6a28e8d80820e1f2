package graft

import graft.operators.Ivm

class IvmSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, d: Int) = java.time.LocalDateTime.of(2024, m, d, 0, 0)

  test("maintained view == recomputed view; emptied group vanishes") {
    val before = Seq(
      (1L, ts(1, 5), 10.00), (2L, ts(1, 9), 20.00), // Jan: 2 rows
      (3L, ts(2, 2), 30.00),                        // Feb: 1 row
      (4L, ts(3, 7), 40.00), (5L, ts(3, 8), 50.00), // Mar: 2 rows
    ).toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val after = Seq(
      (1L, ts(1, 5), 10.00), (2L, ts(1, 9), 25.50), // Jan: one update
      // Feb deleted entirely -> group must vanish from the view
      (4L, ts(3, 7), 40.00), (5L, ts(3, 8), 50.00),
      (9L, ts(4, 1), 99.99),                        // Apr: insert, new group
    ).toDF("o_orderkey", "o_orderdate", "o_totalprice")

    val maintained = Ivm.maintain(
        Ivm.orderRollup(before), Ivm.changeDelta(before, after))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val recomputed = Ivm.orderRollup(after)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(maintained.map(t => (t._1, t._2, t._3.doubleValue)) ==
      recomputed.map(t => (t._1, t._2, t._3.doubleValue)),
      s"maintained $maintained\nrecomputed $recomputed")
    assert(!maintained.exists(_._1 == "2024-02"), "emptied group must vanish")
    assert(maintained.exists(_._1 == "2024-04"), "inserted group must appear")
  }

  test("empty changeset maintains the view unchanged") {
    val base = Seq((1L, ts(1, 5), 10.00), (2L, ts(2, 6), 20.00))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val maintained = Ivm.maintain(
        Ivm.orderRollup(base), Ivm.changeDelta(base, base))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(maintained == Set(("2024-01", 1L), ("2024-02", 1L)))
  }
}
