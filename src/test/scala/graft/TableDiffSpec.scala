package graft

import graft.operators.TableDiff

class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diffReport classifies all four statuses, null-safe on payload") {
    val a = Seq(
      (1L, Option(10.0)), // unchanged
      (2L, Option(20.0)), // changed (value)
      (3L, Option(30.0)), // removed
      (4L, None),         // unchanged (NULL == NULL, null-safely)
      (5L, Option(50.0)), // changed (value -> NULL)
    ).toDF("k", "v")
    val b = Seq(
      (1L, Option(10.0)),
      (2L, Option(21.0)),
      (4L, None: Option[Double]),
      (5L, None: Option[Double]),
      (6L, Option(60.0)), // added
    ).toDF("k", "v")
    val got = TableDiff.diffReport(a, b, "k", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("added", 1L, 6L),
      ("changed", 2L, 7L),
      ("removed", 1L, 3L),
      ("unchanged", 2L, 5L),
    ))
  }

  test("drifted replica drifts: every class non-empty on the fixture") {
    val got = run("q119_table_diff")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("added", "removed", "changed", "unchanged"))
    assert(got.values.forall(_ > 0))
  }
}
