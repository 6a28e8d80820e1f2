package graft

import graft.operators.Ewma

/** EWMA: the closed-form weighted-window sum must equal the sequential
  * recurrence it replaces, regardless of input row order.
  */
class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def sequential(vs: Seq[Double], alpha: Double): Double =
    vs.tail.foldLeft(vs.head)((s, v) => alpha * v + (1 - alpha) * s)

  test("closed form == recurrence, input order irrelevant") {
    val series = (1 to 50).map(i => (i.toLong, math.sin(i.toDouble) * 100))
    // two users, rows deliberately NOT in timeline order
    val rows = (for {
      u <- Seq(7L, 8L)
      (i, v) <- series
    } yield (u, i, i + u * 1000, if (u == 7L) v else -v)).reverse
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val got = Ewma.ewmaByUser(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exp7 = sequential(series.map(_._2), Ewma.Alpha)
    val exp8 = sequential(series.map(-_._2), Ewma.Alpha)
    assert(got(7L)._1 == 50L && got(8L)._1 == 50L)
    assert(math.abs(got(7L)._2 - exp7) < 1e-6, s"${got(7L)._2} vs $exp7")
    assert(math.abs(got(8L)._2 - exp8) < 1e-6, s"${got(8L)._2} vs $exp8")
  }

  test("single-event user: ewma is the value itself") {
    val df = Seq((1L, 1L, 1L, 42.5)).toDF("user_id", "ts", "event_id", "value")
    val got = Ewma.ewmaByUser(df).collect().head
    assert(got.getLong(1) == 1L && got.getDouble(2) == 42.5)
  }

  test("trending: rising series outranks falling series of equal volume") {
    // 20 steps: the s1=v1 initialization carries (1-α)^19 ≈ 0.1% by the
    // end, so the recency weighting dominates (at 4 steps it would NOT:
    // a falling series' high start still outweighs 3 recent steps)
    val n = 20
    val daily = (1 to n).flatMap(i => Seq(
      ("rising", i, i.toDouble), ("falling", i, (n + 1 - i).toDouble)))
      .toDF("event_type", "day", "cnt")
    val got = Ewma.smoothed(daily, "event_type", Seq("day"), "cnt",
        Ewma.Alpha, "n_days", "trend")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("rising") > got("falling"),
      s"recency weighting inverted: $got")
    // both are convex combinations of the counts -> inside [1, n]
    assert(got.values.forall(v => v >= 1.0 && v <= n))
  }

  test("ties on ts break by event_id deterministically") {
    // same ts for all rows: order = event_id; last event dominates
    val df = Seq((1L, 5L, 1L, 0.0), (1L, 5L, 2L, 0.0), (1L, 5L, 3L, 100.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Ewma.ewmaByUser(df).collect().head.getDouble(2)
    assert(math.abs(got - 30.0) < 1e-9) // 0.3*100 + 0.7*(0.3*0 + 0.7*0)
  }
}
