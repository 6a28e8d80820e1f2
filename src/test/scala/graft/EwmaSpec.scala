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

  test("ties on ts break by event_id deterministically") {
    // same ts for all rows: order = event_id; last event dominates
    val df = Seq((1L, 5L, 1L, 0.0), (1L, 5L, 2L, 0.0), (1L, 5L, 3L, 100.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Ewma.ewmaByUser(df).collect().head.getDouble(2)
    assert(math.abs(got - 30.0) < 1e-9) // 0.3*100 + 0.7*(0.3*0 + 0.7*0)
  }
}
