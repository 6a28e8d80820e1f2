package graft

import graft.operators.{Regression, Sliding}

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("dailyTrend recovers a planted exact line per group") {
    // y = 2x + 5 on group a (x = day offset), y = -0.5x + 100 on b
    val rows = (0 until 10).flatMap { i =>
      val ts = java.time.LocalDateTime.of(2024, 1, 1 + i, 12, 0)
      Seq(("a", ts, 2.0 * (i + dayBase) + 5.0), ("b", ts, -0.5 * (i + dayBase) + 100.0))
    }
    val df = rows.toDF("g", "ts", "value")
    val got = Regression.dailyTrend(df, "g", "ts", "value")
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got("a") == ((2.0, 5.0)), s"got ${got("a")}")
    assert(got("b") == ((-0.5, 100.0)), s"got ${got("b")}")
  }

  test("single-day group: slope undefined -> NULL, not Inf/NaN") {
    val ts = java.time.LocalDateTime.of(2024, 3, 1, 10, 0)
    val df = Seq(("a", ts, 1.0), ("a", ts.plusHours(2), 5.0)).toDF("g", "ts", "value")
    val row = Regression.dailyTrend(df, "g", "ts", "value").collect().head
    assert(row.isNullAt(2) && row.isNullAt(3), row.toString)
  }

  // days between 1990-01-01 and 2024-01-01 — the x of the first row
  private val dayBase =
    java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(1990, 1, 1), java.time.LocalDate.of(2024, 1, 1)).toInt

  test("slidingDistinctUsers: trailing window accumulates and forgets") {
    // user 1 active day 1; user 2 active day 1 and 9; user 3 day 2
    def ts(d: Int) = java.time.LocalDateTime.of(2024, 1, d, 8, 0)
    val df = Seq((ts(1), 1L), (ts(1), 2L), (ts(9), 2L), (ts(2), 3L))
      .toDF("ts", "user_id")
    val got = Sliding.slidingDistinctUsers(df, windowDays = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // grid days: 1, 2, 9. Day 1: {1,2}; day 2: {1,2,3};
    // day 9: {3 (day2+7>9? no: 2+6=8 < 9 — forgotten), 2} -> {2}
    assert(got == Map(
      "2024-01-01" -> 2L, "2024-01-02" -> 3L, "2024-01-09" -> 1L), got.toString)
  }
}
