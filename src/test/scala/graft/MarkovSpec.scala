package graft

import graft.operators.Markov

class MarkovSpec extends SparkSpec {
  import spark.implicits._

  test("transition counts and row-normalized probabilities") {
    // user 1: A B A B ; user 2: A B  (ties impossible: distinct ts)
    val df = Seq(
      (1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (1L, 3L, 3L, "A"), (1L, 4L, 4L, "B"),
      (2L, 1L, 5L, "A"), (2L, 2L, 6L, "B"),
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Markov.transitions(df)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // A->B three times (prob 1.0 from A), B->A once (prob 1.0 from B)
    assert(got.toSeq == Seq(("A", "B", 3L, 1.0), ("B", "A", 1L, 1.0)))
  }

  test("first event per user contributes no transition; rows sum to 1 per prev") {
    val df = Seq(
      (1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (1L, 3L, 3L, "C"),
      (2L, 1L, 4L, "A"), (2L, 2L, 5L, "C"),
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Markov.transitions(df)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("A", "B", 1L, 0.5), ("A", "C", 1L, 0.5), ("B", "C", 1L, 1.0)))
    // total transitions = events - users (one dropped head per user)
    assert(got.map(_._3).sum == 5 - 2)
  }
}
