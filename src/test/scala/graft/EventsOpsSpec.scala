package graft

import graft.operators.EventsOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sessionization and interval-join semantics + plan shape. */
class EventsOpsSpec extends SparkSpec {

  test("q49 sessions: gaps within a session ≤ 30 min, session starts exceed it") {
    val sessions = run("q49_sessionization")
    // session ids are dense per user starting at 1
    val perUser = sessions.groupBy("user_id")
      .agg(min("session_id").as("lo"), max("session_id").as("hi"),
        countDistinct("session_id").as("n"))
      .collect()
    perUser.foreach { r =>
      assert(r.getAs[Long]("lo") == 1L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n"))
    }
    // event counts conserve
    val total = sessions.agg(sum("n_events")).head.getLong(0)
    val expected = Tables(spark, sf).events.filter(col("user_id") < 20).count()
    assert(total == expected)
  }

  test("q49 gaps-and-islands sessions ≡ Spark's native session_window") {
    // same 30-minute gap semantics, two independent formulations; the
    // per-user multiset of session event-counts must agree (boundary
    // semantics differ only on exact-30-min gaps, measure-zero on the
    // ns-unique fixture timeline)
    val mine = run("q49_sessionization")
      .groupBy("user_id").agg(sort_array(collect_list("n_events")).as("sizes"))
    val native = Tables(spark, sf).events.filter(col("user_id") < 20)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id").agg(sort_array(collect_list("n_events")).as("sizes"))
    val m = mine.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(m == n)
  }

  test("q52 salted join equals the unsalted join and spreads the key space") {
    val t = Tables(spark, sf)
    val got = run("q52_salted_skew_join").collect().toSeq
    val plain = t.lineitem
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("sum_qty"))
      .orderBy("s_name").collect().toSeq
    assert(got == plain)
    // the salt actually distributes: every salt value occurs
    val saltExpr = pmod(graft.functions.GraftFunctions.xxhash64Seeded(7L,
      col("l_orderkey"), col("l_linenumber")), lit(8))
    val nSalts = t.lineitem.select(saltExpr.as("s"))
      .select(countDistinct("s")).head.getLong(0)
    assert(nSalts == 8L)
    // the internal salt column does not leak into the output
    val out = graft.operators.Skew.saltedJoin(
      t.lineitem, t.supplier, "l_suppkey", "s_suppkey",
      graft.functions.GraftFunctions.xxhash64Seeded(7L,
        col("l_orderkey"), col("l_linenumber")))
    assert(!out.columns.contains("__graft_salt"))
  }

  test("q50 bucket-decomposed interval join equals the naive range join, no BNLJ") {
    val t = Tables(spark, sf)
    val got = run("q50_range_join")
    assert(got.count() > 0, "interval join found no pairs — fixture drifted?")
    // naive non-equi oracle over the same timeline
    val e = t.events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("tus"))
    val probes = e.filter(col("event_id") % 10 === 0)
      .select(col("user_id").as("pu"), col("tus").as("pt"))
    val naive = probes.join(e,
        col("pu") === col("user_id") && col("tus") > col("pt") &&
          col("tus") <= col("pt") + 3600000000L)
      .groupBy(col("pu").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min("event_id").as("min_fid"), max("event_id").as("max_fid"))
      .orderBy("user_id")
    assert(got.collect().toSeq == naive.collect().toSeq)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("q90 z-scores: flags match a direct per-partition recompute, stats broadcast") {
    import org.apache.spark.sql.functions._
    val events = Tables(spark, sf).events
    val got = operators.EventsOps.zScoreAnomalies(events, cut = 2.5)
    // every flagged row really exceeds the cut, and unflagged rows don't
    assert(got.filter(abs(col("z")) <= 2.5).count() == 0)
    val n = got.count()
    assert(n > 0, "fixture should contain at least one |z|>2.5 outlier")
    assert(n < events.count() / 10, "anomalies must be rare")
    // the stats side joins back via broadcast, not a shuffle of events
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q90 z-scores: degenerate groups yield no rows, never NaN/Inf") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // one singleton group, one constant-valued group, one real group
    // with an obvious outlier — only the real group may flag anything
    val events = (Seq((1L, "solo", 5.0), (2L, "const", 1.0), (3L, "const", 1.0),
      (4L, "const", 1.0)) ++
      (5L to 40L).map(i => (i, "live", 1.0)) :+ (41L, "live", 1000.0))
      .toDF("event_id", "event_type", "value")
    val got = operators.EventsOps.zScoreAnomalies(events, cut = 2.5)
      .select(col("event_type"), col("z")).collect()
    assert(got.forall(r => !r.getDouble(1).isNaN && !r.getDouble(1).isInfinite))
    assert(got.map(_.getString(0)).toSet == Set("live"))
  }

  test("q226 interval union: coverage bounded, brute-force sweep agrees") {
    import spark.implicits._
    val rows = run("q226_interval_union").collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_intervals"),
        r.getAs[Double]("covered_sec"))).toMap
    assert(rows.nonEmpty)
    val evs = Tables(spark, sf).events.filter(col("user_id") < 20)
      .select(col("user_id"), unix_micros(col("ts")).as("s"))
      .as[(Long, Long)].collect()
    val L = 600000000L
    evs.groupBy(_._1).foreach { case (u, es) =>
      // driver-side sweep-line union
      val sorted = es.map(_._2).sorted
      var islands = 0L; var covered = 0L
      var lo = -1L; var hi = -1L
      sorted.foreach { s =>
        if (s > hi) {
          if (hi >= 0) covered += hi - lo
          islands += 1; lo = s; hi = s + L
        } else hi = math.max(hi, s + L)
      }
      if (hi >= 0) covered += hi - lo
      val (gi, gc) = rows(u)
      assert(gi === islands, s"user $u islands")
      assert(math.abs(gc - covered / 1e6) < 1e-6, s"user $u coverage")
      // bounds: coverage within [L, n·L] seconds
      assert(gc >= L / 1e6 - 1e-9 && gc <= es.length * L / 1e6 + 1e-9)
    }
  }

  test("q222 recursive rollup: root sees everything, chain depth correct") {
    val rows = run("q222_recursive_rollup").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val events = Tables(spark, sf).events
    val total = events.count()
    val users = events.select("user_id").distinct().count()
    // node 0 is every chain's terminus: it must see every user once
    // and the full event count
    assert(rows(0L) === ((users, total)))
    // a leaf user with no other user in its subtree reports only
    // itself; its rollup equals its own event count
    import spark.implicits._
    val perUser = events.groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    val maxU = perUser.keys.max
    if (!perUser.keySet.exists(u => u != maxU && chainOf(u).contains(maxU)))
      assert(rows(maxU) === ((1L, perUser(maxU))))
    def chainOf(u: Long): Seq[Long] = {
      val b = scala.collection.mutable.ArrayBuffer(u)
      var x = u
      while (x > 0) { x = x / 2; b += x }
      b.toSeq
    }
    // every node's (n_desc, rollup) equals the brute-force chain sum
    val brute = perUser.toSeq.flatMap { case (u, c) =>
      chainOf(u).distinct.map(a => a -> (1L, c))
    }.groupBy(_._1).view.mapValues(vs =>
      (vs.map(_._2._1).sum, vs.map(_._2._2).sum)).toMap
    assert(rows === brute)
  }
}
