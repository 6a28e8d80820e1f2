package graft

import org.apache.spark.sql.functions._

/** Round-14 laws: q340 (TPC-H Q12) closes the TPC-H surface at 22/22
  * via the q338 derived-pinned-column pattern (r13 VERDICT item 3).
  */
class Round14Spec extends SparkSpec {

  private def entry(name: String) =
    SparkEntry.allEntries.find(_.name == name)
      .getOrElse(fail(s"no entry $name"))

  test("q340 plan law: single scan pair, one equi-join, conditional aggregation") {
    // the canonical Q12 plan: derive + filter lineitem in ONE pass,
    // equi-join orders on orderkey, two-branch CASE rollup — no second
    // lineitem scan, no join beyond orders⋈lineitem
    val df = entry("q340_tpch_q12").run(spark, sf)
    val plan = df.queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.length == 1, s"expected exactly the orders⋈lineitem join:\n$plan")
    assert(joins.head.joinType == org.apache.spark.sql.catalyst.plans.Inner)
    val scans = plan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(scans.length == 2, s"expected one orders scan + one lineitem scan:\n$plan")
    // the two-branch conditional aggregation is a single Aggregate
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.length == 1, s"Q12 is one rollup, found ${aggs.length}")
  }

  test("q340 semantics law: derived columns replay and branch counts are exhaustive") {
    val out = entry("q340_tpch_q12").run(spark, sf).collect()
    assert(out.nonEmpty, "receipt-year window missed the fixture")
    // only the two filtered modes can appear
    val modes = out.map(_.getString(0)).toSeq
    assert(modes.toSet.subsetOf(Set("MAIL", "SHIP")), modes.toString)
    assert(modes == modes.sorted)
    // high + low must equal an independent derivation of the total
    // qualifying line count per mode (branch exhaustiveness: every
    // joined line lands in exactly one of the two CASE branches)
    val t = Tables(spark, sf)
    val h = graft.functions.GraftFunctions.splitmix64(
      col("l_orderkey") * 8 + col("l_linenumber"))
    val su = unix_micros(col("l_shipdate").cast("timestamp"))
    val cd = shiftrightunsigned(h, 8) % 91 - 30
    val rd = shiftrightunsigned(h, 16) % 31 - 5
    val mi = shiftrightunsigned(h, 32) % 7
    val day = lit(86400000000L)
    val expect = t.lineitem
      .select(col("l_orderkey"),
        when(mi === 3, "SHIP").when(mi === 5, "MAIL").as("m"),
        su.as("s"), (su + cd * day).as("c"), (su + (cd + rd) * day).as("r"))
      .filter(col("m").isNotNull && col("s") < col("c") && col("c") < col("r") &&
        col("r") >= unix_micros(lit("1997-01-01 00:00:00").cast("timestamp")) &&
        col("r") < unix_micros(lit("1998-01-01 00:00:00").cast("timestamp")))
      .join(t.orders.select("o_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "inner")
      .groupBy("m").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val total = r.getLong(1) + r.getLong(2)
      assert(total == expect(r.getString(0)),
        s"mode ${r.getString(0)}: high+low=$total vs ${expect(r.getString(0))}")
    }
    // both priority branches are non-trivially exercised at this sf
    assert(out.map(_.getLong(1)).sum > 0, "high branch empty")
    assert(out.map(_.getLong(2)).sum > 0, "low branch empty")
  }

  test("q341 equivalence law: transformWithState profile == batch recomputation") {
    import org.apache.spark.sql.expressions.Window
    val out = entry("q341_stream_tws_profile").run(spark, sf).collect()
    val ev = Tables(spark, sf).events
    val agg = ev.groupBy("user_id").agg(
      count(lit(1)).as("cnt"),
      (round(sum(round(col("value") * 1000000.0, 0).cast("long"))
        .cast("double") / 1000000.0, 6) + lit(0.0)).as("sum_v"),
      countDistinct("event_type").as("n_types"))
    val per = ev.groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("c").desc, col("event_type"))
    val top = per.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id").as("u"), col("event_type").as("top_type"),
        col("c").as("top_cnt"))
    val expect = agg.join(top, col("user_id") === col("u"))
      .select("user_id", "cnt", "sum_v", "n_types", "top_type", "top_cnt")
      .orderBy("user_id").collect()
    assert(out.length == expect.length)
    out.zip(expect).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }

  test("q342 timer laws: exactly-once, batch equivalence, both final-session fates") {
    import org.apache.spark.sql.expressions.Window
    import graft.streaming.StreamingEvents.{SessionGapMs, SessionGapUs}
    val out = entry("q342_stream_tws_timers").run(spark, sf).collect()
    // exactly-once: no session emitted from both the event-close and
    // the timer-close path
    val keys = out.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length, "duplicate session emission")
    // batch replay of the full semantics: gap sessionization + the
    // final-watermark timer rule
    val ev = Tables(spark, sf).events
      .select(col("user_id"), unix_micros(col("ts")).as("tu"))
    val w = Window.partitionBy("user_id").orderBy("tu")
    val flagged = ev.withColumn("brk",
      when(lag("tu", 1).over(w).isNull ||
        col("tu") - lag("tu", 1).over(w) > SessionGapUs, 1L).otherwise(0L))
    val sess = flagged.withColumn("sid", sum("brk").over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agg = sess.groupBy("user_id", "sid").agg(
      min("tu").as("start_us"), max("tu").as("end_us"),
      count(lit(1)).as("n_events"))
    val finalWmMs = ev.agg(max("tu")).head.getLong(0) / 1000L - 5400000L
    val agg2 = agg.join(
      agg.groupBy("user_id").agg(max("sid").as("msid")), "user_id")
    val timerFires = expr("end_us div 1000") + lit(SessionGapMs) < lit(finalWmMs)
    val expect = agg2
      .filter(col("sid") < col("msid") || timerFires)
      .select("user_id", "start_us", "end_us", "n_events")
      .orderBy("user_id", "start_us").collect()
    assert(out.toSeq == expect.toSeq)
    // the timer path must be load-bearing in BOTH directions at this
    // fixture: some final sessions closed by the watermark (emitted
    // only via handleExpiredTimer), some left open (suppressed)
    val fired = agg2.filter(col("sid") === col("msid") && timerFires).count()
    val open = agg2.filter(col("sid") === col("msid") && !timerFires).count()
    assert(fired > 0, "no final session ever timer-closed — timer path untested")
    assert(open > 0, "every final session timer-closed — suppression path untested")
  }

  test("q343/q345 state-read provenance: the scan is the statestore source, not the sink") {
    // the load-bearing claim of the offline-inspection family is that
    // rows come FROM THE STORE — pin the analyzed plan to the
    // statestore DataSourceV2 relation so a regression to reading the
    // memory sink (which would trivially agree) fails loudly
    def statestoreScans(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
            if r.table.getClass.getName.contains("state") => r
      }.size
    val st = entry("q343_stream_state_read").run(spark, sf)
    assert(statestoreScans(st) == 1, st.queryExecution.analyzed.toString)
    val tm = entry("q345_stream_timer_read").run(spark, sf)
    assert(statestoreScans(tm) == 1, tm.queryExecution.analyzed.toString)
    // time travel reads an EARLIER state version: batch-1 state must be
    // a strict prefix of the final state — fewer or equal users, and
    // strictly fewer total events folded in
    val tt = entry("q346_stream_state_travel").run(spark, sf)
    assert(statestoreScans(tt) == 1, tt.queryExecution.analyzed.toString)
    val ttRows = tt.collect()
    val stRows = st.collect()
    assert(ttRows.length <= stRows.length)
    assert(ttRows.map(_.getLong(1)).sum < stRows.map(_.getLong(1)).sum,
      "batch-1 state should hold strictly fewer folded events than final")
    // and the q345 law proper: surviving timers ≡ the suppressed-final
    // set (fired timers consumed) at (final event ms + 30 min)
    import graft.streaming.StreamingEvents.SessionGapMs
    val ev = Tables(spark, sf).events
      .select(col("user_id"), unix_micros(col("ts")).as("tu"))
    val finalWmMs = ev.agg(max("tu")).head.getLong(0) / 1000L - 5400000L
    val expect = ev.groupBy("user_id").agg(max("tu").as("max_tu"))
      .select(col("user_id"),
        (expr("max_tu div 1000") + lit(SessionGapMs)).as("expiry_ms"))
      .filter(col("expiry_ms") >= finalWmMs)
      .orderBy("user_id").collect()
    assert(tm.collect().toSeq == expect.toSeq)
  }
}
