package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Tier A/B relational surface (SURVEY §2.1–§2.3, §2.5 Q1–Q10).
  *
  * The reference's entire dataflow is scan → project col 0 → null-skip →
  * partial SUM → final merge (`orc-parser/reader.cc:49-63,156-161`);
  * Q1/Q2 replay it verbatim, Q3–Q10 generalize the same partial/final
  * aggregation pipeline across Catalyst's full expression surface.
  *
  * Determinism discipline for the DuckDB differential oracle: money
  * aggregates are summed in DECIMAL(18,2) (exact, order-independent)
  * and only then cast to DOUBLE, so Spark's partial/final merge order
  * (`reader.cc:156-160`'s analogue) can never flip a low bit.
  */
object Relational {

  /** Exact money sum: decimal-accumulate, surface as double. */
  private def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  val entries: Seq[QueryEntry] = Seq(
    // Q1 — the reference query verbatim: SUM of the first column
    // (`reader.cc:60-63,156-161`), nulls skipped per SQL semantics
    // (`reader.cc:61`).
    QueryEntry.sql(
      "q01_sum_first_col",
      "SELECT CAST(SUM(l_orderkey) AS BIGINT) AS sum_orderkey FROM lineitem",
    ) { (s, dir) =>
      Tables(s, dir).lineitem.agg(sum("l_orderkey").as("sum_orderkey"))
    },

    // Q2 — null-aware COUNT/SUM (A6). Fixtures carry no nulls, so nulls
    // are injected deterministically with NULLIF to actually exercise
    // the `notNull[]` path (`reader.cc:61`) in both engines.
    QueryEntry.sql(
      "q02_count_sum_nulls",
      """SELECT COUNT(*) AS cnt_all,
        |       COUNT(NULLIF(l_quantity, 23.0)) AS cnt_qty,
        |       SUM(NULLIF(l_quantity, 23.0)) AS sum_qty
        |FROM lineitem""".stripMargin,
    ) { (s, dir) =>
      val qty = nullif(col("l_quantity"), lit(23.0))
      Tables(s, dir).lineitem.agg(
        count(lit(1)).as("cnt_all"),
        count(qty).as("cnt_qty"),
        sum(qty).as("sum_qty"),
      )
    },

    // Q3 — filtered revenue; the filter reaches the scan as a pushed
    // predicate (Tier B sargs surface, `Makefile:37`).
    QueryEntry.sql(
      "q03_filter_revenue",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |         AS revenue
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-01-01 00:00:00'""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).lineitem
        .filter(col("l_shipdate") < lit("1998-01-01 00:00:00").cast(TimestampType))
        .agg(
          sum(
            col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1) - col("l_discount").cast(DecimalType(18, 2)))
          ).cast(DoubleType).as("revenue")
        )
    },

    // Q4 — TPC-H Q1 shape: grouped partial/final aggregation
    // (generalizes `reader.cc:60-63,156-160`).
    QueryEntry.sql(
      "q04_groupby_pricing",
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         / COUNT(*) AS avg_price,
        |       COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_price"),
          (moneySum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Q5 — MIN/MAX/COUNT, answerable from footer statistics when the
    // source is ORC (Tier B, `reader.cc:3` Statistics.hh surface;
    // spark.sql.orc.aggregatePushdown).
    QueryEntry.sql(
      "q05_minmax_count",
      """SELECT MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok,
        |       COUNT(*) AS cnt
        |FROM lineitem""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).lineitem.agg(
        min("l_orderkey").as("min_ok"),
        max("l_orderkey").as("max_ok"),
        count(lit(1)).as("cnt"),
      )
    },

    // Q6 — 3-way join + group (declared extension; the reference has no
    // joins, SURVEY §2.3). nation (25 rows) and customer (150k at sf1)
    // are broadcast: no shuffle of the fact table at 100 TB.
    QueryEntry.sql(
      "q06_join_revenue_by_nation",
      """SELECT n_name,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_price,
        |       COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY total_price DESC, n_name""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      t.orders
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          moneySum(col("o_totalprice")).as("total_price"),
          count(lit(1)).as("n_orders"),
        )
        .orderBy(col("total_price").desc, col("n_name"))
    },

    // Q7 — windowed top-k per group (declared extension).
    QueryEntry.sql(
      "q07_window_topk",
      """SELECT o_orderstatus, o_orderkey, o_totalprice, r
        |FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
        |             RANK() OVER (PARTITION BY o_orderstatus
        |                          ORDER BY o_totalprice DESC) AS r
        |      FROM orders) ranked
        |WHERE r <= 3
        |ORDER BY o_orderstatus, r, o_orderkey""".stripMargin,
    ) { (s, dir) =>
      val w = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice").desc)
      Tables(s, dir).orders
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).as("r"))
        .filter(col("r") <= 3)
        .orderBy("o_orderstatus", "r", "o_orderkey")
    },

    // Q8 — DISTINCT.
    QueryEntry.sql(
      "q08_distinct_segments",
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    ) { (s, dir) =>
      Tables(s, dir).customer.select("c_mktsegment").distinct()
        .orderBy("c_mktsegment")
    },

    // Q9 — date scalar functions over grouped counts.
    QueryEntry.sql(
      "q09_orders_by_date",
      """SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
        |       COUNT(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY d""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).orders
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("d")
    },

    // Q10 — distinct aggregate.
    QueryEntry.sql(
      "q10_distinct_types_per_brand",
      """SELECT p_brand, COUNT(DISTINCT p_type) AS n_types
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).part
        .groupBy("p_brand")
        .agg(countDistinct(col("p_type")).as("n_types"))
        .orderBy("p_brand")
    },

    // Set operations (SURVEY §2.3 checklist: absent in reference,
    // declared here): customers-with-orders ∩/∖ via semi/anti join.
    QueryEntry.sql(
      "q10b_set_ops",
      """SELECT 'with_orders' AS tag, COUNT(*) AS cnt
        |FROM (SELECT c_custkey FROM customer
        |      INTERSECT SELECT o_custkey FROM orders) a
        |UNION ALL
        |SELECT 'without_orders' AS tag, COUNT(*) AS cnt
        |FROM (SELECT c_custkey FROM customer
        |      EXCEPT SELECT o_custkey FROM orders) b
        |ORDER BY tag""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val cust = t.customer.select(col("c_custkey"))
      val ord = t.orders.select(col("o_custkey").as("c_custkey"))
      val withO = cust.intersect(ord).agg(count(lit(1)).as("cnt"))
        .select(lit("with_orders").as("tag"), col("cnt"))
      val withoutO = cust.except(ord).agg(count(lit(1)).as("cnt"))
        .select(lit("without_orders").as("tag"), col("cnt"))
      withO.unionAll(withoutO).orderBy("tag")
    },

    // Scalar-function breadth (string/math/conditional) — the surface
    // the reference lacks entirely (SURVEY §2.3) and Catalyst provides;
    // all functions chosen for identical semantics in DuckDB.
    QueryEntry.sql(
      "q30_scalar_breadth",
      """SELECT p_partkey,
        |       upper(substr(p_name, 1, 5)) AS name5,
        |       length(p_name) AS name_len,
        |       concat_ws('-', p_brand, p_type) AS brand_type,
        |       ROUND(sqrt(p_retailprice), 4) AS sqrt_price,
        |       abs(p_size - 25) AS size_dist,
        |       CASE WHEN p_size % 2 = 0 THEN 'even' ELSE 'odd' END AS parity
        |FROM part WHERE p_partkey % 7 = 0 ORDER BY p_partkey""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).part
        .filter(col("p_partkey") % 7 === 0)
        .select(
          col("p_partkey"),
          upper(substring(col("p_name"), 1, 5)).as("name5"),
          length(col("p_name")).as("name_len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          round(sqrt(col("p_retailprice")), 4).as("sqrt_price"),
          abs(col("p_size") - 25).as("size_dist"),
          when(col("p_size") % 2 === 0, "even").otherwise("odd").as("parity"),
        )
        .orderBy("p_partkey")
    },

    // Outer-join breadth: FULL OUTER between the customer and orders
    // key spaces, classified into matched / customer-only /
    // orders-only — the remaining join family (inner, semi, anti,
    // broadcast, as-of are covered elsewhere).
    QueryEntry.sql(
      "q45_outer_join",
      """SELECT CASE WHEN c_custkey IS NULL THEN 'orders_only'
        |            WHEN o_custkey IS NULL THEN 'customer_only'
        |            ELSE 'matched' END AS side,
        |       COUNT(*) AS cnt
        |FROM (SELECT DISTINCT c_custkey FROM customer) c
        |FULL OUTER JOIN (SELECT DISTINCT o_custkey FROM orders) o
        |  ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY side""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val c = t.customer.select(col("c_custkey")).distinct()
      val o = t.orders.select(col("o_custkey")).distinct()
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          when(col("c_custkey").isNull, "orders_only")
            .when(col("o_custkey").isNull, "customer_only")
            .otherwise("matched").as("side"))
        .groupBy("side")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("side")
    },

    // TPC-H Q3 shape (shipping priority): selective dimension filter →
    // broadcast into orders → shuffle join with the lineitem fact on
    // the order key → grouped revenue → top-10 via
    // TakeOrderedAndProject. The full realistic-analytics pipeline in
    // one declarative plan; at 100 TB only the fact⨝orders join
    // shuffles, keyed on l_orderkey.
    QueryEntry.sql(
      "q56_tpch_q3",
      """SELECT o_orderkey,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |         AS revenue,
        |       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS odate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val cutoff = lit("1995-03-15 00:00:00").cast(TimestampType)
      t.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(t.orders.filter(col("o_orderdate") < cutoff),
          col("c_custkey") === col("o_custkey"))
        .join(t.lineitem.filter(col("l_shipdate") > cutoff),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
            .cast(DoubleType).as("revenue"))
        .select(col("o_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 shape (local-supplier volume): six-table join — region
    // → nation → customer broadcast chain, lineitem⨝orders shuffle on
    // the order key, supplier broadcast with the locality condition
    // (c_nationkey = s_nationkey) — revenue per nation. The widest
    // join tree in the inventory; every dimension broadcasts, the two
    // fact tables shuffle once.
    QueryEntry.sql(
      "q57_tpch_q5",
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |         AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      // customer broadcasts like the other dimensions (the q06
      // rationale): the orders fact stream stays unshuffled until the
      // one l_orderkey exchange against lineitem
      t.orders
        .join(broadcast(t.customer), col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
            .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // Row-to-text (Tier B: the reference links orc::ColumnPrinter,
    // `reader.cc:2`): rows serialized as JSON. The serialization is
    // spelled out field-by-field (compact separators, JSON string
    // escaping via the same replace chain) so both engines emit
    // byte-identical text; RelationalSpec asserts this manual form
    // equals Spark's own `to_json(struct(*))` on this table.
    QueryEntry.sql(
      "q31_row_to_json",
      """SELECT n_nationkey,
        |       '{"n_nationkey":' || CAST(n_nationkey AS VARCHAR)
        |       || ',"n_name":"'
        |       || replace(replace(n_name, '\', '\\'), '"', '\"')
        |       || '","n_regionkey":' || CAST(n_regionkey AS VARCHAR) || '}' AS js
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    ) { (s, dir) =>
      val esc = replace(replace(col("n_name"), lit("\\"), lit("\\\\")),
        lit("\""), lit("\\\""))
      Tables(s, dir).nation
        .select(
          col("n_nationkey"),
          concat(
            lit("{\"n_nationkey\":"), col("n_nationkey").cast(StringType),
            lit(",\"n_name\":\""), esc,
            lit("\",\"n_regionkey\":"), col("n_regionkey").cast(StringType),
            lit("}"),
          ).as("js"),
        )
        .orderBy("n_nationkey")
    },

    // q140 — correlated aggregate subquery (the TPC-H Q17 shape:
    // "small-quantity-order revenue"): lineitems below 20% of their
    // part's average quantity, for one brand, summed. Declaratively a
    // correlated scalar subquery; the engine expresses the
    // decorrelated form Catalyst itself would produce — a per-part
    // aggregate joined back on the part key — so the plan is two
    // hash-partitioned passes over lineitem, no per-row re-scan.
    // Money discipline (FIXTURES.md): prices accumulate in
    // DECIMAL(18,2) in both engines before the final DOUBLE cast.
    QueryEntry.sql(
      "q140_small_qty_revenue",
      """SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |             / 7.0, 2) AS avg_yearly,
        |       COUNT(*) AS n_lines
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#1'
        |  AND l.l_quantity < (
        |    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = p.p_partkey)""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val perPart = t.lineitem.groupBy(col("l_partkey").as("pk"))
        .agg(avg("l_quantity").as("avg_qty"))
      t.lineitem
        .join(t.part.filter(col("p_brand") === "Brand#1"),
          col("l_partkey") === col("p_partkey"))
        .join(perPart, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(
          round((sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast(DoubleType) / 7.0), 2).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    },

    // q219 — TPC-H Q3 shape (shipping-priority candidates): segment-
    // filtered customers × open orders × future-shipping lineitems,
    // top-10 orders by discounted revenue. Plan shape: the c/o join
    // broadcasts the FILTERED customer projection (segment cuts it
    // 5×), the o/l join shuffles on orderkey (both fact-sized at
    // 100 TB), revenue in exact DECIMAL, TakeOrdered for the top-10.
    QueryEntry.sql(
      "q219_tpch_q3",
      """SELECT o_orderkey,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |         AS revenue,
        |       strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d')
        |         AS order_date
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val cut = lit("1998-06-01 00:00:00").cast(TimestampType)
      t.lineitem.filter(col("l_shipdate") > cut)
        .join(t.orders.filter(col("o_orderdate") < cut),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer.filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
          .cast(DoubleType).as("revenue"))
        .select(col("o_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // q220 — TPC-H Q5 shape (local-supplier revenue by nation): the
    // six-table join with the customer-and-supplier-same-nation
    // constraint. nation/region broadcast (dim-sized at any scale);
    // customer, orders, lineitem, supplier shuffle on their keys —
    // the supplier equi-nation condition rides the l/s join.
    QueryEntry.sql(
      "q220_tpch_q5",
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |         AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |               AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val asiaNations = broadcast(
        t.nation.join(broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name")))
      t.customer
        .join(t.orders
          .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
            col("o_orderdate") < lit("1997-01-01 00:00:00").cast(TimestampType)),
          col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(asiaNations, col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // q221 — TPC-H Q10 shape (returned-item reporting): top-20
    // customers by revenue lost to returns in a quarter. The heavy
    // side (orders⋈lineitem filtered to returns) reduces before the
    // customer join; nation broadcast; TakeOrdered top-20.
    QueryEntry.sql(
      "q221_tpch_q10",
      """SELECT c_custkey, c_name, n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |         AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem.filter(col("l_returnflag") === "R")
        .join(t.orders
          .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
            col("o_orderdate") < lit("1996-04-01 00:00:00").cast(TimestampType)),
          col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // q254 — TPC-H Q18 shape (large-volume customers): orders whose
    // total lineitem quantity exceeds 300. The HAVING subquery reduces
    // lineitem to a handful of hot orderkeys FIRST (map-side partial
    // sum, then the tiny key set broadcasts into both probe joins) —
    // at 100 TB the big⋈big pitfall here is joining lineitem to orders
    // before the quantity filter; this plan never does.
    QueryEntry.sql(
      "q254_tpch_q18",
      """WITH hot AS (
        |  SELECT l_orderkey,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |           AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
        |)
        |SELECT c_name, c_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
        |         AS o_totalprice,
        |       total_qty
        |FROM hot
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val hot = t.lineitem
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty_dec"))
        .filter(col("qty_dec") > lit(300))
        .select(col("o_orderkey"), col("qty_dec").cast(DoubleType).as("total_qty"))
      t.orders
        .join(broadcast(hot), "o_orderkey")
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_totalprice").cast(DecimalType(18, 2)).cast(DoubleType)
            .as("o_totalprice"),
          col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // q288 — TPC-H Q21 shape (suppliers who kept waiting orders): for
    // finished orders, suppliers whose lineitem shipped late (> 60
    // days after the order date) where ANOTHER supplier participated
    // in the order (EXISTS) but NO other supplier was late
    // (NOT EXISTS). Both quantifiers fold into ONE grouped frame over
    // (order, supplier, late) — n_suppliers ≥ 2 ∧ n_late_suppliers = 1
    // — instead of two lineitem self-joins: the same answer, one
    // shuffle instead of three, and no big⋈big join anywhere (the
    // classic Q21 pitfall at 100 TB). Fixture adaptation: the schema
    // carries no receipt/commit dates, so "late" is ship-date slack
    // against the order date.
    QueryEntry.sql(
      "q288_tpch_q21",
      """WITH lf AS (
        |  SELECT l_orderkey, l_suppkey,
        |         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderstatus = 'F'
        |), os AS (
        |  SELECT l_orderkey, l_suppkey, MAX(late) AS supp_late
        |  FROM lf GROUP BY 1, 2
        |), ostats AS (
        |  SELECT l_orderkey, COUNT(*) AS n_supp,
        |         SUM(CASE WHEN supp_late THEN 1 ELSE 0 END) AS n_late
        |  FROM os GROUP BY 1
        |), wait AS (
        |  SELECT os.l_suppkey
        |  FROM os JOIN ostats USING (l_orderkey)
        |  WHERE os.supp_late AND ostats.n_supp >= 2 AND ostats.n_late = 1
        |)
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM wait JOIN supplier ON s_suppkey = l_suppkey
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val lf = t.lineitem
        .join(t.orders.filter(col("o_orderstatus") === "F"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
            .as("late"))
      val os = lf.groupBy("l_orderkey", "l_suppkey")
        .agg(max("late").as("supp_late"))
      val ostats = os.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"),
          sum(when(col("supp_late"), 1L).otherwise(0L)).as("n_late"))
      os.join(ostats, "l_orderkey")
        .filter(col("supp_late") && col("n_supp") >= 2 && col("n_late") === 1)
        .join(t.supplier, col("s_suppkey") === col("l_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },
  )
}
