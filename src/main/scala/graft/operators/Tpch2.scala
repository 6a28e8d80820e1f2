package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 TPC-H widening (Q7/Q8/Q13/Q14/Q15/Q19/Q22 shapes) — the
  * remaining canonical decision-support plans expressible over the
  * fixture's column subset (no partsupp table, no l_commitdate/
  * l_receiptdate/l_shipmode/p_container columns; q219/q220/q221/q254/
  * q288 already carry Q3/Q5/Q10/Q18/Q21; [[Tpch3]] later closed
  * Q2/Q9/Q11/Q16/Q17/Q20 over a derived partsupp, Q4 as q338's
  * correlated EXISTS, and Q12 as q340's derived-pinned-column form —
  * TPC-H 22/22).
  *
  * House determinism rules throughout: money aggregates accumulate in
  * DECIMAL(18,2) (order-free exact) and cast DOUBLE once at the end;
  * ratios divide two exact decimal sums as doubles and round once to
  * 6dp; dates compare as timestamps and render as strftime strings;
  * counts are CAST BIGINT for DuckDB's HUGEINT drift.
  */
object Tpch2 {

  private val D2 = DecimalType(18, 2)
  private def rev = sum(col("l_extendedprice").cast(D2) *
    (lit(1) - col("l_discount").cast(D2)))
  private def ts(s: String) = lit(s + " 00:00:00").cast(TimestampType)

  val entries: Seq[QueryEntry] = Seq(

    // q302 — TPC-H Q7 (volume shipping between two nations): revenue
    // shipped NATION_1↔NATION_2 in 1996–1997 by (supp, cust, year).
    // Plan shape at 100 TB: lineitem⋈orders is the one fact-fact
    // shuffle; customer joins on o_custkey (fact-sized, shuffles);
    // supplier and both nation maps broadcast; the nation-pair
    // disjunction filters BEFORE the group-by so only the two target
    // nations' rows reach the rollup.
    QueryEntry.sql(
      "q302_tpch_q7",
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       strftime(l_shipdate, '%Y') AS l_year,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |         AS revenue
        |FROM supplier
        |JOIN lineitem ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val n1 = broadcast(t.nation.select(col("n_nationkey").as("sk"),
        col("n_name").as("supp_nation")))
      val n2 = broadcast(t.nation.select(col("n_nationkey").as("ck"),
        col("n_name").as("cust_nation")))
      t.lineitem
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("sk"))
        .join(n2, col("c_nationkey") === col("ck"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          date_format(col("l_shipdate"), "yyyy").as("l_year"))
        .agg(rev.cast(DoubleType).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // q303 — TPC-H Q8 (national market share): NATION_3 suppliers'
    // share of PROMO-part volume sold to AMERICA-region customers,
    // per order year. Share = two exact DECIMAL sums (conditional
    // numerator via CASE inside the same rollup — one pass, no second
    // join), divided as doubles, rounded once.
    QueryEntry.sql(
      "q303_tpch_q8",
      """SELECT o_year,
        |       ROUND(CAST(nat_volume AS DOUBLE)
        |             / CAST(volume AS DOUBLE), 6) AS mkt_share
        |FROM (
        |  SELECT strftime(o_orderdate, '%Y') AS o_year,
        |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS volume,
        |         SUM(CASE WHEN n2.n_name = 'NATION_3'
        |                  THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |                       * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS nat_volume
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY 1
        |) ORDER BY o_year""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val americaNations = broadcast(
        t.nation.join(broadcast(t.region.filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("ck")))
      val suppNation = broadcast(t.nation.select(col("n_nationkey").as("sk"),
        col("n_name").as("supp_nation")))
      val vol = col("l_extendedprice").cast(D2) *
        (lit(1) - col("l_discount").cast(D2))
      t.lineitem
        .join(broadcast(t.part.filter(col("p_type") === "PROMO")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(t.orders.filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1998-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(americaNations, col("c_nationkey") === col("ck"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(suppNation, col("s_nationkey") === col("sk"))
        .groupBy(date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .agg(sum(vol).as("volume"),
          sum(when(col("supp_nation") === "NATION_3", vol)
            .otherwise(lit(0).cast(D2))).as("nat_volume"))
        .select(col("o_year"),
          round(col("nat_volume").cast(DoubleType) /
            col("volume").cast(DoubleType), 6).as("mkt_share"))
        .orderBy("o_year")
    },

    // q304 — TPC-H Q13 (customer order-count distribution): how many
    // customers placed exactly k orders, INCLUDING k = 0 (the LEFT
    // JOIN is the whole point — an inner join silently drops the
    // order-less customers a marketing query exists to find). Two
    // shuffles: custkey rollup, then the model-sized count-of-counts.
    QueryEntry.sql(
      "q304_tpch_q13",
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey
        |)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // q305 — TPC-H Q14 (promo revenue share): PROMO parts' share of
    // March-1996 revenue. One lineitem⋈part join (part side broadcast
    // after the month filter cuts lineitem ~70×); both sums exact
    // DECIMAL in one rollup.
    QueryEntry.sql(
      "q305_tpch_q14",
      """SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |                  THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |                       * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
        |               AS DOUBLE), 6) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val vol = col("l_extendedprice").cast(D2) *
        (lit(1) - col("l_discount").cast(D2))
      t.lineitem
        .filter(col("l_shipdate") >= ts("1996-03-01") &&
          col("l_shipdate") < ts("1996-04-01"))
        .join(broadcast(t.part.select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0).cast(D2)))
            .cast(DoubleType) /
          sum(vol).cast(DoubleType), 6).as("promo_revenue"))
    },

    // q306 — TPC-H Q15 (top supplier): the supplier(s) whose Q1-1996
    // revenue equals the maximum. The max is a broadcast scalar over
    // the supplier-keyed rollup (never a global sort); equality is
    // over EXACT DECIMAL totals, so ties are real ties, not float
    // accidents, in both engines.
    QueryEntry.sql(
      "q306_tpch_q15",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey
        |), m AS (SELECT MAX(total_rev) AS mx FROM revenue)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM revenue JOIN supplier ON s_suppkey = supplier_no, m
        |WHERE total_rev = mx ORDER BY s_suppkey""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val revenue = t.lineitem
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1996-04-01"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(rev.as("total_rev"))
      val m = revenue.agg(max("total_rev").as("mx"))
      revenue.crossJoin(broadcast(m))
        .filter(col("total_rev") === col("mx"))
        .join(broadcast(t.supplier), col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast(DoubleType).as("total_revenue"))
        .orderBy("s_suppkey")
    },

    // q307 — TPC-H Q19 (disjunctive predicate join): three OR-branches
    // of (brand, size-range, quantity-range). The join key is shared
    // across branches, so this is ONE equi-join with a residual
    // disjunction — not three unioned joins; the quantity half of each
    // branch prunes lineitem at the scan (PushedFilters carries the
    // OR-of-ranges), the part half broadcasts pre-filtered to the
    // union of brands.
    QueryEntry.sql(
      "q307_tpch_q19",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |         AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      def branch(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =
        col("p_brand") === brand &&
          col("p_size").between(szLo, szHi) &&
          col("l_quantity") >= qLo && col("l_quantity") <= qHi
      t.lineitem
        // scan-prunable quantity envelope (the union of the branches)
        .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
        .join(broadcast(t.part
          .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
          .select("p_partkey", "p_brand", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .filter(branch("Brand#1", 1, 15, 1, 11) ||
          branch("Brand#2", 1, 25, 10, 20) ||
          branch("Brand#3", 1, 35, 20, 30))
        .agg(rev.cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // q308 — TPC-H Q22 (global sales opportunity): per customer
    // nation, the count and balance-total of customers whose account
    // balance beats the global positive average AND who placed no
    // RECENT order (left_anti against the last two fixture years —
    // every fixture customer has SOME order, so the literal Q22
    // "never ordered" predicate is dead here; a 0-row pass would hide
    // a dead operator, the q282 lesson). The average is an exact
    // DECIMAL sum / count; the anti-join streams the filtered orders'
    // custkeys through one shuffle (no NOT IN materialization).
    QueryEntry.sql(
      "q308_tpch_q22",
      """WITH avgbal AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         / COUNT(*) AS ab
        |  FROM customer WHERE c_acctbal > 0.0
        |)
        |SELECT c_nationkey,
        |       CAST(COUNT(*) AS BIGINT) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         AS totacctbal
        |FROM customer, avgbal
        |WHERE c_acctbal > ab
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      val avgbal = t.customer.filter(col("c_acctbal") > 0.0)
        .agg((sum(col("c_acctbal").cast(D2)).cast(DoubleType) /
          count(lit(1))).as("ab"))
      t.customer.crossJoin(broadcast(avgbal))
        .filter(col("c_acctbal") > col("ab"))
        .join(t.orders.filter(col("o_orderdate") >= ts("2000-01-01"))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast(D2)).cast(DoubleType).as("totacctbal"))
        .orderBy("c_nationkey")
    },
  )
}
