package graft.operators

import graft.functions.GraftFunctions
import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation as a first-class operator (SURVEY §7.4 "salting for
  * skew"; complements AQE's runtime skew-join splitting with the
  * static technique for keys known to be hot).
  *
  * `saltedJoin`: the fact side gets a deterministic salt in [0, S);
  * the small side is replicated ×S with every salt value; the join key
  * becomes (key, salt), so one hot key's rows spread across S shuffle
  * partitions instead of hammering one. Results are identical to the
  * unsalted join — each fact row still matches exactly the same small
  * rows (replication supplies its salt) — which is what the DuckDB
  * oracle certifies.
  */
object Skew {

  /** Salted equi-join of a (possibly skewed) fact frame against a
    * small frame. `factSalt` must be a deterministic per-row
    * expression (any well-distributed hash of fact columns). The salt
    * column is internal (collision-safe name, dropped from the
    * output) — caller columns named "salt" pass through untouched.
    */
  def saltedJoin(fact: DataFrame, small: DataFrame, factKey: String,
      smallKey: String, factSalt: Column, salts: Int = 8): DataFrame = {
    val s = "__graft_salt"
    val salted = fact.withColumn(s, pmod(factSalt, lit(salts)))
    val replicated = small.withColumn(s,
      explode(array((0 until salts).map(lit): _*)))
    // shuffle_hash keeps the demonstration honest: without it Catalyst
    // would broadcast the replicated small side and no salted shuffle
    // would exist to inspect. At real scale the optimizer's choice
    // (broadcast if it fits) is of course fine to keep.
    salted.join(replicated.hint("shuffle_hash"),
      salted(factKey) === replicated(smallKey) &&
        salted(s) === replicated(s))
      .drop(replicated(s)).drop(salted(s))
  }

  /** Skew pre-flight: the hottest join keys with their share of the
    * table — the diagnostic that decides between a plain shuffle join,
    * [[saltedJoin]], and AQE skew splitting. One map-side-combined
    * groupBy + TakeOrdered(k); no global sort.
    */
  def hotKeys(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val total = df.count()
    df.groupBy(keyCol)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("share",
        round(col("cnt").cast("double") / lit(total.toDouble), 6))
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(k)
  }

  val entries: Seq[QueryEntry] = Seq(
    // Hot-key report over the orders fact table: the top-10 customers
    // by order count with their table share.
    QueryEntry.sql(
      "q80_skew_report",
      """SELECT o_custkey, COUNT(*) AS cnt,
        |       ROUND(COUNT(*) / CAST((SELECT COUNT(*) FROM orders) AS DOUBLE), 6)
        |         AS share
        |FROM orders GROUP BY o_custkey
        |ORDER BY cnt DESC, o_custkey LIMIT 10""".stripMargin,
    ) { (s, dir) =>
      hotKeys(Tables(s, dir).orders, "o_custkey", 10)
    },
    // Salted fact⨝dim join under the gate: per-supplier rollup of
    // lineitem. The oracle is the plain unsalted join — a hash match
    // proves salting changes the distribution, never the result.
    QueryEntry.sql(
      "q52_salted_skew_join",
      """SELECT s_name, COUNT(*) AS n_items,
        |       SUM(l_quantity) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,
    ) { (s, dir) =>
      val t = Tables(s, dir)
      saltedJoin(
        t.lineitem, t.supplier, "l_suppkey", "s_suppkey",
        factSalt = GraftFunctions.xxhash64Seeded(7L,
          col("l_orderkey"), col("l_linenumber")))
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("sum_qty"))
        .orderBy("s_name")
    },
  )
}
