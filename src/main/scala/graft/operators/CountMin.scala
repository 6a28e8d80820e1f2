package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Portable count-min sketch over long keys — the second member of the
  * pinned-hash sketch family (see [[Hll]]): depth×width counter grid,
  * row j's bucket = top bits of splitmix64(splitmix64(x) XOR j), point
  * estimate = min over rows. Everything is integer math on the pinned
  * hash, so the ESTIMATES (including their overcounts from hash
  * collisions) are engine-independent and sit under the DuckDB
  * differential gate — the property Spark's own frequency sketches
  * can't offer.
  *
  * Scale shape: one map-side-combined groupBy onto a d×w ≤ 4096-cell
  * grid (the sketch), then a broadcast-sized join for point queries —
  * the classic mergeable-summary dataflow.
  */
object CountMin {

  private val Depth = 4
  private val Width = 1024 // buckets = top 10 bits ⇒ shift by 54

  /** (j, bucket) pair columns for a long key column `colName`. The
    * bucket is the hash's top 10 bits: arithmetic shift + mask equals
    * the unsigned shift, mirroring DuckDB's logical UBIGINT `>>`.
    */
  private def bucketPairs(colName: String) =
    (0 until Depth).map { j =>
      struct(lit(j).as("j"),
        expr(s"shiftright(splitmix64(splitmix64($colName) ^ $j), 54) & 1023").as("b"))
    }

  /** Point estimates for every key in `probes` (column `pk`), next to
    * the exact count — the sketch's overcount is part of the tested
    * contract.
    */
  def estimates(df: DataFrame, colName: String, probes: DataFrame): DataFrame = {
    val items = df.select(col(colName).cast(LongType).as("x"))
    val grid = items
      .select(explode(array(bucketPairs("x"): _*)).as("p"))
      .groupBy(col("p.j").as("j"), col("p.b").as("b"))
      .agg(count(lit(1)).as("c"))
    val probeBuckets = probes
      .select(col("pk"), explode(array(bucketPairs("pk"): _*)).as("p"))
      .select(col("pk"), col("p.j").as("j"), col("p.b").as("b"))
    val exact = items.groupBy(col("x").as("pk")).agg(count(lit(1)).as("true_cnt"))
    probeBuckets
      .join(broadcast(grid), Seq("j", "b"), "left")
      .groupBy("pk")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
      .join(exact, Seq("pk"), "left")
      .select(col("pk"), col("est"), coalesce(col("true_cnt"), lit(0L)).as("true_cnt"))
      .orderBy("pk")
  }

  /** DuckDB mirror: the splitmix64 chain from [[Hll]] staged through
    * CTE columns so each hash is written once over a short column
    * reference.
    */
  def oracleSql(table: String, column: String, probeFilter: String): String = {
    val innerH = Hll.splitmixSqlFor(column)
    val outerH = Hll.splitmixSqlFor("xor(hx, CAST(j AS UBIGINT))")
    s"""WITH items AS (
       |  SELECT $column AS x, $innerH AS hx FROM $table
       |), pairs AS (
       |  SELECT x, j, ($outerH) >> 54 AS b
       |  FROM items, (SELECT unnest(range(0, 4)) AS j) js
       |), grid AS (
       |  SELECT j, b, COUNT(*) AS c FROM pairs GROUP BY j, b
       |), probes AS (
       |  SELECT DISTINCT x AS pk, j, b FROM pairs WHERE $probeFilter
       |), exact AS (
       |  SELECT x AS pk, COUNT(*) AS true_cnt FROM items GROUP BY x
       |)
       |SELECT p.pk,
       |       CAST(MIN(COALESCE(g.c, 0)) AS BIGINT) AS est,
       |       CAST(ANY_VALUE(e.true_cnt) AS BIGINT) AS true_cnt
       |FROM probes p
       |LEFT JOIN grid g ON g.j = p.j AND g.b = p.b
       |LEFT JOIN exact e ON e.pk = p.pk
       |GROUP BY p.pk ORDER BY p.pk""".stripMargin
  }

  val entries: Seq[QueryEntry] = Seq(
    // Count-min point estimates for a deterministic probe subset of
    // part keys over lineitem, next to exact counts — overcounts and
    // all, both engines land on identical integers.
    QueryEntry.sql(
      "q53_countmin_freq",
      oracleSql("lineitem", "l_partkey", "x % 97 = 0"),
    ) { (s, dir) =>
      val li = Tables(s, dir).lineitem
      val probes = li.select(col("l_partkey").cast(LongType).as("pk"))
        .filter(col("pk") % 97 === 0).distinct()
      estimates(li, "l_partkey", probes)
    },
  )
}
