package graft

import org.apache.spark.sql.functions._

class EngineFacadeSpec extends SparkSpec {

  lazy val engine = new GraftEngine(spark)

  test("sumFirstColumn reproduces the reference program on its own fixture") {
    assert(engine.sumFirstColumn(
      "/root/reference/testfiles/store_sales-scale0-parts1.snappy.orc") == 2451897L)
  }

  test("registerViews exposes the full surface to spark.sql incl. graft functions") {
    engine.registerViews(sf)
    val r = spark.sql(
      """SELECT e.vec_id, round(cosine_f32(e.embedding, q.embedding), 6) AS score
        |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 42) q
        |WHERE e.vec_id <> 42
        |ORDER BY score DESC, e.vec_id LIMIT 5""".stripMargin).collect()
    assert(r.length == 5)
    val viaApi = engine.topKCosine(Tables(spark, sf).embeddings, 42, 5)
      .collect()
    assert(r.map(_.getLong(0)).toSeq == viaApi.map(_.getLong(0)).toSeq)
  }

  test("dedupExact keeps exactly the min-id survivor per key") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "key")
    val out = engine.dedupExact(df, Seq("key"), "id")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (3L, "b")))
  }

  test("approx_count_distinct is within 5% of exact (q35 sketch bound)") {
    val r = run("q35_approx_distinct").head
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val exactOrders = li.select(countDistinct("l_orderkey")).head.getLong(0)
    val approx = r.getAs[Long]("approx_orders")
    assert(math.abs(approx - exactOrders).toDouble / exactOrders < 0.05,
      s"approx=$approx exact=$exactOrders")
  }
}
