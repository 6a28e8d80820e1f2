package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Custom expressions vs their composed-built-in semantic oracles
  * (SURVEY §4.3: the HOF form is the declared semantics; the codegen
  * form is the perf path). Property-style via seeded scalacheck
  * generators (no scalatest-plus bridge in the offline cache), all
  * samples batched into one DataFrame per assertion so each property
  * is a single distributed job.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val vecGen = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
  private val pairs = samples(Gen.zip(vecGen, vecGen), 50)

  test("dot_f32 matches the aggregate/zip_with HOF oracle") {
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      GraftFunctions.dotF32(col("a"), col("b")).as("got"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)").as("oracle"),
    ).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 1e-9 * (1 + math.abs(r.getDouble(1))))
    }
    assert(rows.length == 50)
  }

  test("cosine_f32 matches a scala-side computation and handles zero vectors") {
    val df = pairs.toDF("a", "b")
    val rows = df.select(col("a"), col("b"),
      GraftFunctions.cosineF32(col("a"), col("b")).as("got")).collect()
    rows.foreach { r =>
      val a = r.getSeq[Float](0)
      val b = r.getSeq[Float](1)
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = a.map(x => x.toDouble * x.toDouble).sum
      val nb = b.map(x => x.toDouble * x.toDouble).sum
      if (na == 0.0 || nb == 0.0) assert(r.isNullAt(2))
      else assert(math.abs(r.getDouble(2) - dot / math.sqrt(na * nb)) < 1e-12)
    }
    val zero = Seq((Seq.fill(4)(0.0f), Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("a", "b")
    assert(zero.select(GraftFunctions.cosineF32(col("a"), col("b"))).head.isNullAt(0))
  }

  test("expressions return null on null input") {
    val df = Seq((Option.empty[Seq[Float]], Option(Seq(1.0f)))).toDF("a", "b")
    assert(df.select(GraftFunctions.dotF32(col("a"), col("b"))).head.isNullAt(0))
    assert(df.select(GraftFunctions.cosineF32(col("a"), col("b"))).head.isNullAt(0))
  }

  test("dot/cosine match HOF null semantics: length mismatch and null elements → null") {
    // length mismatch (zip_with would null-pad → null-poisoned sum)
    val uneven = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(uneven.select(GraftFunctions.dotF32(col("a"), col("b"))).head.isNullAt(0))
    assert(uneven.select(GraftFunctions.cosineF32(col("a"), col("b"))).head.isNullAt(0))
    // null element
    val withNull = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))))
      .toDF("a", "b")
    val r = withNull.select(
      GraftFunctions.dotF32(col("a"), col("b")),
      GraftFunctions.cosineF32(col("a"), col("b")),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"),
    ).head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("simhash64 matches a scala reference implementation") {
    def reference(hashes: Seq[Long], bits: Int = 60): Long = {
      val counts = new Array[Int](bits)
      for (h <- hashes; b <- 0 until bits)
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
      (0 until bits).foldLeft(0L)((acc, b) => if (counts(b) > 0) acc | (1L << b) else acc)
    }
    val hsGen = Gen.listOfN(8, Gen.chooseNum(0L, (1L << 60) - 1))
    val hss = samples(hsGen, 30)
    val rows = hss.map(Tuple1(_)).toDF("h")
      .select(col("h"), GraftFunctions.simhash64(col("h")).as("s")).collect()
    rows.foreach(r => assert(r.getLong(1) == reference(r.getSeq[Long](0))))
  }

  test("registered SQL functions resolve (dot_f32, cosine_f32, simhash64)") {
    val r: Row = spark.sql(
      """SELECT dot_f32(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) d,
        |       cosine_f32(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>), CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) c,
        |       simhash64(array(CAST(7 AS BIGINT))) s""".stripMargin).head
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getLong(2) == 7L)
  }
}
