package graft

import org.apache.spark.sql.types._

/** Fixture-schema drift sentinel (round-7 VERDICT item 2).
  *
  * The driver regenerates `/root/testdata` between rounds; in round 6 it
  * silently switched `events.ts` from parquet TIMESTAMP(NANOS) (a raw
  * long under `nanosAsLong`) to `timestamp[us]` (TIMESTAMP_NTZ), which
  * broke 27 queries with no in-repo signal. This suite pins every table
  * in FIXTURES.md §2 to its expected Spark schema — with the `ts`
  * column allowed any of its known encodings — and fails with a named
  * per-column diff so the next drift is caught by `sbt test`, not by
  * the round's correctness gate.
  */
class FixtureSpec extends SparkSpec {

  /** expected (name, acceptable types) per table; order-sensitive. */
  private val expected: Map[String, Seq[(String, Seq[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Seq(IntegerType), "r_name" -> Seq(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Seq(IntegerType), "n_name" -> Seq(StringType),
      "n_regionkey" -> Seq(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Seq(LongType), "c_name" -> Seq(StringType),
      "c_nationkey" -> Seq(IntegerType), "c_acctbal" -> Seq(DoubleType),
      "c_mktsegment" -> Seq(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Seq(LongType), "s_name" -> Seq(StringType),
      "s_nationkey" -> Seq(IntegerType), "s_acctbal" -> Seq(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Seq(LongType), "p_name" -> Seq(StringType),
      "p_brand" -> Seq(StringType), "p_type" -> Seq(StringType),
      "p_size" -> Seq(IntegerType), "p_retailprice" -> Seq(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Seq(LongType), "o_custkey" -> Seq(LongType),
      "o_orderstatus" -> Seq(StringType), "o_totalprice" -> Seq(DoubleType),
      "o_orderdate" -> Seq(TimestampType, TimestampNTZType),
      "o_orderpriority" -> Seq(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Seq(LongType), "l_partkey" -> Seq(LongType),
      "l_suppkey" -> Seq(LongType), "l_linenumber" -> Seq(IntegerType),
      "l_quantity" -> Seq(DoubleType), "l_extendedprice" -> Seq(DoubleType),
      "l_discount" -> Seq(DoubleType), "l_tax" -> Seq(DoubleType),
      "l_returnflag" -> Seq(StringType), "l_linestatus" -> Seq(StringType),
      "l_shipdate" -> Seq(TimestampType, TimestampNTZType)),
    "documents" -> Seq(
      "doc_id" -> Seq(LongType), "text" -> Seq(StringType),
      "lang" -> Seq(StringType), "source" -> Seq(StringType),
      "n_chars" -> Seq(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Seq(LongType),
      "embedding" -> Seq(ArrayType(FloatType), ArrayType(FloatType, containsNull = false)),
      "label" -> Seq(IntegerType)),
    // ts: every encoding the driver has shipped (raw nanos long under
    // nanosAsLong; timestamp[us] read as NTZ; a future adjusted-to-UTC
    // write would arrive as TimestampType). Tables.eventsTs handles all.
    "events" -> Seq(
      "event_id" -> Seq(LongType),
      "ts" -> Seq(LongType, TimestampNTZType, TimestampType),
      "user_id" -> Seq(LongType), "event_type" -> Seq(StringType),
      "value" -> Seq(DoubleType), "props" -> Seq(StringType)),
  )

  private def diff(table: String, actual: StructType,
      exp: Seq[(String, Seq[DataType])]): Seq[String] = {
    val pairs = actual.fields.map(f => f.name -> f.dataType)
    val missing = exp.map(_._1).filterNot(pairs.map(_._1).contains)
      .map(c => s"$table.$c: MISSING (expected)")
    val extra = pairs.map(_._1).filterNot(exp.map(_._1).contains)
      .map(c => s"$table.$c: UNEXPECTED new column")
    val mismatched = exp.flatMap { case (name, ok) =>
      pairs.collectFirst { case (`name`, dt) if !ok.contains(dt) =>
        s"$table.$name: got $dt, expected one of ${ok.mkString("/")}"
      }
    }
    missing ++ extra ++ mismatched
  }

  for ((table, exp) <- expected.toSeq.sortBy(_._1)) {
    test(s"fixture schema pinned: $table") {
      val schema = Tables.load(spark, sf, table).schema
      val d = diff(table, schema, exp)
      assert(d.isEmpty, s"\nfixture drift detected:\n  ${d.mkString("\n  ")}")
    }
  }

  test("eventsTs long branch: nanos decode truncates to micros with integer div") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 2^53-breaking nanosecond epoch: double division would corrupt it
    val nanos = Seq(1704164645123456789L, -1L, 0L).toDF("ts")
    val got = nanos
      .select(
        Tables.eventsTs(LongType).as("ts"),
        Tables.eventsTsMicros(LongType).as("tus"))
      .select(unix_micros(col("ts")).as("via_ts"), col("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // `div` truncates toward zero: -1 ns -> 0 us. Fixture timestamps are
    // all post-1970, so the negative-epoch edge is out of oracle domain.
    assert(got.toSeq === Seq(
      (1704164645123456L, 1704164645123456L), (0L, 0L), (0L, 0L)))
  }

  test("events loader normalizes ts to TimestampType for every known encoding") {
    import org.apache.spark.sql.functions._
    val t = Tables(spark, sf)
    assert(t.events.schema("ts").dataType === TimestampType)
    // and the decode is value-preserving: micros derived through the
    // shared helper equal unix_micros of the normalized column
    val raw = Tables.load(spark, sf, "events")
    val viaMicros = raw
      .select(Tables.eventsTsMicros(raw.schema("ts").dataType).as("tus"))
    val viaTs = t.events.select(unix_micros(col("ts")).as("tus"))
    assert(viaMicros.exceptAll(viaTs).isEmpty && viaTs.exceptAll(viaMicros).isEmpty)
  }
}
