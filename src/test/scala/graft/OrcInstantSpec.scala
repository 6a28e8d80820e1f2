package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.hive.ql.exec.vector.{BytesColumnVector, LongColumnVector, UnionColumnVector}
import org.apache.orc.{OrcFile, TypeDescription}
import org.apache.spark.sql.functions._

import graft.sources.TimestampInstantOrc

/** ORC TIMESTAMP_INSTANT round-trip + the formal rejection surface for
  * the two ORC types Spark's built-in reader cannot touch on this
  * build (TIMESTAMP_INSTANT, UNION) — round-7 VERDICT item 5.
  */
class OrcInstantSpec extends SparkSpec {

  test("q162: instant ORC round-trip preserves epoch micros exactly") {
    import spark.implicits._
    val expected = Tables(spark, sf).events
      .select(col("event_id"), unix_micros(col("ts")).as("tus"))
      .as[(Long, Long)].collect().toMap
    val got = TimestampInstantOrc
      .readInstantMicros(spark, TimestampInstantOrc.stagedInstantCopy(spark, sf))
      .as[(Long, Long)].collect()
    assert(got.length === expected.size)
    got.foreach { case (id, us) => assert(us === expected(id), s"event $id") }
  }

  test("staged file footer genuinely carries TIMESTAMP_INSTANT") {
    val dest = TimestampInstantOrc.stagedInstantCopy(spark, sf)
    val f = new java.io.File(dest).listFiles().filter(_.getName.endsWith(".orc")).head
    val r = OrcFile.createReader(
      new Path(f.getAbsolutePath), OrcFile.readerOptions(new Configuration()))
    try assert(r.getSchema.toString ===
      "struct<event_id:bigint,ts:timestamp with local time zone>")
    finally r.close()
    assert(TimestampInstantOrc.builtinUnreadableCategories(spark, dest) ===
      Seq("timestamp with local time zone"))
  }

  test("built-in reader still cannot read TIMESTAMP_INSTANT (pin: custom path is load-bearing)") {
    // If a Spark upgrade makes this pass, retire the core-reader path
    // in favor of spark.read.orc and keep only the writer seam.
    val dest = TimestampInstantOrc.stagedInstantCopy(spark, sf)
    val e = intercept[Exception] { spark.read.orc(dest).collect() }
    assert(e.toString.contains("PARSE_SYNTAX_ERROR") ||
      Option(e.getCause).exists(_.toString.contains("PARSE_SYNTAX_ERROR")))
  }

  /** A tiny uniontype ORC file written with the core API. The ENGINE
    * path for the type is `q168_orc_uniontype` (OrcUnionType, core
    * reader); this spec pins that Spark's BUILT-IN scan still rejects
    * union files — the preflight names it, and the rejection is why
    * the core-reader path is load-bearing.
    */
  private lazy val unionFile: String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_union_test/union.orc"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p).getParent)
    val schema = TypeDescription.fromString("struct<id:bigint,u:uniontype<int,string>>")
    val w = OrcFile.createWriter(new Path(p),
      OrcFile.writerOptions(new Configuration()).setSchema(schema).overwrite(true))
    try {
      val batch = schema.createRowBatch()
      val idv = batch.cols(0).asInstanceOf[LongColumnVector]
      val uv = batch.cols(1).asInstanceOf[UnionColumnVector]
      val ints = uv.fields(0).asInstanceOf[LongColumnVector]
      val strs = uv.fields(1).asInstanceOf[BytesColumnVector]
      for (i <- 0 until 4) {
        idv.vector(i) = i.toLong
        if (i % 2 == 0) { uv.tags(i) = 0; ints.vector(i) = i * 10L }
        else { val b = s"s$i".getBytes("UTF-8"); uv.tags(i) = 1; strs.setVal(i, b, 0, b.length) }
      }
      batch.size = 4
      w.addRowBatch(batch)
    } finally w.close()
    p
  }

  test("uniontype: preflight names it; built-in read rejects rather than miscarries") {
    assert(TimestampInstantOrc.builtinUnreadableCategories(spark, unionFile) ===
      Seq("uniontype"))
    assertThrows[Exception] { spark.read.orc(unionFile).collect() }
  }

  test("preflight is empty on a supported-type ORC table") {
    graft.sources.OrcRoundTrip.orcCopy(spark, sf, "lineitem")
    val dest = graft.sources.OrcRoundTrip.orcPath(sf, "lineitem")
    assert(TimestampInstantOrc.builtinUnreadableCategories(spark, dest).isEmpty)
  }
}
