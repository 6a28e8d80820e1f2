package graft

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

import graft.sources.AvroRoundTrip

/** Avro source coverage beyond the q167 oracle gate: row-level
  * round-trip fidelity and READER-SCHEMA EVOLUTION — the property the
  * ingest boundary actually depends on (producers upgrade schemas
  * before consumers; an evolved reader must resolve old files via
  * field defaults, Avro spec §Schema Resolution).
  */
class AvroSpec extends SparkSpec {

  test("q167 staging round-trips every row, not just the aggregate") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val src = Tables(spark, sf).lineitem
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .as[(Long, Double, String)].collect().sorted
    val back = AvroRoundTrip
      .readAvro(spark, AvroRoundTrip.stagedAvroCopy(spark, sf))
      .as[(Long, Double, String)].collect().sorted
    assert(back.length === src.length)
    assert(back.toSeq === src.toSeq)
  }

  test("reader-schema evolution: evolved reader resolves old files via defaults") {
    val v1 = new Schema.Parser().parse(
      """{"type":"record","name":"Doc","fields":[
        |{"name":"id","type":"long"},
        |{"name":"text","type":"string"}]}""".stripMargin)
    // v2 adds a defaulted field and keeps the old ones — the only
    // forward-compatible evolution shape
    val v2 = new Schema.Parser().parse(
      """{"type":"record","name":"Doc","fields":[
        |{"name":"id","type":"long"},
        |{"name":"text","type":"string"},
        |{"name":"lang","type":"string","default":"und"}]}""".stripMargin)
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_evo")
    val f = dir.resolve("old.avro").toFile
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](v1))
    w.create(v1, f)
    try {
      val rec = new GenericData.Record(v1)
      rec.put("id", 7L)
      rec.put("text", "hello")
      w.append(rec)
    } finally w.close()

    val reader = new DataFileReader(
      f, new GenericDatumReader[GenericRecord](null, v2)) // writer schema from file, reader v2
    try {
      assert(reader.hasNext)
      val got = reader.next()
      assert(got.get("id") === 7L)
      assert(got.get("text").toString === "hello")
      assert(got.get("lang").toString === "und") // resolved from the default
      assert(!reader.hasNext)
    } finally reader.close()
  }
}
