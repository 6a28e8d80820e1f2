package graft

import graft.operators.Multimodal
import org.apache.spark.sql.types.BinaryType

class MultimodalSpec extends SparkSpec {

  test("mediaTable carries a real BinaryType payload column") {
    val df = Multimodal.mediaTable(spark, sf)
    assert(df.schema("payload").dataType == BinaryType)
    val row = df.orderBy("doc_id").head
    assert(row.getAs[Array[Byte]]("payload").length == row.getAs[Int]("n_bytes"))
  }

  test("stub codec is deterministic with fixed feature width") {
    val f1 = Multimodal.StubCodec.decodeToFeatures("hello world".getBytes)
    val f2 = Multimodal.StubCodec.decodeToFeatures("hello world".getBytes)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == Multimodal.StubCodec.featureDim)
  }

  test("extractFeatures is distributed per-partition and total") {
    val ds = Multimodal.extractFeatures(spark, sf)
    val n = Tables(spark, sf).documents.count()
    assert(ds.count() == n)
    val first = ds.orderBy("doc_id").head
    assert(first.features.length == Multimodal.StubCodec.featureDim)
    assert(first.n_bytes > 0)
  }
}
