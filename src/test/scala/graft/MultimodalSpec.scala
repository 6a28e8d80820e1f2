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

  test("pooled codec: mean-byte features stay in [0,255], grid covers all bytes") {
    val f = Multimodal.PoolCodec.decodeToFeatures(
      (0 until 1000).map(i => (i % 251).toByte).toArray)
    assert(f.length == Multimodal.PoolCodec.featureDim)
    assert(f.forall(v => v >= 0f && v <= 255f))
    // a constant payload pools to that constant in every segment
    val const = Multimodal.PoolCodec.decodeToFeatures(Array.fill(97)(65.toByte))
    assert(const.forall(_ == 65f))
    // q72 agrees at query level
    val rows = run("q72_media_pooled").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (2 to 5).foreach { i =>
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 255.0)
      }
    }
  }
}
