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

  // ---- real image decode (ImageIoCodec, JDK ImageIO) ----------------

  /** Deterministic RGB test image: pixel (x,y) = (x*7 mod 256,
    * y*11 mod 256, (x+y)*13 mod 256) — the expected pooled features
    * are computed INDEPENDENTLY from this pixel function, so the test
    * proves decode + pooling end-to-end, not codec-equals-itself.
    */
  private def gradientImage(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 7 % 256) << 16) | ((y * 11 % 256) << 8) | ((x + y) * 13 % 256))
    img
  }

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK writer for $fmt")
    bos.toByteArray
  }

  private def expectedPooled(w: Int, h: Int, grid: Int): Array[Float] = {
    val sums = new Array[Long](grid * grid)
    val cnts = new Array[Long](grid * grid)
    for (y <- 0 until h; x <- 0 until w) {
      val cell = (y.toLong * grid / h).toInt * grid + (x.toLong * grid / w).toInt
      val luma = (299 * (x * 7 % 256) + 587 * (y * 11 % 256) + 114 * ((x + y) * 13 % 256)) / 1000
      sums(cell) += luma
      cnts(cell) += 1
    }
    Array.tabulate(grid * grid)(c =>
      if (cnts(c) == 0) 0f else (sums(c).toDouble / (cnts(c) * 255.0)).toFloat)
  }

  test("ImageIoCodec decodes real PNG bytes; pooled luma equals the pixel-function ground truth") {
    val codec = Multimodal.ImageIoCodec(grid = 4)
    for ((w, h) <- Seq((32, 32), (17, 9), (4, 4), (3, 7))) {
      val got = codec.decodeToFeatures(encode(gradientImage(w, h), "png"))
      assert(got.toSeq == expectedPooled(w, h, 4).toSeq, s"image ${w}x$h")
    }
  }

  test("ImageIoCodec is container-independent: BMP and PNG of the same image decode equal") {
    val img = gradientImage(24, 16)
    val codec = Multimodal.ImageIoCodec(grid = 3)
    assert(codec.decodeToFeatures(encode(img, "png")).toSeq ==
      codec.decodeToFeatures(encode(img, "bmp")).toSeq)
  }

  test("ImageIoCodec: uniform image pools to the same value in every cell") {
    val img = new java.awt.image.BufferedImage(20, 20,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 20; x <- 0 until 20) img.setRGB(x, y, 0x808080)
    val f = Multimodal.ImageIoCodec(grid = 4).decodeToFeatures(encode(img, "png"))
    assert(f.toSet.size == 1)
    assert(math.abs(f.head - 128f / 255f) < 1e-6)
  }

  test("real PNG frames run through the identical batched seam, distributed") {
    import spark.implicits._
    val rows = (1L to 6L).map(i =>
      Multimodal.MediaRow(i, encode(gradientImage(8 + i.toInt, 8), "png")))
    val ds = spark.createDataset(rows).repartition(3)
    val out = Multimodal.featuresThroughSeam(ds, Multimodal.ImageIoCodec(grid = 2))
      .collect().sortBy(_.doc_id)
    assert(out.length == 6)
    for (r <- out) {
      assert(r.features.length == 4)
      assert(r.features.toSeq == expectedPooled(8 + r.doc_id.toInt, 8, 2).toSeq)
    }
  }

  test("ImageIoCodec rejects non-image payloads loudly, not with garbage features") {
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec().decodeToFeatures("not an image".getBytes)
    }
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

  test("aHash64: grid math on a crafted payload; equal payloads collide") {
    import graft.operators.Multimodal.aHash64
    // 128 bytes: first half 0x00, second half 0xFF → segments 0..31
    // below the global mean (bit 0), 32..63 above (bit 1)
    val crafted = Array.fill[Byte](64)(0) ++ Array.fill[Byte](64)(-1)
    val h = aHash64(crafted)
    (0 until 32).foreach(s => assert(((h >> s) & 1L) === 0L, s"low seg $s"))
    (32 until 64).foreach(s => assert(((h >> s) & 1L) === 1L, s"high seg $s"))
    // determinism + collision on identical bytes
    assert(aHash64(crafted) === h)
    assert(aHash64("same text".getBytes) === aHash64("same text".getBytes))
    // a uniform payload sets no bits (no segment exceeds the mean)
    assert(aHash64(Array.fill[Byte](100)(42)) === 0L)
  }

  test("q208 banded join finds exactly the brute-force pair set") {
    import org.apache.spark.sql.functions._
    val hashed = graft.operators.Multimodal
      .mediaHashFrame(Tables(spark, sf).documents)
    val banded = run("q208_media_phash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val a = hashed.select(col("doc_id").as("ia"), col("sh").as("ha"))
    val b = hashed.select(col("doc_id").as("ib"), col("sh").as("hb"))
    val brute = a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("d"))
      .filter(col("d") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === brute)
    assert(banded.nonEmpty, "the planted variants must produce pairs")
    // every planted (-doc-1, doc) pair for doc_id % 5 == 0 found (the
    // negative-id variant always sorts first)
    banded.foreach { case (x, y, d) =>
      assert(x === -y - 1L && y % 5 === 0L && d <= 3, s"($x,$y,$d)")
    }
  }
}
