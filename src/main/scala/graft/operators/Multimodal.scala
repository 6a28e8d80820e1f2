package graft.operators

import graft.{QueryEntry, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Tier C multimodal columns (SURVEY §2.4 row 4): opaque binary
  * payloads traveling with rows, plus a batched feature-extraction
  * seam.
  *
  * The fixtures carry no real media, so the payload is the UTF-8 byte
  * encoding of `text` — which makes the *plumbing* (BinaryType columns,
  * typed metadata, per-partition batched decode, fixed-width feature
  * output) real and testable while the decode itself is the
  * deterministic stub behind [[MediaCodec]].
  */
object Multimodal {

  /** The decode seam. A real deployment binds an image/audio decoder
    * here (the libraries are not in this container); the engine-side
    * contract — bytes in, fixed-width float features out, invoked
    * batched per partition — is what the pipeline depends on.
    */
  trait MediaCodec extends Serializable {
    def featureDim: Int
    def decodeToFeatures(payload: Array[Byte]): Array[Float]
  }

  /** Deterministic stand-in: byte histogram moments. Replace with a
    * real decoder at the same seam.
    */
  object StubCodec extends MediaCodec {
    val featureDim = 8
    def decodeToFeatures(payload: Array[Byte]): Array[Float] = {
      val f = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) {
        f(i % featureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      f
    }
  }

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, features: Array[Float])

  /** Binary payload column + typed metadata, from the documents table. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents.select(
      col("doc_id"),
      col("text").cast(BinaryType).as("payload"),
      octet_length(col("text")).as("n_bytes"),
      col("source").as("media_source"),
    )

  /** Batched per-partition decode — one codec instance per partition,
    * rows processed in partition order; the Spark-native equivalent of
    * a vectorized decode UDF. Distributed: no state crosses partitions.
    */
  def extractFeatures(spark: SparkSession, dir: String,
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          MediaFeatures(r.doc_id, r.payload.length,
            codec.decodeToFeatures(r.payload))
        }
      }
  }

  val entries: Seq[QueryEntry] = Seq(
    // Binary-column metadata — oracle-checkable plumbing: byte length
    // and hex prefix of the payload agree across engines.
    QueryEntry.sql(
      "q25_media_meta",
      """SELECT doc_id,
        |       octet_length(CAST(text AS BLOB)) AS n_bytes,
        |       hex(CAST(substr(text, 1, 8) AS BLOB)) AS prefix_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    ) { (s, dir) =>
      Tables(s, dir).documents
        .select(
          col("doc_id"),
          octet_length(col("text")).as("n_bytes"),
          hex(substring(col("text"), 1, 8).cast(BinaryType)).as("prefix_hex"),
        )
        .orderBy("doc_id")
    },

    // Feature-extraction rollup through the batched decode seam
    // (rows-only: the stub codec is engine-side; the spec suite pins
    // its values).
    QueryEntry.rowsOnly("q26_media_features") { (s, dir) =>
      extractFeatures(s, dir).toDF()
        .select(col("doc_id"), col("n_bytes"),
          round(element_at(col("features"), 1), 4).as("f0"))
        .orderBy("doc_id")
    },
  )
}
