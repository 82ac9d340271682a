package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) travels as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs as
  * batched per-partition kernels.
  *
  * The decode kernel itself is a STUB (this container ships no media
  * codecs): `fakeDecode` derives deterministic pseudo-features from the
  * bytes. Everything around it — the binary schema, the mapPartitions batch
  * shape, the metadata projection — is the real plumbing a decoder plugs
  * into (swap `fakeDecode` for an actual JNI/FFmpeg/JPEG kernel; the Spark
  * plan is unchanged).
  */
object Multimodal {

  /** Deterministic stand-in for a media decoder: "features" computed from
    * raw bytes only (length, simple byte stats). Replace with a real codec.
    */
  def fakeDecode(bytes: Array[Byte]): (Long, Long, Long) = {
    var sum = 0L
    var zeros = 0L
    var i = 0
    while (i < bytes.length) {
      sum += bytes(i) & 0xff
      if (bytes(i) == 0) zeros += 1
      i += 1
    }
    (bytes.length.toLong, sum, zeros)
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("byte_sum", LongType, nullable = false),
    StructField("zero_bytes", LongType, nullable = false),
    StructField("content_md5", StringType, nullable = false)))

  /** Treat a text column as the opaque binary payload (UTF-8 bytes) and run
    * the batched decode kernel over it. Output: typed per-item metadata +
    * stub features. The mapPartitions boundary is where a real decoder
    * would amortize model/codec init per batch (the `mapInPandas` shape,
    * JVM-side).
    */
  def decodeFeatures(docs: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val bin = docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("payload"),
      md5(col(payloadCol)).as("content_md5"))
    bin.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val (n, sum, zeros) = fakeDecode(bytes)
        Row(r.getLong(0), n, sum, zeros, r.getString(2))
      }
    }(Encoders.row(outSchema))
  }

  /** Pure-column metadata variant (no kernel): binary length + digest. */
  def binaryMeta(docs: DataFrame, idCol: String, payloadCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      octet_length(encode(col(payloadCol), "UTF-8")).cast("long").as("n_bytes"),
      md5(col(payloadCol)).as("content_md5"))

  /** Frame sampling: the video-style access pattern — split the opaque
    * payload into fixed-length frames, keep every `step`-th, emit per-frame
    * digests. Pure column pipeline (sequence → substr → explode): at scale
    * the explode fans out WITHIN partitions, no shuffle; a real codec would
    * replace the md5 "feature" with a decoded keyframe inside the same
    * shape.
    */
  def frameSample(docs: DataFrame, idCol: String, payloadCol: String,
      frameLen: Int = 16, step: Int = 4): DataFrame = {
    val payload = col(payloadCol)
    val nFrames = ceil(length(payload).cast("double") / frameLen).cast("int")
    val idxs = when(length(payload) > 0,
      filter(sequence(lit(0), nFrames - 1), i => i % step === 0))
      .otherwise(array().cast("array<int>"))
    docs.select(col(idCol).cast("long").as("doc_id"), payload.as("p"), idxs.as("idxs"))
      .select(col("doc_id"), explode(col("idxs")).as("i"), col("p"))
      .select(col("doc_id"), col("i").cast("long").as("frame_idx"),
        md5(col("p").substr(col("i") * frameLen + 1, lit(frameLen))).as("frame_md5"))
  }
}
