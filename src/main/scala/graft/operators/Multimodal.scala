package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing — builder-brief
  * extension. Media travel as opaque `binary` columns with a typed
  * metadata struct; per-batch decode/feature-extract runs in
  * `mapPartitions` (the Scala analog of `mapInPandas`: one iterator per
  * partition, vectorizable batch shape, no driver involvement).
  *
  * The actual codec call is STUBBED (`decodeStub`) — this container has
  * no image/audio libraries — with a deterministic fake so tests pin the
  * plumbing: schema, null handling, partition mapping, batch iteration.
  * Swapping the stub for JavaCV/ImageIO is a one-function change.
  */
object Multimodal {

  /** media metadata struct type carried beside the bytes. */
  val metaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Wrap a binary column into the engine's media frame:
    * (id, media binary, meta struct). `format` is caller-declared
    * (container sniffing belongs in the decode stage). */
  def asMediaFrame(df: DataFrame, idCol: String, binCol: String,
                   format: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(binCol).cast("binary").as("media"),
      struct(
        lit(format).as("format"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("n_frames")).as("meta"))

  /** STUB decode: deterministic pseudo-metadata + "pixels" derived from
    * the bytes. Real implementation: image codec over `bytes`. */
  private[operators] def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val n = if (bytes == null) 0 else bytes.length
    val w = 64 + (n % 128)
    val h = 64 + ((n * 7) % 128)
    val frames = 1 + (n % 4)
    // fake features: 8 bucket-means over the byte stream
    val feat = new Array[Float](8)
    var i = 0
    while (i < n) { feat(i % 8) += (bytes(i) & 0xFF) / 255.0f; i += 1 }
    if (n > 0) { var j = 0; while (j < 8) { feat(j) /= math.max(1, n / 8); j += 1 } }
    (w, h, frames, feat)
  }

  private val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Decode + feature-extract each media row, partition-parallel.
    * Input: media frame from [[asMediaFrame]]. Output columns:
    * (media_id, width, height, n_frames, features float[8]). */
  def decodeAndFeaturize(frame: DataFrame): DataFrame = {
    implicit val enc: Encoder[Row] = Encoders.row(decodedSchema)
    frame.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val (w, h, f, feat) = decodeStub(bytes)
          Row(id, w, h, f, feat.toSeq)
        }
      }(enc)
  }

  /** Frame-sample stub: emit every `stride`-th frame index per media —
    * a generator (`explode` over a computed sequence), showing the
    * one-row→many-frames shape video pipelines need. */
  def frameSample(decoded: DataFrame, stride: Int): DataFrame =
    decoded.select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** STUB resize kernel: deterministic byte subsampling to exactly
    * targetW·targetH output bytes (real implementation: image codec
    * scaling over the decoded pixel buffer). */
  private[operators] def resizeStub(bytes: Array[Byte], outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    val n = if (bytes == null) 0 else bytes.length
    if (n > 0) {
      var i = 0
      while (i < outLen) { out(i) = bytes(((i.toLong * n) / outLen).toInt); i += 1 }
    }
    out
  }

  private val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Resize each media row to targetW×targetH, partition-parallel with
    * no shuffle (`mapPartitions`, same batch shape as
    * [[decodeAndFeaturize]]). Output media is the stub-resized bytes;
    * width/height record the target dimensions. At scale the knob is
    * scan partition size vs decoded-buffer amplification
    * (`files.maxPartitionBytes` per media table — SCALING.md). */
  def resize(frame: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    implicit val enc: Encoder[Row] = Encoders.row(resizedSchema)
    frame.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          Row(id, resizeStub(bytes, targetW * targetH), targetW, targetH)
        }
      }(enc)
  }
}
