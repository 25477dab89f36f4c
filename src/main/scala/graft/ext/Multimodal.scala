package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in per-partition batches.
  *
  * The Spark side — schema, partitioning, batch iteration, output shape —
  * is real and tested. The codec itself is a STUB (`FakeCodec`): this
  * container has no image/audio libraries, so "decode" parses a
  * deterministic synthetic header instead of running a real JPEG/PCM
  * decoder. Swap `Codec` implementations to go live; nothing else
  * changes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image | audio | video
    StructField("payload", BinaryType, nullable = false),  // opaque encoded bytes
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sample_rate", IntegerType))))))

  /** A pluggable per-record decoder: bytes → fixed-length feature vector.
    * Implementations must be serializable and deterministic. */
  trait Codec extends Serializable {
    def features(kind: String, payload: Array[Byte]): Array[Float]
    def thumbnail(payload: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** STUB codec: deterministic byte-level statistics standing in for a
    * real decode. Replace with an actual image/audio decoder in
    * production — the pipeline shape (mapPartitions batching, schema,
    * partition preservation) is identical. */
  object FakeCodec extends Codec {
    def features(kind: String, payload: Array[Byte]): Array[Float] = {
      // 16-bin byte histogram, normalized — a deterministic fake of an
      // embedding-model forward pass
      val hist = new Array[Float](16)
      payload.foreach(b => hist((b & 0xFF) >> 4) += 1f)
      val n = math.max(1, payload.length).toFloat
      hist.map(_ / n)
    }
    def thumbnail(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      // deterministic downsample of the byte stream to w*h "pixels"
      Array.tabulate(w * h)(i => payload(i * payload.length / (w * h)))
  }

  /** Build a deterministic synthetic media table from the documents table
    * (payload = UTF-8 bytes of the text, metadata derived from lengths) —
    * the test fixture for the binary pipeline. */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.io.Tables(spark, dir, "documents")
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") % 30).cast("int").as("n_frames"),
        lit(16000).as("sample_rate")).as("meta"))
  }

  /** Batched feature extraction over binary payloads: one codec instance
    * per partition, rows streamed through it — the Scala analogue of a
    * pandas-batch UDF. Output keeps (media_id, kind) and appends the
    * feature vector. */
  def extractFeatures(media: DataFrame, codec: Codec): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media
      .select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), r.getString(1),
            codec.features(r.getString(1), r.getAs[Array[Byte]]("payload")).toSeq)
        }
      }(enc)
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size
    * window of the byte stream becomes one frame row — the explode shape
    * of per-frame processing (row count multiplies, partitioning is
    * preserved, no shuffle). */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .where(col("kind") === "video" && length(col("payload")) >= frameBytes)
      .select(
        col("media_id"),
        posexplode(
          filter(
            transform(
              // clamp: payloads barely longer than one frame must not
              // produce a negative bound (negative substring positions
              // read from the END of the payload)
              sequence(lit(0),
                greatest(
                  floor((length(col("payload")) - frameBytes) / (frameBytes * stride)).cast("int"),
                  lit(0))),
              i => substring(col("payload"), i * frameBytes * stride + 1, lit(frameBytes))),
            f => length(f) === frameBytes)))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame")

  /** Thumbnail generation via the codec (stub resize). */
  def thumbnails(media: DataFrame, codec: Codec, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("thumb", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media
      .where(col("kind") === "image")
      .select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map(r => Row(r.getLong(0), codec.thumbnail(r.getAs[Array[Byte]]("payload"), w, h)))
      }(enc)
  }

  /** Byte-level near-dup over opaque binary payloads — the
    * perceptual-hash-shaped screen for re-encoded/header-tweaked/
    * trimmed media copies that exact content-hash dedup
    * (`multimodal_dedup`) structurally misses: one flipped byte
    * changes the md5 entirely but flips only a few SimHash bits.
    * Features are the payload's overlapping `n`-byte grams, md5-hashed
    * to 60 bits; signature + pigeonhole chunk index + exact hamming
    * verify are the shared `simHashPairsFromHashes` machinery (chunk
    * index over DISTINCT signatures — identical payloads collapse
    * before the join exactly like duplicate-saturated text corpora).
    * A live deployment would decode and hash PIXELS (the `Codec` stub
    * boundary); byte-gram SimHash is the codec-free analog with the
    * same plumbing — binary columns in, (id_a, id_b, hamming) out —
    * and is itself the right tool for exact-codec corpora (same
    * encoder, same dimensions: crawl re-downloads, chunked uploads).
    * Returns pairs with hamming ≤ `maxHamming`. */
  def payloadNearDupPairs(
      media: DataFrame,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      n: Int = 4,
      maxHamming: Int = 3): DataFrame = {
    // sequence(1, len−n+1) would COUNT DOWN for payloads shorter than
    // n (Spark's sequence steps −1 when start > stop) — guard to an
    // empty gram set, which simHashPairsFromHashes then drops
    val grams = when(length(col(payloadCol)) >= n,
      transform(
        sequence(lit(1), length(col(payloadCol)).cast("int") - (n - 1)),
        i => conv(substring(md5(col(payloadCol).substr(i, lit(n))), 1, 15), 16, 10)
          .cast("long")))
      .otherwise(array().cast("array<long>"))
    graft.ext.Dedup.simHashPairsFromHashes(
      graft.util.Par.widen(media).select(col(idCol), grams.as("__bh")),
      idCol, "__bh", maxHamming)
  }
}
