package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * Images/audio/video ride through the engine as `binary` columns with a
  * typed metadata struct; decode / feature-extraction runs as a
  * partition-local typed pipeline (`mapPartitions`) so a real decoder
  * (JNI/ffmpeg/JPEG lib) drops in per-executor with batch locality.
  * The decode step here is a clearly-marked deterministic STUB (the
  * container has no media libs); the Spark-side plumbing — schema,
  * partitioning, batch shape — is real and tested.
  */
object Binary {

  /** Promote a string column to an opaque binary payload + metadata:
    * byte length, sha256 checksum, magic-byte sniff. All codegen'd
    * built-ins; this is the catalog shape a 100 TB media table uses
    * (payload column stays unread unless projected — parquet column
    * pruning does the heavy lifting). */
  def binaryMeta(df: DataFrame, idCol: String, payloadStrCol: String): DataFrame = {
    val payload = encode(col(payloadStrCol), "UTF-8")
    df.select(
      col(idCol),
      octet_length(payload).cast("long").as("byte_len"),
      sha2(payload, 256).as("sha256"),
      // magic from the first 4 CHARS then encoded — with a true BinaryType
      // payload this becomes substring on bytes; for the string-promoted
      // test payload, char-first keeps multibyte prefixes well-defined
      // (slicing UTF-8 bytes mid-codepoint would yield invalid sequences).
      lower(hex(encode(substring(col(payloadStrCol), 1, 4), "UTF-8"))).as("magic_hex"))
  }

  /** Frame sampling over an opaque payload: fixed-length frames, every
    * k-th kept, each fingerprinted — the video-frame-extraction shape
    * (explode positions + slice + hash, all codegen'd; with a real
    * BinaryType payload the same substring works byte-wise). Frames are
    * generated from positions so the payload is scanned once per frame,
    * never per byte. */
  def frameSample(df: DataFrame, idCol: String, payloadStrCol: String,
                  frameLen: Int, everyK: Int): DataFrame = {
    val nf = floor(length(col(payloadStrCol)) / frameLen).cast("int")
    df.select(col(idCol), col(payloadStrCol).as("__p"), nf.as("__nf"))
      .filter(col("__nf") > 0)
      .select(col(idCol), col("__p"),
        explode(sequence(lit(0), col("__nf") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % everyK === 0)
      .select(col(idCol), col("frame_idx").cast("long").as("frame_idx"),
        sha2(encode(col("__p").substr(col("frame_idx") * frameLen + 1, lit(frameLen)),
          "UTF-8"), 256).as("frame_sha"))
  }

  /** STUB feature extractor: stands in for image decode + resize +
    * embed. Deterministic fake features derived from payload bytes so
    * the distributed plumbing (schema, batching, partition locality) is
    * fully exercised. A real deployment swaps `fakeDecode` for a JNI
    * decoder; nothing else changes. */
  def decodeFeatures(df: DataFrame, idCol: String, payloadStrCol: String,
                     featDim: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("features", ArrayType(DoubleType))))
    val base = df.select(col(idCol).cast("long"), col(payloadStrCol))
    val rdd = base.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
        val (w, h, feats) = fakeDecode(bytes, featDim)
        Row(id, w, h, feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** ??? real decoder goes here — deterministic byte-histogram fake. */
  private def fakeDecode(bytes: Array[Byte], featDim: Int): (Int, Int, Array[Double]) = {
    val w = 64 + (if (bytes.isEmpty) 0 else math.abs(bytes(0).toInt) % 64)
    val h = 64 + (if (bytes.length < 2) 0 else math.abs(bytes(1).toInt) % 64)
    val hist = new Array[Double](featDim)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) % featDim) += 1.0; i += 1 }
    val n = math.max(bytes.length, 1).toDouble
    (w, h, hist.map(_ / n))
  }
}
