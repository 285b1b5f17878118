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

  /** Feature extractor over opaque payloads: a REAL minimal decode
    * kernel (no native media libs required) running partition-locally.
    *
    * - `width`/`height` come from parsing actual container headers:
    *   PNG (IHDR, big-endian u32 at offset 16 after the 8-byte
    *   signature), GIF87a/89a (little-endian u16 logical screen
    *   descriptor at offset 6), BMP (little-endian i32 at offset 18 in
    *   BITMAPINFOHEADER). Unrecognized payloads (e.g. plain text)
    *   decode to (0, 0) — the honest "not an image" answer.
    * - `features` is the payload's REAL normalized byte-value histogram
    *   folded into `featDim` buckets; `entropy` is the Shannon entropy
    *   (bits/byte) of the full 256-bucket distribution — standard
    *   content-sniffing features (compressed/encrypted ≈ 8, text ≈ 4-5).
    *
    * The payload column may be a true `binary` column (the 100 TB media
    * catalog shape — bytes reach the kernel verbatim, so image headers
    * parse) or a string column (text corpora — re-encoded UTF-8, where
    * the expected decode answer is (0, 0): multi-byte re-encoding means
    * a real image header cannot round-trip through a string column).
    *
    * A heavier deployment swaps `decodeKernel` for a JNI/ffmpeg decoder;
    * the distributed shape (schema, batching, partition locality) is
    * unchanged. */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String,
                     featDim: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("entropy", DoubleType),
      StructField("features", ArrayType(DoubleType))))
    val isBinary = df.schema(payloadCol).dataType == BinaryType
    val base = df.select(col(idCol).cast("long"), col(payloadCol))
    val rdd = base.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes =
          if (isBinary) Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])
          else Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
        val (w, h, entropy, feats) = decodeKernel(bytes, featDim)
        Row(id, w, h, entropy, feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  private def beU32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def leU16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def leI32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Header-parse dimensions for the three self-describing formats.
    * Package-visible so the spec can assert binary-exact parses. */
  private[graft] def parseDims(b: Array[Byte]): (Int, Int) =
    if (b.length >= 24 && b.startsWith(PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      (beU32(b, 16).toInt, beU32(b, 20).toInt)
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      (leU16(b, 6), leU16(b, 8))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M' &&
        // the DIB header size field must hold a known header size —
        // without this check any text starting with "BM" (e.g. "BMW
        // dealership…") would "parse" garbage nonzero dimensions
        Set(40, 52, 56, 64, 108, 124).contains(leI32(b, 14)))
      // BITMAPINFOHEADER: height may be negative (top-down rows)
      (leI32(b, 18), math.abs(leI32(b, 22)))
    else (0, 0)

  /** The real kernel: header-sniffed dims + byte-distribution features.
    * Package-visible for the fuzz spec. */
  private[graft] def decodeKernel(bytes: Array[Byte], featDim: Int): (Int, Int, Double, Array[Double]) = {
    val (w, h) = parseDims(bytes)
    val counts = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { counts(bytes(i) & 0xff) += 1; i += 1 }
    val n = math.max(bytes.length, 1).toDouble
    var entropy = 0.0
    val folded = new Array[Double](featDim)
    var v = 0
    while (v < 256) {
      val c = counts(v)
      if (c > 0) {
        val p = c / n
        entropy -= p * math.log(p) / math.log(2.0)
        folded(v % featDim) += p
      }
      v += 1
    }
    (w, h, math.rint(entropy * 1e6) / 1e6, folded)
  }
}
