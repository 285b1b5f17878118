package graft

import graft.multimodal.Binary

/** Contract-level checks: every declared query runs and returns rows at
  * sf0.001, and every oracle key has a queries twin. */
class EntrySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query executes with a non-degenerate schema at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      df.count() // must not throw; empty results allowed (e.g. violation scans)
    }
  }

  test("frameSample emits every k-th fixed-length frame with stable hashes") {
    import spark.implicits._
    val d = Seq((1L, "abcdefghij" * 4)).toDF("doc_id", "text") // 40 chars
    val out = Binary.frameSample(d, "doc_id", "text", 10, 2)
      .orderBy("frame_idx").collect()
    // 4 frames of 10 chars, every 2nd kept -> idx 0 and 2
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 2L))
    // identical frame content -> identical hash
    assert(out(0).getString(2) == out(1).getString(2))
  }

  test("binary decodeFeatures is deterministic with the declared schema") {
    val docs = Tables.documents(spark, sf).limit(20)
    val a = Binary.decodeFeatures(docs, "doc_id", "text", 16).collect().sortBy(_.getLong(0))
    val b = Binary.decodeFeatures(docs, "doc_id", "text", 16).collect().sortBy(_.getLong(0))
    assert(a.sameElements(b))
    assert(a.head.schema.fieldNames.toSeq == Seq("id", "width", "height", "entropy", "features"))
    assert(a.head.getAs[scala.collection.Seq[Double]]("features").length == 16)
    // text payloads are not images: the header parser must say so
    assert(a.forall(r => r.getInt(1) == 0 && r.getInt(2) == 0))
    // features are a normalized distribution; entropy within [0, 8] bits
    a.foreach { r =>
      assert(math.abs(r.getAs[scala.collection.Seq[Double]]("features").sum - 1.0) < 1e-9)
      val e = r.getDouble(3)
      assert(e >= 0.0 && e <= 8.0)
    }
  }

  test("decode kernel parses real PNG / GIF / BMP headers and entropy") {
    import spark.implicits._
    // PNG: 8-byte signature, IHDR length+tag, then BE u32 width=640 height=480
    val png = (Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I'.toInt, 'H'.toInt, 'D'.toInt, 'R'.toInt,
      0, 0, 0x02, 0x80, 0, 0, 0x01, 0xe0) ++ Array.fill(8)(0)).map(_.toByte)
    // GIF89a: LE u16 width=320 height=200 in the logical screen descriptor
    val gif = (Array('G'.toInt, 'I'.toInt, 'F'.toInt, '8'.toInt, '9'.toInt, 'a'.toInt,
      0x40, 0x01, 0xc8, 0x00) ++ Array.fill(6)(0)).map(_.toByte)
    // BMP: 'BM', DIB header size 40 at offset 14, LE i32 width=100 at
    // offset 18, height=-50 (top-down) at 22
    val bmp = (Array('B'.toInt, 'M'.toInt) ++ Array.fill(12)(0) ++ Array(40, 0, 0, 0) ++
      Array(100, 0, 0, 0, 0xce, 0xff, 0xff, 0xff)).map(_.toByte)
    assert(Binary.parseDims(png) == (640, 480))
    assert(Binary.parseDims(gif) == (320, 200))
    assert(Binary.parseDims(bmp) == (100, 50))
    assert(Binary.parseDims("plain text".getBytes("UTF-8")) == (0, 0))
    // text that merely STARTS like a BMP must not parse garbage dims
    assert(Binary.parseDims("BMW dealership quarterly report 2024 Q3".getBytes("UTF-8")) == (0, 0))
    // entropy of a uniform 4-symbol payload is exactly 2 bits/byte
    val d = Seq((1L, "abcd" * 64)).toDF("doc_id", "text")
    val r = Binary.decodeFeatures(d, "doc_id", "text", 16).collect().head
    assert(math.abs(r.getDouble(3) - 2.0) < 1e-9)
    // end-to-end through a TRUE binary payload column the header survives
    // (a string column re-encodes UTF-8, so images only ride as binary)
    val bin = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(7L, png)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType))))
    val rb = Binary.decodeFeatures(bin, "doc_id", "payload", 16).collect().head
    assert((rb.getInt(1), rb.getInt(2)) == (640, 480))
  }
}
