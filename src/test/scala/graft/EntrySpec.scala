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
    assert(a.head.schema.fieldNames.toSeq == Seq("id", "width", "height", "features"))
    assert(a.head.getAs[scala.collection.Seq[Double]]("features").length == 16)
  }
}
