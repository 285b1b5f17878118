package graft

import graft.text.{Dedup, TextOps}

/** Real corpora contain null, empty, and shorter-than-n documents; no
  * operator may crash on them, and signature operators should simply
  * exclude docs that cannot form a signature. */
class NullToleranceSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, Some("the quick brown fox jumps over the lazy dog"), "en", "s1"),
    (2L, None: Option[String], "en", "s1"),
    (3L, Some(""), "en", "s1"),
    (4L, Some("hi"), "en", "s1")
  ).toDF("doc_id", "text", "lang", "source")

  test("scalar text operators emit a row per doc, nulls propagated") {
    assert(TextOps.qualityScore(docs, "doc_id", "text").count() == 4)
    assert(TextOps.tokenCount(docs, "doc_id", "text").count() == 4)
    assert(TextOps.langId(docs, "doc_id", "text").count() == 4)
    assert(TextOps.fingerprint(docs, "doc_id", "text").count() == 4)
  }

  test("exact dedup groups degenerate docs without crashing") {
    assert(Dedup.exactDedupGroups(docs, "doc_id", "text").count() >= 2)
  }

  test("pairwise signature operators exclude unsignable docs, find no pairs") {
    assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      Seq("lang", "source"), 3, 0.6).count() == 0)
    assert(Dedup.simhashPairs(Dedup.simhash(docs, "doc_id", "text"), 3).count() == 0)
    assert(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4).count() == 0)
  }
}
