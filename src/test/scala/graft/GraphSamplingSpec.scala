package graft

import org.apache.spark.sql.functions._
import graft.graph.Components
import graft.sample.Sampling

class GraphSamplingSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find oracle: map node -> min id of its class. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val roots = parent.keys.map(n => n -> find(n)).toMap
    val minOf = roots.groupMapReduce(_._2)(_._1)(math.min)
    roots.map { case (n, r) => n -> minOf(r) }
  }

  test("connectedComponents matches a driver-side union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(80)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2)
    val got = Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(edges))
  }

  test("connectedComponents propagates across a long chain") {
    // path 10-11-...-29: one component labeled by the minimum id; needs
    // many propagation rounds, exercising the fixpoint loop
    val edges = (10L until 29L).map(i => (i + 1, i))
    val got = Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == (10L to 29L).toSet)
    assert(got.values.forall(_ == 10L))
  }

  test("pointer jumping closes a 64-hop chain within logarithmic rounds") {
    // path 0-1-...-64: diameter 64; plain min-propagation needs ~64
    // rounds, the shortcutting loop must finish within maxIter = 10
    val edges = (0L until 64L).map(i => (i + 1, i))
    val got = Components.connectedComponents(edges.toDF("a", "b"), "a", "b", maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == (0L to 64L).toSet)
    assert(got.values.forall(_ == 0L))
  }

  test("connectedComponents fails loudly when maxIter is hit before the fixpoint") {
    val edges = (0L until 64L).map(i => (i + 1, i))
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(edges.toDF("a", "b"), "a", "b", maxIter = 2)
        .collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("componentSizeHistogram counts clusters by size, singletons absent") {
    import spark.implicits._
    // two clusters: {1,2,3} and {4,5}; doc 9 appears in no pair
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val hist = graft.graph.Components.componentSizeHistogram(
        graft.graph.Components.connectedComponents(pairs, "doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist == Map(3L -> 1L, 2L -> 1L), hist.toString)
  }

  test("keepCanonical keeps one doc per cluster plus all singletons") {
    val docs = (0L until 10L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 3L), (3L, 5L), (7L, 8L)).toDF("doc_a", "doc_b")
    val kept = Components.keepCanonical(docs, pairs, "doc_id", "doc_a", "doc_b")
      .select("doc_id").as[Long].collect().toSet
    // clusters {1,3,5} -> keep 1, {7,8} -> keep 7; singletons survive
    assert(kept == Set(0L, 1L, 2L, 4L, 6L, 7L, 9L))
  }

  test("connectedComponents and keepCanonical handle an empty pair set") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Components.connectedComponents(empty, "doc_a", "doc_b").count() == 0)
    val docs = (0L until 5L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    assert(Components.keepCanonical(docs, empty, "doc_id", "doc_a", "doc_b").count() == 5)
  }

  test("stratifiedSample is deterministic and follows per-stratum rates") {
    val rows = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
    val df = rows.toDF("doc_id", "lang")
    val out = Sampling.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 0.5), 0.1).select("doc_id").as[Long].collect().toSet
    // engine-independent expectation: replay the hash on the driver
    val expect = rows.filter { case (id, lang) =>
      val bucket = ((id * 2654435761L) % 10000L + 10000L) % 10000L
      bucket < (if (lang == "en") 0.5 else 0.1) * 10000L
    }.map(_._1).toSet
    assert(out == expect)
    // rerunning selects the identical set
    val again = Sampling.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 0.5), 0.1).select("doc_id").as[Long].collect().toSet
    assert(again == out)
  }

  test("hashBucket survives ids past the old int64 multiply-overflow boundary") {
    // round 12: the congruent form must (a) keep every bucket value of
    // the original `id * 2654435761 % 10000` where that was defined —
    // the driver replay above pins small ids — and (b) stay exact for
    // ids above ~3.47e9, where the plain multiply overflows int64
    // (ANSI ArithmeticException; engine-divergent wraparound otherwise)
    val bigIds = Seq(3470000000L, 4000000000L, Long.MaxValue / 2, Long.MaxValue)
    val got = bigIds.toDF("doc_id")
      .select(Sampling.hashBucket(col("doc_id")).as("b")).as[Long].collect()
    val expect = bigIds.map(id => ((id % 10000L) * 5761L) % 10000L)
    assert(got.toSeq == expect)
    // and congruence on a small-id sweep vs the original formula
    val small = (0L until 10000L).toDF("doc_id")
      .select(Sampling.hashBucket(col("doc_id")).as("b")).as[Long].collect()
    val smallExpect = (0L until 10000L).map(id => (id * 2654435761L) % 10000L)
    assert(small.toSeq == smallExpect)
  }

  test("temperatureMixSample up-weights small sources under an overall budget") {
    // 1600 vs 100 docs; T=2 weights ∝ sqrt(n) → the small source's RATE
    // must be 4× the big one's (1600/100 = 16, sqrt ratio 4)
    val rows = (0L until 1700L).map(i => (i, if (i < 1600) "big" else "small"))
    val df = rows.toDF("doc_id", "source")
    val out = Sampling.temperatureMixSample(df, "doc_id", "source", 1L, 4L)
      .select("doc_id").as[Long].collect().toSet
    // engine-independent expectation: replay the integer threshold math
    val n = Map("big" -> 1600L, "small" -> 100L)
    val w = n.view.mapValues(v => math.floor(math.sqrt(v.toDouble) * 1000).toLong).toMap
    val (nn, ww) = (n.values.sum, w.values.sum)
    val t = n.map { case (s, ns) =>
      s -> (BigInt(10000) * 1 * nn * w(s) / (BigInt(4) * ww * ns)).min(10000).toLong
    }
    assert(t("small") == t("big") * 4) // exact sqrt ratio on square counts
    val expect = rows.filter { case (id, s) =>
      ((id * 2654435761L) % 10000L + 10000L) % 10000L < t(s)
    }.map(_._1).toSet
    assert(out == expect)
    // the realized take sits near the quarter-corpus budget (425 docs)
    assert(math.abs(out.size - 425) < 80)
  }

  test("quantileTopFilter matches a driver-side replay of the histogram math (e46)") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 300L).map(i =>
      (i, s"g${i % 3}", Some(math.round(rnd.nextDouble() * 1e4) / 1e4)))
    val df = rows.toDF("id", "g", "v")
    val out = Sampling.quantileTopFilter(df, "v", "g", 1L, 4L)
      .select("id").as[Long].collect().toSet
    // replay: per group, threshold = smallest micro-value whose
    // top-down cumulative count reaches ceil(n/4); keep v >= threshold
    val expect = rows.groupBy(_._2).flatMap { case (_, grp) =>
      val us = grp.map(r => math.floor(r._3.get * 1e6).toLong)
      val target = (us.size + 3) / 4
      val thr = us.sorted(Ordering[Long].reverse).take(target).last
      grp.filter(r => math.floor(r._3.get * 1e6).toLong >= thr).map(_._1)
    }.toSet
    assert(out == expect)
    // a quarter-ish of each group survives (continuous values, few ties)
    assert(out.size >= 75 && out.size <= 90, s"kept ${out.size}")
  }

  test("quantileTopFilter keeps ALL boundary ties and drops null values/groups (e46)") {
    val df = Seq(
      (1L, Some("a"), Some(3.0)), (2L, Some("a"), Some(2.0)),
      (3L, Some("a"), Some(2.0)), (4L, Some("a"), Some(1.0)),
      (5L, Some("a"), None: Option[Double]), // null value: not kept, not counted
      (6L, None: Option[String], Some(9.0))  // null group: no quantile defined
    ).toDF("id", "g", "v")
    // n=4 non-null, keep 1/2 → target 2 → threshold 2.0 → ties 2,3 both kept
    val out = Sampling.quantileTopFilter(df, "v", "g", 1L, 2L)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 3L))
    // keepFrac = 1 keeps every non-null row of a non-null group
    val all = Sampling.quantileTopFilter(df, "v", "g", 1L, 1L)
      .select("id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 3L, 4L))
  }

  test("groupCapSample keeps exactly min(cap, n) per group, by the affine-hash order (e47)") {
    val rows = (0L until 400L).map(i => (i, s"g${i % 4}")) ++ // 100 each
      (400L until 410L).map(i => (i, "tiny"))                 // below the cap
    val df = rows.toDF("id", "g")
    val out = Sampling.groupCapSample(df, "id", "g", 30L)
      .select("g", "id").as[(String, Long)].collect()
    val byG = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byG.keys.toSet == Set("g0", "g1", "g2", "g3", "tiny"))
    (0 until 4).foreach(g => assert(byG(s"g$g").size == 30))
    assert(byG("tiny") == (400L until 410L).toSet) // n <= cap: all kept
    // driver replay of the exact order: smallest 30 by (affine hash, id)
    val p = graft.text.Dedup.AffineP
    val (a, b) = (graft.text.Dedup.hashConst("e47-a", 0),
      graft.text.Dedup.hashConst("e47-b", 0))
    def r(id: Long) = (a * (id % p) + b) % p
    rows.filter(_._2 != "tiny").groupBy(_._2).foreach { case (g, grp) =>
      val expect = grp.map(_._1).sortBy(id => (r(id), id)).take(30).toSet
      assert(byG(g) == expect, s"group $g diverged from the hash order")
    }
    // exact-count determinism survives a coarse bucket grid (every
    // group collapses into few buckets -> boundary path does the work)
    val coarse = Sampling.groupCapSample(df, "id", "g", 30L, nBuckets = 4)
      .select("g", "id").as[(String, Long)].collect()
    assert(coarse.sortBy(x => (x._1, x._2)).sameElements(
      out.sortBy(x => (x._1, x._2))), "bucket width changed the selection")
  }

  test("shuffleShard assigns contiguous per-shard positions matching the hash order (e48)") {
    val df = (0L until 500L).map(i => (i, s"p$i")).toDF("id", "payload")
    val out = Sampling.shuffleShard(df, "id", 4)
      .select("shard", "position", "id").as[(Long, Long, Long)].collect()
    assert(out.length == 500)
    val p = graft.text.Dedup.AffineP
    val (a, b) = (graft.text.Dedup.hashConst("e48-a", 0),
      graft.text.Dedup.hashConst("e48-b", 0))
    def r(id: Long) = (a * (id % p) + b) % p
    val byShard = out.groupBy(_._1)
    assert(byShard.keys.toSet.subsetOf((0L until 4L).toSet))
    byShard.foreach { case (s, rows) =>
      // positions are contiguous 0..n-1 and follow the (hash, id) order
      assert(rows.map(_._2).sorted.toSeq == (0L until rows.length))
      val gotOrder = rows.sortBy(_._2).map(_._3).toSeq
      val wantOrder = rows.map(_._3).sortBy(id => (r(id), id)).toSeq
      assert(gotOrder == wantOrder, s"shard $s order diverged from the hash order")
      rows.foreach { case (_, _, id) => assert(r(id) % 4 == s) }
    }
    // a deliberately coarse bucket grid yields the identical layout
    val coarse = Sampling.shuffleShard(df, "id", 4, nBuckets = 3)
      .select("shard", "position", "id").as[(Long, Long, Long)].collect()
    assert(coarse.sortBy(_._3).sameElements(out.sortBy(_._3)),
      "bucket width changed shard/position assignment")
    // null ids are dropped
    val withNull = Seq((Some(1L), "a"), (None: Option[Long], "b")).toDF("id", "payload")
    assert(Sampling.shuffleShard(withNull, "id", 2).count() == 1)
  }

  test("groupCapSample drops null ids and null groups (e47)") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), Some("a")),
      (None: Option[Long], Some("a")), (Some(4L), None: Option[String])
    ).toDF("id", "g")
    val out = Sampling.groupCapSample(df, "id", "g", 10L)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
  }
}
