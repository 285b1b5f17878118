package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.timeseries.{AsOf, Forecast, TimeSeries}

/** Degenerate-input behavior of the round-2 operators: short series,
  * empty reference sides, strides larger than the data. Nothing may
  * crash; partial data produces the mathematically-defined subset. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def hourly(n: Int, key: String = "A") = (0 until n).map { i =>
    (i.toLong, Timestamp.valueOf(f"2024-01-${1 + i / 24}%02d ${i % 24}%02d:00:00"),
      key, 100.0 + i)
  }.toDF("event_id", "ts", "key", "value")

  test("multiHorizonForecast on a short series emits only supported horizons") {
    // 10 observations, season 24: snaive(T+h) needs y(T+h-24), so only
    // horizons 15..24 exist (h = 25 - rank of the observation used)
    val out = Forecast.multiHorizonForecast(hourly(10), "key", "ts", "event_id",
      "value", 24, 3600L)
    val horizons = out.select("horizon").as[Int].collect().sorted
    assert(horizons.toSeq == (15 to 24))
  }

  test("asofJoin with an empty reference side yields null payloads") {
    val left = hourly(3)
    val right = Seq.empty[(String, Timestamp, Double)].toDF("key", "rts", "ref")
    val out = AsOf.asofJoin(left, right, "key", "ts", "rts", Seq("ref")).collect()
    assert(out.length == 3)
    assert(out.forall(r => r.isNullAt(r.fieldIndex("ref"))))
  }

  test("modelSelection returns one row per key even on tiny series") {
    // 30 rows: only 6 lag-complete rows after the season-24 lag
    val out = Forecast.modelSelection(hourly(30), "key", "ts", "event_id", "value",
      24, Seq(0.1, 1.0), 0.7, 0.15).collect()
    assert(out.length == 1)
  }

  test("windowSamples with an oversized window is empty, not an error") {
    val out = TimeSeries.windowSamples(hourly(10), "key", "ts", "event_id", "value",
      24, 6, 4)
    assert(out.count() == 0)
  }

  test("emaSmooth single-row series returns the value itself") {
    val out = TimeSeries.emaSmooth(hourly(1), "key", "ts", "event_id", "value", 0.2, 24)
      .select("ema").as[Double].collect()
    assert(out.toSeq == Seq(100.0))
  }

  test("round-4 operators tolerate empty inputs end to end") {
    import graft.ingest.Ingest
    import graft.text.TextOps
    import graft.vector.Similarity
    import graft.streaming.Streams
    import graft.timeseries.Decompose
    val noEvents = hourly(0)
    val noDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

    // empty base, empty changes, and both
    assert(Ingest.cdcMerge(hourly(0),
      hourly(0).withColumn("op", lit("U")), "event_id", "op", "ts", "event_id").count() == 0)
    assert(Ingest.cdcMerge(hourly(3),
      hourly(0).withColumn("op", lit("U")), "event_id", "op", "ts", "event_id").count() == 3)
    assert(Ingest.mergeAggState(
      Ingest.aggState(noEvents, "key", "value"), noEvents, "key", "value").count() == 0)
    assert(Ingest.mergeAggState(
      Ingest.aggState(hourly(5), "key", "value"), noEvents, "key", "value").count() == 1)

    assert(Decompose.seasonalDecompose(noEvents, "key", "ts", "event_id", "value", 2).count() == 0)
    assert(Streams.hoppingWindow(noEvents, "ts", "value", "2 hours", "1 hour").count() == 0)

    assert(TextOps.repetitionStats(noDocs, "doc_id", "text").count() == 0)
    assert(TextOps.chunkText(noDocs, "doc_id", "text", 8, 2).count() == 0)
    assert(TextOps.materializePacked(noDocs, "doc_id", "text", "source", 64).count() == 0)

    assert(Similarity.quantizeInt8Flat(noVecs, "vec_id", "embedding").count() == 0)
    assert(Similarity.quantizedTopK(noVecs, noVecs, "vec_id", "embedding", 3).count() == 0)
  }

  test("round-8 operators tolerate empty inputs end to end") {
    import graft.ingest.Ingest
    import graft.validate.Quality
    import graft.vector.Similarity
    val snap = Seq((1L, "a", 1.0)).toDF("id", "name", "bal")
    val noSnap = snap.limit(0)
    // empty prev: everything is an insert; empty cur: everything a
    // delete; both empty: nothing
    assert(Ingest.snapshotDiff(noSnap, snap, "id", Seq("name", "bal"))
      .select("op").as[String].collect().toSeq == Seq("I"))
    assert(Ingest.snapshotDiff(snap, noSnap, "id", Seq("name", "bal"))
      .select("op").as[String].collect().toSeq == Seq("D"))
    assert(Ingest.snapshotDiff(noSnap, noSnap, "id", Seq("name", "bal")).count() == 0)
    // empty table under the suite: zero rows, zero violations, all pass
    val rep = Quality.expectationReport(noSnap, Seq(
      Quality.ExpectNotNull("r1", "bal"), Quality.ExpectUnique("r2", "id")))
      .collect()
    assert(rep.length == 2)
    assert(rep.forall(r => r.getAs[Long]("n_rows") == 0L &&
      r.getAs[Long]("n_violations") == 0L && r.getAs[Boolean]("pass")))
    // empty corpus under the cube: Spark's cube emits NO rows — unlike
    // SQL-standard GROUP BY CUBE (DuckDB emits the grand-total zero
    // row). Pinned as a documented divergence (d11 scaladoc): the
    // operator's contract is Spark semantics; oracle parity is only
    // claimed on non-empty tables.
    val cube = Seq((1.0, 2.0, 0.1, "A", "F"))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus")
      .limit(0)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
    assert(cube.count() == 0)
    // upsert: an empty batch into an existing table is a no-op, and an
    // empty first batch must not leave a corrupt half-created table
    val dir = s"/tmp/graft_edge_upsert_${System.nanoTime()}"
    val batch = Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, 1.0))
      .toDF("id", "ts", "key", "value")
    graft.streaming.Upsert.upsertIntoTable(spark, batch.limit(0), dir, "key", "ts", "id", 4)
    graft.streaming.Upsert.upsertIntoTable(spark, batch, dir, "key", "ts", "id", 4)
    graft.streaming.Upsert.upsertIntoTable(spark, batch.limit(0), dir, "key", "ts", "id", 4)
    assert(graft.streaming.Upsert.readTable(spark, dir).count() == 1)
    // recall with an empty query side: no rows, no crash
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.annRecall(vecs, vecs.limit(0), "vec_id", "embedding", 8, 2, 2)
      .count() == 0)
  }

  test("round-11 operators tolerate empty inputs end to end") {
    import java.sql.Timestamp
    val noLi = Seq.empty[(Long, Double, Double, java.sql.Date)]
      .toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val supp = Seq((1L, "S1")).toDF("s_suppkey", "s_name")
    // d21: max over nothing -> no winner rows, no crash
    assert(graft.analytics.Analytics.topSupplier(noLi, supp,
      "1996-01-01", "1996-04-01").count() == 0)
    // d22: empty fact side -> one aggregate row of null/zero is fine
    // only if it matches the oracle; here the inner joins empty it out
    val noLi2 = Seq.empty[(Long, Double, Double)]
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "Brand#13")).toDF("p_partkey", "p_brand")
    val d22 = graft.analytics.Analytics.smallQuantityRevenue(noLi2, part, "Brand#13")
      .collect()(0)
    assert(d22.getAs[Long]("n_lines") == 0L)
    // d23: no orders -> every customer counts zero
    val cust = Seq(1L, 2L).toDF("c_custkey")
    val noOrd = Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey")
    val d23 = graft.analytics.Analytics.orderCountHistogram(cust, noOrd)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d23 == Map(0L -> 2L))
    // e63/e65: empty corpus -> empty counts, empty merge table applies
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.text.TextOps.bpeTokenCounts(noDocs, "doc_id", "text", 3, 1L)
      .count() == 0)
    assert(graft.text.TextOps.applyBpeMerges(noDocs, "doc_id", "text",
      Seq("a b")).count() == 0)
    // e64: empty counted set packs to nothing
    val noCounted = Seq.empty[(Long, String, Long)].toDF("doc_id", "source", "n")
    assert(graft.text.TextOps.packSequencesByCount(noCounted, "doc_id", "n",
      "source", 8).count() == 0)
    // e66: no pairs -> no clusters (components of an empty graph)
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(graft.graph.Components.componentSizeHistogram(
      graft.graph.Components.connectedComponents(noPairs, "doc_a", "doc_b"))
      .count() == 0)
    // c30/c31/c32: empty series emit nothing, never throw
    val noEv = Seq.empty[(Long, Timestamp, String, Double)]
      .toDF("event_id", "ts", "key", "value")
    assert(graft.timeseries.Forecast.seasonalRidgeForecast(noEv, "key", "ts",
      "event_id", "value", 7, 10, 1.0).count() == 0)
    assert(graft.timeseries.Forecast.holtWintersDampedForecast(noEv, "key", "ts",
      "event_id", "value", 0.5, 0.25, 0.5, 0.9, 24, 48, Seq(1)).count() == 0)
    assert(graft.timeseries.Forecast.blendForecasts(noEv, "key", "ts",
      "event_id", "value", 24, 7, 10, 1.0).count() == 0)
  }
}
