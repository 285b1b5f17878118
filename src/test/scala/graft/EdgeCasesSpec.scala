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
}
